"""Probe: XLA-TPU compile time of a while-loop body with per-trip
scatters, vs lane count NW — isolates the v3z 8 MiB compile explosion
(1 MiB / NW=64 compiles in minutes; 8 MiB / NW=512 did not finish in
50 min on the relay).

Variants per NW:
  base   — gathers + ALU only (no scatter)
  scat2d — out.at[row, col].set(mode=drop)      (v3z HEAD form)
  scat1d — out_flat.at[idx].set(mode=drop)
  scat1u — out_flat.at[idx].set(unique_indices=True)

Usage: python bench/probe_scatter_compile.py [NW ...]
"""
import sys
import time

import jax
import jax.numpy as jnp

NB_N = 1 << 22


def build(nw, variant):
    comb = jnp.arange(NB_N, dtype=jnp.int32)
    rows = nw // 4

    def body(c):
        p, out, outf = c
        a = comb[p]
        b = comb[p + 1]
        v = a ^ b
        col = jnp.where(v & 1 != 0, p % 1024, jnp.int32(1024))
        row = jnp.arange(nw, dtype=jnp.int32) % rows
        if variant == "scat2d":
            out = out.at[row, col].set(v, mode="drop")
        elif variant == "scat1d":
            outf = outf.at[row * 1025 + col].set(v, mode="drop")
        elif variant == "scat1u":
            outf = outf.at[row * 1025 + col].set(
                v, mode="drop", unique_indices=True)
        return (p + (v & 3) + 1, out, outf)

    def cond(c):
        return jnp.any(c[0] < NB_N - 8)

    def fn(p0):
        init = (p0, jnp.zeros((rows, 1025), jnp.int32),
                jnp.zeros((rows * 1025,), jnp.int32))
        r = jax.lax.while_loop(cond, body, init)
        return r[1].sum() + r[2].sum() + r[0].sum()

    return fn


if __name__ == "__main__":
    nws = [int(a) for a in sys.argv[1:]] or [64, 256, 512]
    print("devices:", jax.devices(), flush=True)
    for nw in nws:
        for variant in ("base", "scat1d", "scat1u", "scat2d"):
            p0 = jnp.arange(nw, dtype=jnp.int32) * (NB_N // (nw + 1))
            fn = build(nw, variant)
            t0 = time.time()
            try:
                lowered = jax.jit(fn).lower(p0)
                comp = lowered.compile()
                dt = time.time() - t0
                print(f"NW={nw} {variant}: compile {dt:.1f}s", flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"NW={nw} {variant}: FAIL {str(e)[:120]}", flush=True)
