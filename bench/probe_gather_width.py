"""Probe: price per-trip gathers by index count vs element width.

The fused v3z trip gathers 4*NW int32 elements; TOK reads are adjacent
pairs (mp[2q], mp[2q+1]) and EXT reads are fixed-stride pairs
(words[e], words[e+4]) — both packable as ONE complex64 element. If
TPU gather cost is per ELEMENT (microcoded address generation), a
c64 gather of 2*NW indices runs ~2x the 4*NW i32 form; if per BYTE,
it's a wash.  Variants (NW=512 lanes, T=5000 trips, 32M-word comb):
  i32x4 — 4*NW int32 indices (HEAD form)
  i32x2 — 2*NW int32 indices (lower bound)
  c64x2 — 2*NW complex64 indices (candidate)
Usage: python bench/probe_gather_width.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

NW = 512
T = 5000
NCOMB = 1 << 25


def build(variant):
    comb_i = jnp.arange(NCOMB, dtype=jnp.int32)
    comb_c = jax.lax.complex(
        comb_i.astype(jnp.float32), (comb_i + 4).astype(jnp.float32))

    def body(c):
        t, p, acc = c
        if variant == "i32x4":
            g = comb_i[jnp.concatenate([p, p + 1, p + 4, p + 5])]
            acc = acc + g[:NW] + g[NW:2 * NW] + g[2 * NW:3 * NW] \
                + g[3 * NW:]
        elif variant == "i32x2":
            g = comb_i[jnp.concatenate([p, p + 4])]
            acc = acc + g[:NW] + g[NW:]
        else:
            g = comb_c[jnp.concatenate([p, p + 1])]
            acc = acc + jnp.real(g[:NW]).astype(jnp.int32) \
                + jnp.imag(g[NW:]).astype(jnp.int32)
        return (t + 1, (p + acc % 7 + 1) % (NCOMB - 8), acc)

    def fn(p0):
        r = jax.lax.while_loop(lambda c: c[0] < T, body,
                               (jnp.int32(0), p0,
                                jnp.zeros((NW,), jnp.int32)))
        return r[2].sum()

    return jax.jit(fn)


if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    p0 = (jnp.arange(NW, dtype=jnp.int32) * 65011) % (NCOMB - 8)
    for variant in ("i32x4", "i32x2", "c64x2"):
        fn = build(variant)
        try:
            fn(p0).block_until_ready()
            t0 = time.time()
            fn(p0).block_until_ready()
            dt = time.time() - t0
            print(f"{variant}: {dt*1e6/T:.2f} us/trip ({dt:.3f}s total)",
                  flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{variant}: FAIL {str(e)[:160]}", flush=True)
