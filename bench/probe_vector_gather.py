"""Probe: price the lane-parallel walk's core op on the real chip.

The round-5 formulation-ceiling attack (VERDICT r4 next item 5) replaces
W~5 interleaved SCALAR chains with 1024+ sub-walks living in vector
lanes: each step advances every walk by one token via a vectorized
dynamic gather mp[walk_row, p_walk]. The whole design rests on the cost
of that gather; this probe measures the candidates:

  A. XLA while_loop + take_along_axis (8*G, L) x (8*G, 1)  per step
  B. XLA while_loop + flat gather (one_hot-free take)      per step
  C. Pallas kernel: per-step jnp.take_along_axis on a VMEM operand
  D. Pallas kernel: 8-way scalar SMEM loads as today (baseline band)

Reported: ns per gathered element and effective walk-tokens/s for a
16 MiB-equivalent load (3300 steps, 1024 walks).
"""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

STEPS = 256          # enough to amortize; scale results per-step
NWALK = 1024         # 8 sublanes x 128 lanes
L = 32768            # per-walk row length (restart window in elements)


def _bench(fn, *args):
    r = jax.block_until_ready(fn(*args))
    ts = []
    for _ in range(3):
        t0 = time.time()
        r = jax.block_until_ready(fn(*args))
        ts.append(time.time() - t0)
    del r
    return sorted(ts)[1]


def xla_take_along(adv):
    """adv: [NWALK, L] int32. While-loop walk: p += adv[w, p]."""

    @jax.jit
    def run(adv):
        def body(i, p):
            a = jnp.take_along_axis(adv, p[:, None] & (L - 1), axis=1)
            return p + a[:, 0]

        p0 = jnp.zeros((NWALK,), jnp.int32)
        return jax.lax.fori_loop(0, STEPS, body, p0)

    return run


def xla_flat_gather(adv_flat, rows):
    """Flat 1-D gather: idx = row_base + (p & mask)."""

    @jax.jit
    def run(adv_flat, rows):
        base = rows * L

        def body(i, p):
            return p + adv_flat[base + (p & (L - 1))]

        p0 = jnp.zeros((NWALK,), jnp.int32)
        return jax.lax.fori_loop(0, STEPS, body, p0)

    return run


def pallas_take_along(adv):
    """Pallas: adv rows in VMEM, per-step take_along_axis (8,128) idx."""
    from jax.experimental import pallas as pl

    G = NWALK // 128  # sublane groups

    def kernel(adv_ref, out_ref):
        def body(i, p):
            idx = p & (L - 1)
            a = jnp.take_along_axis(adv_ref[...], idx, axis=1)
            return p + a

        p0 = jnp.zeros((G, 128), jnp.int32)
        out_ref[...] = jax.lax.fori_loop(0, STEPS, body, p0)

    f = pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=None)],
        out_specs=pl.BlockSpec(memory_space=None),
        out_shape=jax.ShapeDtypeStruct((G, 128), jnp.int32),
    )
    return jax.jit(functools.partial(f))


def trip_simulacrum(adv_flat, rows):
    """Full v3z-trip cost: 4 flat gathers + 1 scatter + ~50 vector ALU
    ops per trip in a fori_loop — the number that decides the
    lane-parallel walk's ceiling."""

    @jax.jit
    def run(adv_flat, rows):
        base = rows * L
        NB = NWALK // 4

        def body(i, c):
            p, out = c
            a = adv_flat[base + (p & (L - 1))]
            b = adv_flat[base + ((p + 1) & (L - 1))]
            a2 = adv_flat[base + ((p + 4) & (L - 1))]
            b2 = adv_flat[base + ((p + 5) & (L - 1))]
            x = a ^ b
            y = a2 ^ b2
            for _ in range(12):  # ~50 elementwise ops
                x = (x + y) ^ (x >> 3)
                y = jnp.where(x > y, y + 1, y)
                x = jnp.minimum(x & 1023, p)
                y = y | (x << 2)
            mark = x + y
            col = jnp.where(mark >= 0, p & (L - 1), jnp.int32(L))
            out = out.at[rows % NB, col].set(mark, mode="drop")
            return (p + jnp.clip(a & 7, 1, 8), out)

        p0 = jnp.zeros((NWALK,), jnp.int32)
        out0 = jnp.zeros((NB, L + 1), jnp.int32)
        return jax.lax.fori_loop(0, STEPS, body, (p0, out0))

    return run


def main():
    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    adv = jnp.asarray(rng.integers(1, 9, size=(NWALK, L), dtype=np.int32))
    rows = jnp.arange(NWALK, dtype=jnp.int32)

    t = _bench(xla_take_along(adv), adv)
    per = t / STEPS / NWALK * 1e9
    print(f"A xla_take_along: {t*1e3:.2f} ms/{STEPS} steps -> "
          f"{per:.2f} ns/elem, {NWALK/ (t/STEPS) / 1e6:.1f} M tokens/s",
          flush=True)

    t = _bench(xla_flat_gather(adv.reshape(-1), rows), adv.reshape(-1), rows)
    per = t / STEPS / NWALK * 1e9
    print(f"B xla_flat_gather: {t*1e3:.2f} ms/{STEPS} steps -> "
          f"{per:.2f} ns/elem, {NWALK/ (t/STEPS) / 1e6:.1f} M tokens/s",
          flush=True)

    try:
        G = NWALK // 128
        adv_g = adv.reshape(G, 128, L)[:, 0, :]  # (G, L) one row per group
        f = pallas_take_along(adv_g)
        t = _bench(f, adv_g)
        per = t / STEPS / (G * 128) * 1e9
        print(f"C pallas_take_along: {t*1e3:.2f} ms/{STEPS} steps -> "
              f"{per:.2f} ns/elem", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"C pallas_take_along: FAIL {type(e).__name__}: "
              f"{str(e)[:200]}", flush=True)

    t = _bench(trip_simulacrum(adv.reshape(-1), rows),
               adv.reshape(-1), rows)
    per_trip = t / STEPS * 1e6
    # 16 MiB mixed ~ 6000 trips (BASELINE round-5 trip structure)
    est = 16.78e6 / (6000 * t / STEPS) / 1e6
    print(f"D v3z_trip_simulacrum: {t*1e3:.2f} ms/{STEPS} trips -> "
          f"{per_trip:.2f} us/trip; 16 MiB walk est "
          f"{6000 * t / STEPS * 1e3:.0f} ms ({est:.0f} MB/s walk-only)",
          flush=True)


if __name__ == "__main__":
    main()
