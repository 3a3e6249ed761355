#!/usr/bin/env python
"""Round-4 transfer probe: where do the decode path's 0.9 s d2h and
0.97 s h2d really go?

Measures, on the live chip:
  1. h2d rate vs size (1/4/8/17 MB)
  2. d2h of a PLAIN jnp array (device_put'd) — direct device_get
  3. d2h of a loop-kernel product: direct device_get vs fetch()
     (consume-dispatch workaround) vs fused-consume — quantifies the
     workaround's cost and re-tests whether the round-1 stall still
     exists in this relay build.
  4. dispatch floor: tiny jit call round-trip

Run: PYTHONPATH=/root/repo python bench/probe_xfer2.py
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl


def tm(label, fn, reps=3):
    ts = []
    for _ in range(reps):
        t0 = time.time()
        fn()
        ts.append(time.time() - t0)
    ts.sort()
    print(f"{label}: {ts[len(ts)//2]*1000:.0f} ms (min {ts[0]*1000:.0f})",
          flush=True)
    return ts[len(ts) // 2]


def main():
    rng = np.random.default_rng(0)

    # 1. h2d
    for mb in (1, 4, 8, 17):
        a = rng.integers(0, 255, size=mb << 20, dtype=np.uint8)
        tm(f"h2d {mb} MB", lambda a=a: jax.block_until_ready(
            jax.device_put(a)))

    # 4. dispatch floor
    one = jnp.zeros((8, 128), jnp.int32)
    f = jax.jit(lambda x: x + 1)
    jax.block_until_ready(f(one))
    tm("dispatch floor (tiny jit + sync)", lambda: jax.block_until_ready(
        f(one)))
    tm("dispatch floor + device_get", lambda: np.asarray(
        jax.device_get(f(one))))

    # 2. plain d2h — output of a real computation (device_put'd arrays
    # can short-circuit to the retained host copy).
    for mb in (4, 8):
        src = jax.device_put(rng.integers(0, 255, size=mb << 20,
                                          dtype=np.uint8))
        g = jax.jit(lambda x: x ^ 1)
        d = g(src)
        jax.block_until_ready(d)
        tm(f"d2h computed {mb} MB (device_get)",
           lambda d=d: np.asarray(jax.device_get(d)))
        tm(f"d2h computed {mb} MB fresh each time",
           lambda g=g, src=src: np.asarray(
               jax.device_get(jax.block_until_ready(g(src)))), reps=2)

    # 3. loop-kernel product d2h
    N = 8 << 20

    def kernel(x_ref, o_ref):
        def body(i, _):
            o_ref[pl.ds(i, 1), :] = x_ref[pl.ds(i, 1), :] + 1
            return 0

        jax.lax.fori_loop(0, x_ref.shape[0], body, 0)

    ROWS = N // 128
    GRID = 64
    x = jax.device_put(rng.integers(0, 255, size=(ROWS, 128),
                                    dtype=np.int32))
    loopfn = jax.jit(lambda x: pl.pallas_call(
        kernel,
        grid=(GRID,),
        in_specs=[pl.BlockSpec((ROWS // GRID, 128), lambda i: (i, 0))],
        out_specs=pl.BlockSpec((ROWS // GRID, 128), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((ROWS, 128), jnp.int32),
    )(x))
    y = loopfn(x)
    jax.block_until_ready(y)

    from tpz.kernels.device_quirks import fetch
    tm("d2h loop-product 32 MB via fetch()", lambda: fetch(loopfn(x)),
       reps=2)

    t0 = time.time()
    np.asarray(jax.device_get(y))
    print(f"d2h loop-product 32 MB DIRECT device_get: "
          f"{(time.time()-t0)*1000:.0f} ms (stall re-test)", flush=True)
    t0 = time.time()
    np.asarray(jax.device_get(y))
    print(f"  second direct get: {(time.time()-t0)*1000:.0f} ms",
          flush=True)

    # uint8 vs int32 output width: does d2h price per element or per byte?
    g8 = jax.jit(lambda x: (x & 0xFF).astype(jnp.uint8))
    y8 = g8(y)
    jax.block_until_ready(y8)
    tm("d2h 8 MB uint8 (separate consume+get)",
       lambda: np.asarray(jax.device_get(g8(y))), reps=2)


if __name__ == "__main__":
    main()
