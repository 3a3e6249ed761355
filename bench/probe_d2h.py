#!/usr/bin/env python
"""Round-4 d2h deep probe: the decode paths are output-heavy, and the
relay's d2h measured ~30 MB/s vs h2d's ~1 GB/s. Find the fixed
per-transfer cost vs the marginal rate, and whether async/parallel/
chunked fetches beat one big device_get.

Run: PYTHONPATH=/root/repo python bench/probe_d2h.py
"""
import concurrent.futures as cf
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np


def tm(label, fn, reps=3):
    ts = []
    for _ in range(reps):
        t0 = time.time()
        fn()
        ts.append(time.time() - t0)
    ts.sort()
    print(f"{label}: {ts[len(ts)//2]*1000:.0f} ms (min {ts[0]*1000:.0f})",
          flush=True)
    return ts[0]


def main():
    rng = np.random.default_rng(0)
    src = jax.device_put(rng.integers(0, 2**31 - 1, size=(8 << 20) // 4,
                                      dtype=np.int32))
    bump = jax.jit(lambda x, s: x + s)

    # size ladder: fixed cost vs marginal rate (fresh value each rep so
    # no host-side caching).
    for kb in (64, 256, 1024, 4096, 8192):
        n = (kb << 10) // 4
        i = [0]

        def get(n=n, i=i):
            i[0] += 1
            y = jax.block_until_ready(bump(src, i[0]))
            t0 = time.time()
            np.asarray(jax.device_get(y[:n]))
            return time.time() - t0

        ts = sorted(get() for _ in range(3))
        print(f"d2h {kb:5d} KB: {ts[1]*1000:6.0f} ms "
              f"-> {kb/1024/ts[1]:7.1f} MB/s", flush=True)

    # async copy: start the copy, then block
    i = [100]

    def async_get():
        i[0] += 1
        y = jax.block_until_ready(bump(src, i[0]))
        t0 = time.time()
        y.copy_to_host_async()
        r = np.asarray(y)
        dt = time.time() - t0
        return dt

    ts = sorted(async_get() for _ in range(3))
    print(f"d2h 8 MB copy_to_host_async+np: {ts[1]*1000:.0f} ms", flush=True)

    # parallel chunk fetch via threads (does the relay pipeline?)
    for nchunk in (2, 4, 8):
        i[0] += 1
        y = jax.block_until_ready(bump(src, i[0]))
        n = y.shape[0]
        parts = [y[k * n // nchunk:(k + 1) * n // nchunk]
                 for k in range(nchunk)]
        jax.block_until_ready(parts)
        t0 = time.time()
        with cf.ThreadPoolExecutor(nchunk) as ex:
            list(ex.map(lambda p: np.asarray(jax.device_get(p)), parts))
        print(f"d2h 8 MB in {nchunk} parallel chunks: "
              f"{(time.time()-t0)*1000:.0f} ms", flush=True)

    # jax.device_get of a LIST of arrays (batched API)
    i[0] += 1
    y = jax.block_until_ready(bump(src, i[0]))
    n = y.shape[0]
    parts = [y[k * n // 8:(k + 1) * n // 8] for k in range(8)]
    jax.block_until_ready(parts)
    t0 = time.time()
    jax.device_get(parts)
    print(f"d2h 8 MB as device_get(list of 8): "
          f"{(time.time()-t0)*1000:.0f} ms", flush=True)

    # dtype width: same bytes, fewer elements
    i[0] += 1
    y = jax.block_until_ready(bump(src, i[0]))
    t0 = time.time()
    np.asarray(jax.device_get(y))  # 8 MB as int32
    print(f"d2h 8 MB int32 one get: {(time.time()-t0)*1000:.0f} ms",
          flush=True)


if __name__ == "__main__":
    main()
