"""Probe: do INDEPENDENT dynamic-row VMEM accesses pipeline on this chip?

Kernel A: one dependent chain of N dynamic-row reads (each address derived
from the previous value) — pure latency.
Kernel B: W independent chains interleaved (N/W steps, same total reads) —
if the scalar core pipelines independent accesses, B should run ~W× faster
per access.

This decides whether the W-interleaved parse walk (VERDICT r1 #1b) is
worth building. Methodology: fresh input per timing run, tiny output.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl

ROWS = 512  # [ROWS, 128] int32 table = 256 KiB VMEM


def chain_kernel(tbl_ref, out_ref, *, steps, w):
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)

    def rd(pos):
        row = tbl_ref[pl.ds(pos >> 7, 1), :]
        return jnp.sum(jnp.where(lane == (pos & 127), row, 0))

    def body(i, carry):
        return tuple(rd(p) for p in carry)

    init = tuple(jnp.int32(17 * (j + 1)) for j in range(w))
    fin = jax.lax.fori_loop(0, steps, body, init)
    acc = fin[0]
    for v in fin[1:]:
        acc = acc + v
    out_ref[...] = jnp.full((1, 1), acc, jnp.int32)


def run(w, total_reads, tbl):
    steps = total_reads // w
    import functools

    k = functools.partial(chain_kernel, steps=steps, w=w)
    fn = jax.jit(lambda t: pl.pallas_call(
        k,
        in_specs=[pl.BlockSpec((ROWS, 128), lambda: (0, 0))],
        out_specs=pl.BlockSpec((1, 1), lambda: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.int32),
    )(t))
    r = fn(tbl[0])
    float(jax.device_get(jnp.sum(r)))
    ts = []
    for i in range(1, 3):
        t0 = time.time()
        r = fn(tbl[i])
        float(jax.device_get(jnp.sum(r)))
        ts.append(time.time() - t0)
    med = sorted(ts)[len(ts) // 2]
    per = med / total_reads * 1e9
    print(f"W={w:2d}: {med*1e3:8.2f} ms for {total_reads} reads "
          f"-> {per:6.2f} ns/read")


def main():
    total = 1 << 22  # 4M reads
    rng = np.random.default_rng(0)
    # Values stay in-range row indices so chains are data-dependent.
    tbls = [jnp.asarray(
        rng.integers(0, ROWS * 128, size=(ROWS, 128), dtype=np.int32) )
        for _ in range(3)]
    for w in (1, 2, 4, 8, 16):
        run(w, total, tbls)


if __name__ == "__main__":
    main()
