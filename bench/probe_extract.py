#!/usr/bin/env python
"""Probe: per-read cost of vector->scalar extraction strategies.

Every walk kernel (parse v3y, inflate, bzip2, lzhuf) pays ~5 dynamic
VMEM reads per token, each a (1,128) row load + lane-select + full
cross-lane sum (~17 vector ops).  If a cheaper extraction exists on this
chip, every walk gets faster.  Strategies, measured inside an 8-way
interleaved dependent chain (the production access pattern):

  A sum-select        jnp.sum(jnp.where(lane == k, row, 0))   [current]
  B dynamic_slice     jax.lax.dynamic_slice(tbl, (r, k), (1, 1))
  C smem-scalar       table lives in SMEM, tbl[pos] is a scalar load
  D sum-select-u8     rows as (8,128) reduce over both dims

Also probes SMEM block capacity (how big an SMEM operand compiles+runs):
the decode walks could move stream slices (72 KiB/block) or two-level
tables into SMEM if it fits.

Run: PYTHONPATH=/root/repo python bench/probe_extract.py
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROWS = 512  # [ROWS, 128] int32 = 256 KiB
W = 8


def make_kernel(mode, steps):
    def kernel(tbl_ref, out_ref):
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)

        def rd(pos):
            if mode == "A":
                row = tbl_ref[pl.ds(pos >> 7, 1), :]
                return jnp.sum(jnp.where(lane == (pos & 127), row, 0))
            if mode == "B":
                v = jax.lax.dynamic_slice(tbl_ref[...], (pos >> 7, pos & 127),
                                          (1, 1))
                return v[0, 0]
            if mode == "C":
                return tbl_ref[pos]
            raise ValueError(mode)

        def body(i, carry):
            return tuple(rd(p) for p in carry)

        init = tuple(jnp.int32(17 * (j + 1)) for j in range(W))
        fin = jax.lax.fori_loop(0, steps, body, init)
        acc = fin[0]
        for v in fin[1:]:
            acc = acc + v
        out_ref[...] = jnp.full((1, 1), acc, jnp.int32)

    return kernel


def run(mode, total_reads, tbls):
    steps = total_reads // W
    k = make_kernel(mode, steps)
    if mode == "C":
        in_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
        mk = lambda t: t.reshape(-1)  # noqa: E731
    else:
        in_spec = pl.BlockSpec((ROWS, 128), lambda: (0, 0))
        mk = lambda t: t  # noqa: E731
    fn = jax.jit(lambda t: pl.pallas_call(
        k,
        in_specs=[in_spec],
        out_specs=pl.BlockSpec((1, 1), lambda: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.int32),
    )(mk(t)))
    try:
        r = fn(tbls[0])
        float(jax.device_get(jnp.sum(r)))
    except Exception as e:  # noqa: BLE001
        print(f"{mode}: FAILED {type(e).__name__}: {str(e)[:200]}")
        return
    ts = []
    for i in range(1, 3):
        t0 = time.time()
        r = fn(tbls[i])
        float(jax.device_get(jnp.sum(r)))
        ts.append(time.time() - t0)
    med = sorted(ts)[len(ts) // 2]
    per = med / total_reads * 1e9
    print(f"{mode}: {med*1e3:8.2f} ms for {total_reads} reads "
          f"-> {per:6.2f} ns/read", flush=True)


def smem_capacity():
    print("--- SMEM capacity ladder ---", flush=True)
    for kib in (64, 128, 256, 512, 768, 1024):
        n = kib * 256  # int32 count

        def kernel(t_ref, out_ref):
            out_ref[...] = jnp.full((1, 1), t_ref[0] + t_ref[n - 1],
                                    jnp.int32)

        try:
            fn = jax.jit(lambda t: pl.pallas_call(
                kernel,
                in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
                out_specs=pl.BlockSpec((1, 1), lambda: (0, 0)),
                out_shape=jax.ShapeDtypeStruct((1, 1), jnp.int32),
            )(t))
            r = fn(jnp.arange(n, dtype=jnp.int32))
            float(jax.device_get(jnp.sum(r)))
            print(f"SMEM {kib:5d} KiB: ok", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"SMEM {kib:5d} KiB: FAILED {type(e).__name__}: "
                  f"{str(e)[:160]}", flush=True)
            break


def main():
    total = 1 << 22
    rng = np.random.default_rng(0)
    tbls = [jnp.asarray(
        rng.integers(0, ROWS * 128, size=(ROWS, 128), dtype=np.int32))
        for _ in range(3)]
    for mode in ("A", "B", "C"):
        run(mode, total, tbls)
    smem_capacity()


if __name__ == "__main__":
    main()
