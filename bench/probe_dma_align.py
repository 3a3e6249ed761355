"""Probe: which HBM->SMEM DMA slice shapes Mosaic accepts on this chip.

Round-4 postmortem (VERDICT.md weak #1): DMAs of the form
`hbm2d.at[row, pl.ds(off, W)]` fail Mosaic compilation with
"Slice shape along dimension 0 must be aligned to tiling (8), but is 1".
This probe tries the candidate replacements on the REAL device so round 5
rewrites the walks against a measured constraint instead of a guess:

  A. 2-D row slice (the round-4 pattern)            -- expected FAIL
  B. 1-D flat, dynamic 128-aligned offset           -- candidate fix
  C. 1-D flat, dynamic unaligned offset             -- learns the real rule
  D. 2-D slice with dim-0 size 8                    -- fallback fix
  E. 1-D flat, static offset                        -- sanity
"""
import functools
import sys

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NROW, NCOL, WIN = 16, 8192, 1024


def run(name, build):
    try:
        fn = build()
        out = jax.block_until_ready(fn())
        ok = int(out.reshape(-1)[0])
        print(f"{name}: OK first={ok}")
        return True
    except Exception as e:  # noqa: BLE001
        msg = str(e).replace("\n", " ")[:200]
        print(f"{name}: FAIL {type(e).__name__}: {msg}")
        return False


def probe_2d_row():
    x = jnp.arange(NROW * NCOL, dtype=jnp.int32).reshape(NROW, NCOL)

    def kernel(x_hbm, o_ref, win, sem):
        row = jnp.int32(3)
        off = jnp.int32(256)
        cp = pltpu.make_async_copy(x_hbm.at[row, pl.ds(off, WIN)],
                                   win.at[0], sem)
        cp.start()
        cp.wait()
        o_ref[...] = jnp.zeros_like(o_ref) + win[0, 0]

    def build():
        f = pl.pallas_call(
            kernel,
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32),
            scratch_shapes=[pltpu.SMEM((2, WIN), jnp.int32),
                            pltpu.SemaphoreType.DMA],
        )
        return functools.partial(f, x)
    return build


def probe_1d(align, static=False):
    x = jnp.arange(NROW * NCOL, dtype=jnp.int32)

    def kernel(x_hbm, o_ref, win, sem):
        if static:
            off = 3 * NCOL + 256
            src = x_hbm.at[pl.ds(off, WIN)]
        else:
            off = jnp.int32(3) * NCOL + jnp.int32(256 if align else 131)
            src = x_hbm.at[pl.ds(off, WIN)]
        cp = pltpu.make_async_copy(src, win.at[0], sem)
        cp.start()
        cp.wait()
        o_ref[...] = jnp.zeros_like(o_ref) + win[0, 0]

    def build():
        f = pl.pallas_call(
            kernel,
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32),
            scratch_shapes=[pltpu.SMEM((2, WIN), jnp.int32),
                            pltpu.SemaphoreType.DMA],
        )
        return functools.partial(f, x)
    return build


def probe_2d_8rows():
    x = jnp.arange(NROW * NCOL, dtype=jnp.int32).reshape(NROW, NCOL)

    def kernel(x_hbm, o_ref, win, sem):
        row8 = jnp.int32(8)
        off = jnp.int32(256)
        cp = pltpu.make_async_copy(
            x_hbm.at[pl.ds(row8, 8), pl.ds(off, WIN)], win, sem)
        cp.start()
        cp.wait()
        o_ref[...] = jnp.zeros_like(o_ref) + win[0, 0]

    def build():
        f = pl.pallas_call(
            kernel,
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32),
            scratch_shapes=[pltpu.SMEM((8, WIN), jnp.int32),
                            pltpu.SemaphoreType.DMA],
        )
        return functools.partial(f, x)
    return build


def probe_1d_multirow_table():
    # The walks' fused-table DMA: t_hbm.at[pl.ds(g*nblk, nblk), :] with
    # nblk in {2,4} -- 1-D equivalent: one flat slice of nblk*TW words.
    TW = 2048
    x = jnp.arange(NROW * TW, dtype=jnp.int32)

    def kernel(x_hbm, o_ref, tab, sem):
        g = jnp.int32(2)
        cp = pltpu.make_async_copy(
            x_hbm.at[pl.ds(g * (4 * TW), 4 * TW)], tab, sem)
        cp.start()
        cp.wait()
        o_ref[...] = jnp.zeros_like(o_ref) + tab[0]

    def build():
        f = pl.pallas_call(
            kernel,
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32),
            scratch_shapes=[pltpu.SMEM((4 * TW,), jnp.int32),
                            pltpu.SemaphoreType.DMA],
        )
        return functools.partial(f, x)
    return build


if __name__ == "__main__":
    print("devices:", jax.devices())
    results = {}
    results["A_2d_row1"] = run("A_2d_row1 (round-4 pattern)", probe_2d_row())
    results["B_1d_aligned"] = run("B_1d_dyn_aligned128",
                                  lambda: probe_1d(True)())
    results["C_1d_unaligned"] = run("C_1d_dyn_unaligned",
                                    lambda: probe_1d(False)())
    results["D_2d_8rows"] = run("D_2d_dim0_size8", probe_2d_8rows())
    results["E_1d_static"] = run("E_1d_static",
                                 lambda: probe_1d(True, static=True)())
    results["F_1d_table"] = run("F_1d_multirow_table",
                                probe_1d_multirow_table())
    print(results)
    sys.exit(0)
