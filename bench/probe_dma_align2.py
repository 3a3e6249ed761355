"""Probe 2: which DMA *destinations* Mosaic accepts on this chip.

probe_dma_align.py round-5 on-chip result: every 1-D flat HBM source
variant FAILED (B/C/E) while F (same flat source, full 1-D SMEM ref as
destination) and D (8-row 2-D both sides) passed.  The only difference
between E (fail) and F (pass) is the DESTINATION: `win.at[0]` — a
size-1 row slice of a (2, WIN) SMEM scratch — vs a whole (W,) ref.
So the round-4 "tiling (8)" rejection fires on the SMEM side too, and
the round-5 flat-src rewrite (commit 0a57449) kept the bad dst.

This probe pins the minimal fix for the four walks:
  G. flat 1-D src -> STATIC slice of flat 1-D SMEM  (c*WIN python-int)
  H. flat 1-D src -> DYNAMIC slice of flat 1-D SMEM (jnp offset)
  I. flat 1-D src -> separate per-chain 1-D SMEM refs (F exactly, x2)
  J. flat 1-D src -> row of 2-D SMEM (KNOWN-BAD control, full error)
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
        print(f"{name}: OK first={int(out.reshape(-1)[0])}")
        return True
    except Exception as e:  # noqa: BLE001
        msg = " ".join(str(e).split())[:400]
        print(f"{name}: FAIL {type(e).__name__}: {msg}")
        return False


def _call(kernel, nscratch=1, win=WIN, flat=True):
    x = jnp.arange(NROW * NCOL, dtype=jnp.int32)
    shapes = ([pltpu.SMEM((nscratch * win,), jnp.int32)] if flat else
              [pltpu.SMEM((nscratch, win), jnp.int32)])

    def build():
        f = pl.pallas_call(
            kernel,
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32),
            scratch_shapes=shapes + [pltpu.SemaphoreType.DMA],
        )
        return functools.partial(f, x)
    return build


def probe_static_flat_dst():
    def kernel(x_hbm, o_ref, win, sem):
        acc = jnp.int32(0)
        for c in range(2):
            cp = pltpu.make_async_copy(
                x_hbm.at[pl.ds((3 + c) * NCOL + 256, WIN)],
                win.at[pl.ds(c * WIN, WIN)], sem)
            cp.start()
            cp.wait()
            acc = acc + win[c * WIN]
        o_ref[...] = jnp.zeros_like(o_ref) + acc
    return _call(kernel, nscratch=2)


def probe_dyn_flat_dst():
    def kernel(x_hbm, o_ref, win, sem):
        c = jnp.int32(1)
        cp = pltpu.make_async_copy(
            x_hbm.at[pl.ds(jnp.int32(3 * NCOL + 256), WIN)],
            win.at[pl.ds(c * WIN, WIN)], sem)
        cp.start()
        cp.wait()
        o_ref[...] = jnp.zeros_like(o_ref) + win[WIN]
    return _call(kernel, nscratch=2)


def probe_sep_refs():
    def kernel(x_hbm, o_ref, win0, win1, sem):
        for c, w in enumerate((win0, win1)):
            cp = pltpu.make_async_copy(
                x_hbm.at[pl.ds((3 + c) * NCOL + 256, WIN)], w, sem)
            cp.start()
            cp.wait()
        o_ref[...] = jnp.zeros_like(o_ref) + win0[0] + win1[0]

    x = jnp.arange(NROW * NCOL, dtype=jnp.int32)

    def build():
        f = pl.pallas_call(
            kernel,
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32),
            scratch_shapes=[pltpu.SMEM((WIN,), jnp.int32),
                            pltpu.SMEM((WIN,), jnp.int32),
                            pltpu.SemaphoreType.DMA],
        )
        return functools.partial(f, x)
    return build


def probe_row_dst_control():
    def kernel(x_hbm, o_ref, win, sem):
        cp = pltpu.make_async_copy(
            x_hbm.at[pl.ds(3 * NCOL + 256, WIN)], win.at[0], sem)
        cp.start()
        cp.wait()
        o_ref[...] = jnp.zeros_like(o_ref) + win[0, 0]
    return _call(kernel, nscratch=2, flat=False)


if __name__ == "__main__":
    print("devices:", jax.devices())
    results = {}
    results["G_static_flat_dst"] = run("G_static_flat_dst",
                                       probe_static_flat_dst())
    results["H_dyn_flat_dst"] = run("H_dyn_flat_dst", probe_dyn_flat_dst())
    results["I_sep_refs"] = run("I_sep_refs", probe_sep_refs())
    results["J_row_dst_control"] = run("J_row_dst_control",
                                       probe_row_dst_control())
    print(results)
    sys.exit(0)
