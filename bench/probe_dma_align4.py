"""Probe 4: with a tile-aligned 1-D src (the probe-3 rule), which SMEM
destinations compile?  Decides how much of the walks to rewrite:
  K. dst = row of 2-D SMEM scratch (the walks' current dst)
  L. dst = static flat slice of 1-D SMEM scratch
  M. dst = dynamic flat slice of 1-D SMEM scratch
"""
import functools
import sys

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N = 1 << 17
LN = 1024


def run(name, make_kernel, scratch):
    x = jnp.arange(N, dtype=jnp.int32)
    f = pl.pallas_call(
        make_kernel,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32),
        scratch_shapes=[scratch, pltpu.SemaphoreType.DMA],
    )
    try:
        out = jax.block_until_ready(functools.partial(f, x)())
        print(f"{name}: OK first={int(out.reshape(-1)[0])}")
        return True
    except Exception as e:  # noqa: BLE001
        print(f"{name}: FAIL {' '.join(str(e).split())[:160]}")
        return False


def k_row2d(x_hbm, o_ref, win, sem):
    cp = pltpu.make_async_copy(
        x_hbm.at[pl.ds(jnp.int32(16384), LN)], win.at[1], sem)
    cp.start()
    cp.wait()
    o_ref[...] = jnp.zeros_like(o_ref) + win[1, 0]


def k_static_flat(x_hbm, o_ref, win, sem):
    cp = pltpu.make_async_copy(
        x_hbm.at[pl.ds(jnp.int32(16384), LN)],
        win.at[pl.ds(1 * LN, LN)], sem)
    cp.start()
    cp.wait()
    o_ref[...] = jnp.zeros_like(o_ref) + win[LN]


def k_dyn_flat(x_hbm, o_ref, win, sem):
    c = jnp.int32(1)
    cp = pltpu.make_async_copy(
        x_hbm.at[pl.ds(jnp.int32(16384), LN)],
        win.at[pl.ds(c * LN, LN)], sem)
    cp.start()
    cp.wait()
    o_ref[...] = jnp.zeros_like(o_ref) + win[LN]


if __name__ == "__main__":
    print("devices:", jax.devices())
    r = {}
    r["K_row2d_dst"] = run("K_row2d_dst", k_row2d,
                           pltpu.SMEM((2, LN), jnp.int32))
    r["L_static_flat_dst"] = run("L_static_flat_dst", k_static_flat,
                                 pltpu.SMEM((2 * LN,), jnp.int32))
    r["M_dyn_flat_dst"] = run("M_dyn_flat_dst", k_dyn_flat,
                              pltpu.SMEM((2 * LN,), jnp.int32))
    print(r)
    sys.exit(0)
