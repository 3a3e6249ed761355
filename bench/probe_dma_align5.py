"""Probe 5: which DYNAMIC offset forms Mosaic's divisibility analysis
proves divisible by the 1-D tile (1024 words).

probe_dma_align3 passed only CONSTANT offsets; the real walks compute
the window base from a loop-carried scalar.  On-chip error at HEAD-1:
"Failed to prove that a tile index in dimension 0 is divisible by the
tiling (1024)" for nb = (x >> 10) << 10.  Candidates:
  P. (x >> 10) << 10        (shift both ways — known suspect)
  Q. (x >> 10) * 1024       (mul form)
  R. (x & ~1023)            (mask form)
  S. program_id * 1024-mult constant (the initial per-chain DMA form)
"""
import functools
import sys

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N = 1 << 17
LN = 1024


def run(name, offs):
    x = jnp.arange(N, dtype=jnp.int32)

    def kernel(s_ref, x_hbm, o_ref, win, sem):
        off = offs(s_ref[0], pl.program_id(0))
        cp = pltpu.make_async_copy(x_hbm.at[pl.ds(off, LN)], win, sem)
        cp.start()
        cp.wait()
        o_ref[...] = jnp.zeros_like(o_ref) + win[0]

    f = pl.pallas_call(
        kernel,
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((8, 128), lambda g: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32),
        scratch_shapes=[pltpu.SMEM((LN,), jnp.int32),
                        pltpu.SemaphoreType.DMA],
    )
    try:
        out = jax.block_until_ready(
            functools.partial(f, jnp.array([33000], jnp.int32), x)())
        print(f"{name}: OK first={int(out.reshape(-1)[0])}")
        return True
    except Exception as e:  # noqa: BLE001
        import re
        msg = " ".join(str(e).split())
        m = re.search(r"(Failed to prove[^.]*|Slice [^;]*)", msg)
        print(f"{name}: FAIL {(m.group(0) if m else msg)[:160]}")
        return False


if __name__ == "__main__":
    print("devices:", jax.devices())
    srl = jax.lax.shift_right_logical
    r = {}
    r["P_shift2"] = run("P_(x>>10)<<10",
                        lambda s, g: jax.lax.shift_left(srl(s, 10), 10))
    r["Q_mul"] = run("Q_(x>>10)*1024", lambda s, g: srl(s, 10) * 1024)
    r["R_mask"] = run("R_x&~1023", lambda s, g: s & ~jnp.int32(1023))
    r["S_pid"] = run("S_pid*2048+1024", lambda s, g: g * 2048 + 1024)
    print(r)
    sys.exit(0)
