"""Probe 3: pin the 1-D DMA alignment rule exactly.

probe_dma_align round-5 on-chip matrix so far:
  PASS F: 1-D src, dynamic offset 16384 (1024-word aligned), len 8192,
          dst = full 1-D SMEM ref
  PASS D: 2-D src (8-row slice, 128-aligned col off), dst full (8,W)
  FAIL B/C/E/G/H/I: every 1-D variant whose offset is 128- but not
          1024-word aligned (24832 % 1024 = 256), regardless of dst.

Hypothesis: 1-D slices of HBM must start at multiples of 8*128 = 1024
words (one full (8,128) tile) and maybe be whole-tile long.  This probe
varies ONE dimension at a time from the known-good F configuration and
prints the full Mosaic error for the first failure.
"""
import functools
import sys

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N = 1 << 17  # 131072 words of HBM


def run(name, off, ln, dyn, full_err=False):
    x = jnp.arange(N, dtype=jnp.int32)

    def kernel(x_hbm, o_ref, win, sem):
        o = jnp.int32(off) if dyn else off
        cp = pltpu.make_async_copy(x_hbm.at[pl.ds(o, ln)], win, sem)
        cp.start()
        cp.wait()
        o_ref[...] = jnp.zeros_like(o_ref) + win[0]

    f = pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32),
        scratch_shapes=[pltpu.SMEM((ln,), jnp.int32),
                        pltpu.SemaphoreType.DMA],
    )
    try:
        out = jax.block_until_ready(functools.partial(f, x)())
        got = int(out.reshape(-1)[0])
        print(f"{name}: OK first={got} (want {off})")
        return True
    except Exception as e:  # noqa: BLE001
        msg = " ".join(str(e).split())
        if not full_err:
            # strip the relay WARN spam; keep the mosaic core
            import re
            m = re.search(r"(Slice [^;]*|INTERNAL[^[]*)", msg)
            msg = (m.group(0) if m else msg)[:200]
        print(f"{name}: FAIL {msg[:1200]}")
        return False


if __name__ == "__main__":
    print("devices:", jax.devices())
    r = {}
    r["tile_dyn"] = run("off=16384 len=1024 dyn (tile-aligned)",
                        16384, 1024, True)
    r["tile_static"] = run("off=16384 len=1024 static", 16384, 1024, False)
    r["off128_dyn"] = run("off=16512 len=1024 dyn (128-only aligned)",
                          16512, 1024, True, full_err=True)
    r["len_odd"] = run("off=16384 len=896 dyn (sub-tile len)",
                       16384, 896, True)
    r["len128"] = run("off=16384 len=128 dyn", 16384, 128, True)
    print(r)
    sys.exit(0)
