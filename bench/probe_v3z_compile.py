"""Probe: compile time of the REAL parse_extend_v3z vs block count NB.

probe_scatter_compile cleared the per-trip scatters (all forms compile
in seconds at NW=512), so bisect the actual kernel: lower+compile
parse_extend_v3z alone at NB = 16 (1 MiB), 32, 64, 128 (8 MiB) and
report wall time per step.  Usage: probe_v3z_compile.py [NB ...]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import jax
import jax.numpy as jnp

from tpz.kernels.parse import parse_extend_v3z

BLOCK = 65536
WINDOW = 32768
M = BLOCK + WINDOW + 512  # words rows per block (approx pipeline shape)


def run(nb):
    pk1 = jnp.zeros((nb, BLOCK), jnp.int32)
    pk2 = jnp.zeros((nb, BLOCK), jnp.int32)
    cap = jnp.full((nb, BLOCK), 258, jnp.int32)
    mw = -(-M // 1024) * 1024
    words = jnp.zeros((nb, mw), jnp.int32)
    blen = jnp.full((nb, 1), BLOCK, jnp.int32)

    fn = jax.jit(lambda *a: parse_extend_v3z(
        *a, window=WINDOW, max_match=258, screen_bytes=16,
        lazy=False, restart=16384)[0].sum())
    t0 = time.time()
    lowered = fn.lower(pk1, pk2, cap, words, blen)
    t1 = time.time()
    lowered.compile()
    t2 = time.time()
    print(f"NB={nb}: trace+lower {t1-t0:.1f}s compile {t2-t1:.1f}s",
          flush=True)


if __name__ == "__main__":
    nbs = [int(a) for a in sys.argv[1:]] or [16, 32, 64, 128]
    print("devices:", jax.devices(), flush=True)
    for nb in nbs:
        run(nb)
