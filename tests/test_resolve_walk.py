"""Differential tests: the Pallas copy-machine resolve (round 4,
tpz/kernels/resolve_walk.py) vs the XLA pointer-doubling reference it
replaced. Both consume the dense marker space produced by the DEFLATE /
LZHUF device walks (tpz/kernels/inflate_pipeline.py marker layout)."""

import jax.numpy as jnp
import numpy as np
import pytest

from tpz.kernels import resolve_walk
from tpz.kernels.inflate_pipeline import (_KIND_LIT, _KIND_MATCH,
                                          _resolve_doubling)


def make_markers(rng, n, dist_bias=0, max_dist=4096, max_len=258,
                 p_lit=0.5):
    """Random valid marker stream: every match reaches backward by
    1..max_dist and bytes inside matches are blank (0), exactly as the
    symbol walks emit them."""
    m = np.zeros(n, np.int32)
    pos = 0
    while pos < n:
        if pos == 0 or rng.random() < p_lit:
            m[pos] = (_KIND_LIT << 28) | int(rng.integers(0, 256))
            pos += 1
        else:
            ln = min(int(rng.integers(3, max_len + 1)), n - pos)
            d = int(rng.integers(1, min(pos, max_dist) + 1))
            m[pos] = (_KIND_MATCH << 28) | ((d - dist_bias) << 9) | ln
            pos += ln
    return m


@pytest.mark.parametrize("n,bias,max_dist,p_lit", [
    (128 * 2, 0, 100, 0.5),
    (128 * 6, 0, 300, 0.6),
    (1 << 16, 0, 4096, 0.5),
    (3 << 16, 0, 32768, 0.45),
    (1 << 18, 1, 65536, 0.5),      # lzhuf: dist-1 fields, 64 KiB window
    (1 << 18, 0, 32768, 0.15),     # match-heavy (deep overlap chains)
])
def test_copy_machine_matches_doubling(n, bias, max_dist, p_lit):
    rng = np.random.default_rng(n ^ max_dist)
    m = jnp.asarray(make_markers(rng, n, bias, max_dist, p_lit=p_lit))
    want = np.asarray(_resolve_doubling(m, dist_bias=bias))
    got = np.asarray(resolve_walk.resolve_dense(
        m, dist_bias=bias, interpret=True))
    assert np.array_equal(want, got)


def test_rle_overlap_runs():
    """dist < len self-overlap: the modular source re-basing must double
    the window, byte-exactly, for dist 1..4."""
    rng = np.random.default_rng(0)
    parts = [np.asarray([(_KIND_LIT << 28) | int(rng.integers(0, 256))
                         for _ in range(8)], np.int32)]
    pos = 8
    for d in (1, 2, 3, 4, 7):
        run = np.zeros(258, np.int32)
        run[0] = (_KIND_MATCH << 28) | (d << 9) | 258
        parts.append(run)
        pos += 258
    pad = np.full((-pos) % 128, (_KIND_LIT << 28), np.int32)
    m = jnp.asarray(np.concatenate(parts + [pad]))
    want = np.asarray(_resolve_doubling(m))
    got = np.asarray(resolve_walk.resolve_dense(m, interpret=True))
    assert np.array_equal(want, got)


def test_chained_halo(monkeypatch):
    """Spans past PHASE2_CAP chain chunks through the resolved halo;
    force small chunks so the CPU test exercises >= 3 chunks, including
    matches crossing the cut (boundary-carry injection)."""
    monkeypatch.setattr(resolve_walk, "PHASE2_CAP", 1 << 17)
    rng = np.random.default_rng(11)
    n = (1 << 19) + (1 << 17)
    for bias, md in ((0, 32768), (1, 65536)):
        m = jnp.asarray(make_markers(rng, n, bias, md))
        want = np.asarray(_resolve_doubling(m, dist_bias=bias))
        got = np.asarray(resolve_walk.resolve_dense(
            m, dist_bias=bias, interpret=True))
        assert np.array_equal(want, got)
