"""Kernel micro-tests (SURVEY.md §4 item 4): numpy/C++ twins agree, Pallas
and XLA parse paths agree, device token stream equals oracle tokens."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tpz import oracle
from tpz.kernels import huffman as khuff
from tpz.utils import corpus


def test_package_merge_twin_matches_cpp():
    if not oracle.available():
        pytest.skip("oracle not built")
    rng = np.random.default_rng(0)
    for trial in range(30):
        n = int(rng.integers(2, 288))
        freqs = rng.integers(0, 1000, size=n).astype(np.uint32)
        freqs[rng.random(n) < 0.3] = 0
        for limit in (7, 15):
            if np.count_nonzero(freqs) > (1 << limit):
                continue  # impossible limit; both sides reject (not tested here)
            ours = khuff.package_merge_np(freqs, limit)
            ref = oracle.huff_lengths(freqs, limit)
            assert np.array_equal(ours, ref), (trial, limit, freqs.tolist())


def test_canonical_twin_matches_cpp():
    if not oracle.available():
        pytest.skip("oracle not built")
    rng = np.random.default_rng(1)
    for _ in range(20):
        freqs = rng.integers(0, 50, size=60).astype(np.uint32)
        lens = khuff.package_merge_np(freqs, 15)
        ours = khuff.canonical_codes_np(lens)
        ref = oracle.huff_canonical(lens)
        assert np.array_equal(ours, ref)


def test_parse_pallas_matches_doubling():
    from tpz.kernels.parse import _parse_doubling, _parse_pallas

    rng = np.random.default_rng(2)
    step = rng.integers(1, 9, size=(3, 256)).astype(np.int32)
    # sprinkle long jumps
    step[rng.random(step.shape) < 0.1] = 100
    s = jnp.asarray(step)
    a = np.asarray(_parse_doubling(s))
    b = np.asarray(_parse_pallas(s, interpret=True))
    assert np.array_equal(a > 0, b > 0)


def test_device_tokens_match_oracle_tokens():
    """Stage-1 token stream == oracle LzssTokenize for the same spec."""
    if not oracle.available():
        pytest.skip("oracle not built")
    from tpz.kernels.deflate_pipeline import BLOCK, _make_blocks, _stage1
    from tpz.kernels.matchfinder import FWD_PAD, WINDOW

    data = corpus.mixed(100_000, seed=42)
    n = len(data)
    nb = (n + BLOCK - 1) // BLOCK
    span = np.zeros(WINDOW + nb * BLOCK + FWD_PAD, dtype=np.uint8)
    span[WINDOW:WINDOW + n] = np.frombuffer(data, np.uint8)
    blocks = _make_blocks(jnp.asarray(span))
    span_off = jnp.asarray((np.arange(nb) * BLOCK).astype(np.int32))
    block_len = jnp.asarray(
        np.minimum(n - np.arange(nb) * BLOCK, BLOCK).astype(np.int32))
    mlen, mdist, is_token, _, _, ntokens = _stage1(
        blocks, span_off, jnp.int32(n), block_len, 16, False)
    mlen, mdist, is_token = map(np.asarray, (mlen, mdist, is_token))

    ref = oracle.lzss_tokenize(data)
    dev_tokens = []
    for b in range(nb):
        for p in np.nonzero(is_token[b])[0]:
            pos = b * BLOCK + int(p)
            ln = int(mlen[b, p])
            if ln >= 3:
                dev_tokens.append((pos, ln, 0, int(mdist[b, p])))
            else:
                dev_tokens.append((pos, 0, int(data[pos]), 0))
    ref_tokens = [tuple(t) for t in ref.tolist()]
    assert dev_tokens == ref_tokens
