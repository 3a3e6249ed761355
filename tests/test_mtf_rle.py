"""Device MTF / RLE1 / RLE2 scan kernels vs sequential references."""

import numpy as np
import pytest

import jax.numpy as jnp

from tpz import oracle
from tpz.kernels.mtf import mtf_ranks
from tpz.kernels.rle import mtf_rle2_reference, rle1_encode, rle2_encode
from tpz.utils import corpus


def seq_mtf(vals, alpha):
    order = list(range(alpha))
    out = []
    for v in vals:
        j = order.index(v)
        out.append(j)
        order.pop(j)
        order.insert(0, v)
    return out


@pytest.mark.parametrize("seed,n,alpha", [(0, 500, 7), (1, 2048, 256),
                                          (2, 5000, 3), (3, 4097, 256)])
def test_mtf_ranks(seed, n, alpha):
    rng = np.random.default_rng(seed)
    # skewed values so zero runs appear (BWT-like)
    v = np.minimum(rng.zipf(1.4, size=n) - 1, alpha - 1).astype(np.int32)
    got = np.asarray(mtf_ranks(jnp.asarray(v[None, :]),
                               jnp.asarray([n], np.int32), alpha=alpha))[0]
    ref = seq_mtf(v.tolist(), alpha)
    assert got.tolist() == ref


def test_mtf_batched():
    rng = np.random.default_rng(9)
    v = rng.integers(0, 50, size=(3, 3000)).astype(np.int32)
    got = np.asarray(mtf_ranks(jnp.asarray(v), jnp.asarray([3000] * 3,
                                                           np.int32),
                               alpha=50))
    for b in range(3):
        assert got[b].tolist() == seq_mtf(v[b].tolist(), 50)


@pytest.mark.skipif(not oracle.available(), reason="oracle not built")
@pytest.mark.parametrize("name", ["text_4k", "all_zero_1k", "max_match_run",
                                  "repetitive_4k", "random_4k"])
def test_rle1_matches_oracle(name):
    data = corpus.edge_cases()[name]
    n = len(data)
    d = np.frombuffer(data, np.uint8).astype(np.int32)
    out, out_len = rle1_encode(jnp.asarray(d[None, :]),
                               jnp.asarray([n], np.int32))
    got = np.asarray(out)[0][: int(out_len[0])].astype(np.uint8).tobytes()
    ref_rle, off, ln, _ = oracle.bzip2_rle1(data, level=9)
    assert off.size == 1
    assert got == ref_rle[: ln[0]].tobytes()


def test_rle1_long_run_split():
    data = b"z" * 1000  # forces 259-unit recuts
    d = np.frombuffer(data, np.uint8).astype(np.int32)
    out, out_len = rle1_encode(jnp.asarray(d[None, :]),
                               jnp.asarray([len(data)], np.int32))
    got = np.asarray(out)[0][: int(out_len[0])].astype(np.uint8).tobytes()
    ref_rle, _, ln, _ = oracle.bzip2_rle1(data, level=9)
    assert got == ref_rle[: ln[0]].tobytes()


@pytest.mark.parametrize("seed,n", [(0, 1000), (1, 5000), (4, 63)])
def test_mtf_plus_rle2_matches_reference(seed, n):
    rng = np.random.default_rng(seed)
    last = rng.integers(0, 20, size=n).astype(np.uint8)
    last[rng.random(n) < 0.6] = 5  # heavy repetition -> zero runs
    used = np.sort(np.unique(last))
    to_seq = np.zeros(256, np.int32)
    to_seq[used] = np.arange(len(used))
    v = to_seq[last]
    ranks = mtf_ranks(jnp.asarray(v[None, :].astype(np.int32)),
                      jnp.asarray([n], np.int32), alpha=int(len(used)))
    syms, sym_len = rle2_encode(ranks, jnp.asarray([n], np.int32))
    got = np.asarray(syms)[0][: int(sym_len[0])].tolist()
    ref = mtf_rle2_reference(last)
    assert got == ref
