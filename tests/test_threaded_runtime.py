"""Native-runtime threading: determinism, identity with the sequential
reference paths, and the parallel bzip2 decode splitter."""

import bz2 as stdbz2
import hashlib
import os
import zlib

import numpy as np
import pytest

from tpz import oracle
from tpz.utils import corpus

pytestmark = pytest.mark.skipif(
    not oracle.available(), reason="oracle library not built"
)


def test_parallel_tokenizer_matches_sequential():
    data = corpus.mixed(2 << 20, seed=31)
    par = oracle.lzss_tokenize(data)
    os.environ["TPZ_SEQ_LZSS"] = "1"
    try:
        seq = oracle.lzss_tokenize(data)
    finally:
        del os.environ["TPZ_SEQ_LZSS"]
    assert np.array_equal(par, seq)


def test_threaded_encode_determinism():
    data = corpus.mixed(3 << 20, seed=32)
    for enc in (lambda: oracle.deflate_encode(data),
                lambda: oracle.bzip2_encode(data, 9),
                lambda: oracle.lzhuf_encode(data, 13)):
        digests = {hashlib.sha256(enc()).hexdigest() for _ in range(4)}
        assert len(digests) == 1


def test_parallel_bzip2_decode_large():
    data = corpus.mixed(3 << 20, seed=33)
    ours = oracle.bzip2_encode(data, 9)
    assert oracle.bzip2_decode(ours) == data            # parallel path
    assert oracle.bzip2_decode(stdbz2.compress(data, 9)) == data
    # multi-stream falls back to the serial path and still works
    two = stdbz2.compress(data[:100000]) + stdbz2.compress(data[100000:200000])
    assert oracle.bzip2_decode(two) == data[:200000]


def test_batch_apis_roundtrip():
    datas = [corpus.mixed(500_000, seed=40 + i) for i in range(5)]
    comps = oracle.deflate_encode_many(datas)
    assert oracle.inflate_many(comps) == datas
    for c, d in zip(comps, datas):
        assert zlib.decompress(c, -15) == d
