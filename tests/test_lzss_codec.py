"""Standalone LZSS codec round-trips (crate parity: LzssEncoder/Decoder)."""

import pytest

from tpz import oracle
from tpz.codecs.lzss import LzssConfig, compress, decompress, tokenize
from tpz.errors import CompressionError
from tpz.utils import corpus

pytestmark = pytest.mark.skipif(
    not oracle.available(), reason="oracle library not built"
)


@pytest.mark.parametrize("name", list(corpus.edge_cases()))
def test_roundtrip_edges(name):
    data = corpus.edge_cases()[name]
    assert decompress(compress(data)) == data


def test_roundtrip_text():
    data = corpus.text(100_000)
    comp = compress(data)
    assert decompress(comp) == data
    assert len(comp) < len(data)


def test_custom_params_like_crate():
    """LzssEncoder::new(comparison, window, max, min, lazy) analog."""
    cfg = LzssConfig(window=4096, min_match=3, max_match=64, lazy=True)
    data = corpus.repetitive(50_000)
    assert decompress(compress(data, config=cfg), cfg) == data


def test_tokenize_shape():
    toks = tokenize(b"abcabcabc")
    assert toks.ndim == 2 and toks.shape[1] == 4


def test_truncated():
    comp = compress(corpus.text(10_000))
    with pytest.raises(CompressionError):
        decompress(comp[: len(comp) // 2])


def test_final_ref_crossing_size_raises():
    """ADVICE r1: a corrupt final reference token that would run past the
    declared size must raise DataError, not return an over-long buffer."""
    # 8-byte size header declaring 4 bytes, then: flag byte 0b10 (token 1 is
    # a ref), literal 'a', ref len=3+2=5 dist=1 -> output would be 6 > 4.
    stream = (4).to_bytes(8, "little") + bytes([0b10, ord("a"), 2, 1, 0])
    with pytest.raises(CompressionError):
        decompress(stream)


def test_large_roundtrip_fast():
    """10 MB round-trip stays native (no per-byte Python loops)."""
    import time

    data = (corpus.text(65536) + corpus.repetitive(65536)) * 40
    t0 = time.time()
    comp = compress(data)
    out = decompress(comp)
    assert out == data
    assert time.time() - t0 < 10.0  # generous; Python-loop path took minutes
