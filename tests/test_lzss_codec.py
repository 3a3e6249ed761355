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
