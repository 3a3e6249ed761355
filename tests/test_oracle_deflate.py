"""C++ oracle DEFLATE vs stdlib zlib — the interop golden tests.

SURVEY.md §4: the reference crate's external behavior is pinned by RFC 1951;
any conformant DEFLATE implementation round-trips with it. stdlib zlib is
such an implementation, so:
  (a) zlib must decode our oracle's raw-deflate streams,
  (b) our oracle must decode zlib's streams,
  (c) round-trip through the oracle alone must be identity.
"""

import zlib

import numpy as np
import pytest

from tpz import oracle
from tpz.errors import CompressionError, DataError, UnexpectedEof
from tpz.utils import corpus

pytestmark = pytest.mark.skipif(
    not oracle.available(), reason="oracle library not built"
)


def zlib_raw_deflate(data: bytes, level: int = 6) -> bytes:
    c = zlib.compressobj(level, zlib.DEFLATED, -15)
    return c.compress(data) + c.flush()


def zlib_raw_inflate(data: bytes) -> bytes:
    return zlib.decompress(data, -15)


ALL_CASES = {**corpus.edge_cases(), **corpus.standard_suite(1 << 16)}


@pytest.mark.parametrize("name", list(ALL_CASES))
def test_roundtrip_and_zlib_decodes_ours(name):
    data = ALL_CASES[name]
    comp = oracle.deflate_encode(data)
    # (c) self round-trip
    plain, consumed = oracle.inflate(comp)
    assert plain == data, f"oracle round-trip failed for {name}"
    assert consumed == len(comp)
    # (a) zlib decodes ours
    assert zlib_raw_inflate(comp) == data, f"zlib rejected our stream for {name}"


@pytest.mark.parametrize("name", list(ALL_CASES))
def test_we_decode_zlib(name):
    data = ALL_CASES[name]
    for level in (1, 6, 9):
        comp = zlib_raw_deflate(data, level)
        plain, _ = oracle.inflate(comp)
        assert plain == data, f"our inflate failed on zlib level {level} {name}"


def test_lazy_profile_roundtrip():
    data = corpus.mixed(1 << 17)
    p = oracle.params_array(max_chain=64, lazy=True)
    comp = oracle.deflate_encode(data, p)
    assert zlib_raw_inflate(comp) == data
    greedy = oracle.deflate_encode(data)
    # lazy should not be (much) worse; usually better
    assert len(comp) <= len(greedy) * 1.02


def test_size_vs_zlib():
    """North star: default profile <= zlib -6 and level 9 <= zlib -9 on
    the 4 MiB mix (VERDICT r1 #3: gates tightened from 1.15x to 1.0x)."""
    from tpz.codecs.deflate import DeflateConfig

    data = corpus.mixed(1 << 22)
    z6 = len(zlib_raw_deflate(data, 6))
    z9 = len(zlib_raw_deflate(data, 9))
    ours6 = len(oracle.deflate_encode(
        data, DeflateConfig(level=6).params_array()))
    ours9 = len(oracle.deflate_encode(
        data, DeflateConfig(level=9).params_array()))
    assert ours6 <= z6, (ours6, z6)
    assert ours9 <= z9, (ours9, z9)


def test_size_vs_zlib_second_corpus():
    """ADVICE r2: the primary <=1.0x gate's level-9 margin is ~0.003% on
    one corpus, so a second seed guards against a parse tweak silently
    flipping it. A small tolerance here avoids hair-trigger flakes while
    the primary corpus stays a hard <=1.0x gate."""
    from tpz.codecs.deflate import DeflateConfig

    data = corpus.mixed(1 << 21, seed=42)
    z6 = len(zlib_raw_deflate(data, 6))
    z9 = len(zlib_raw_deflate(data, 9))
    ours6 = len(oracle.deflate_encode(
        data, DeflateConfig(level=6).params_array()))
    ours9 = len(oracle.deflate_encode(
        data, DeflateConfig(level=9).params_array()))
    assert ours6 <= z6 * 1.001, (ours6, z6)
    assert ours9 <= z9 * 1.001, (ours9, z9)


def test_stored_fallback_on_random():
    data = corpus.random_bytes(1 << 16)
    comp = oracle.deflate_encode(data)
    # stored blocks: ~5 bytes overhead per 64k... must not expand beyond ~0.1%
    assert len(comp) <= len(data) + 5 * (len(data) // 65535 + 2) + 64
    assert zlib_raw_inflate(comp) == data


def test_lzss_tokens_reconstruct():
    data = corpus.mixed(1 << 16)
    toks = oracle.lzss_tokenize(data)
    out = bytearray()
    for pos, ln, lit, dist in toks:
        assert pos == len(out)
        if ln == 0:
            out.append(lit)
        else:
            assert 3 <= ln <= 258 and 1 <= dist <= 32768 and dist <= len(out)
            for _ in range(ln):
                out.append(out[-dist])
    assert bytes(out) == data


def test_lzss_block_local_parse():
    """Tokens never cross the 64 KiB block boundary (parse spec v1)."""
    data = corpus.repetitive(200_000)
    toks = oracle.lzss_tokenize(data)
    bs = 65536
    for pos, ln, _, _ in toks:
        if ln > 0:
            assert (pos % bs) + ln <= bs


def test_inflate_negative_truncated():
    comp = oracle.deflate_encode(corpus.text(10000))
    with pytest.raises(CompressionError):
        oracle.inflate(comp[: len(comp) // 2])


def test_inflate_negative_garbage():
    with pytest.raises(CompressionError):
        oracle.inflate(b"\x07\xff" + b"\xa5" * 100)


def test_inflate_negative_bad_stored_nlen():
    # BTYPE=00 with LEN != ~NLEN
    bad = bytes([0x01, 0x05, 0x00, 0x12, 0x34]) + b"hello"
    with pytest.raises(DataError):
        oracle.inflate(bad)


def test_inflate_negative_empty():
    with pytest.raises(UnexpectedEof):
        oracle.inflate(b"")


def test_huff_lengths_basic():
    freqs = np.array([10, 1, 1, 1, 1, 50, 0, 2], dtype=np.uint32)
    lens = oracle.huff_lengths(freqs, 15)
    assert lens[6] == 0 and all(lens[i] > 0 for i in range(8) if i != 6)
    # Kraft equality for an optimal complete code
    assert sum(2.0 ** -int(l) for l in lens if l) == 1.0
    # limit respected
    lens4 = oracle.huff_lengths(freqs, 4)
    assert max(lens4) <= 4
    assert sum(2.0 ** -int(l) for l in lens4 if l) <= 1.0


def test_huff_canonical_rfc_example():
    # RFC 1951 §3.2.2 example: lengths (3,3,3,3,3,2,4,4) ->
    # codes 010,011,100,101,110,00,1110,1111
    lens = np.array([3, 3, 3, 3, 3, 2, 4, 4], dtype=np.uint8)
    codes = oracle.huff_canonical(lens)
    assert list(codes) == [0b010, 0b011, 0b100, 0b101, 0b110, 0b00, 0b1110,
                           0b1111]


def test_threaded_batch_apis():
    """tpz_inflate_many / tpz_deflate_encode_many (native host threads)."""
    datas = [corpus.mixed(200_000, seed=i) for i in range(6)] + [b"", b"x"]
    comps = oracle.deflate_encode_many(datas)
    for c, d in zip(comps, datas):
        assert c == oracle.deflate_encode(d)  # thread == serial, per stream
    outs = oracle.inflate_many(comps)
    assert outs == datas
