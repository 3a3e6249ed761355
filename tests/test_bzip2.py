"""BZip2 vs stdlib bz2 — interop goldens both directions (SURVEY.md §4)."""

import bz2 as stdbz2

import pytest

from tpz import oracle
from tpz.codecs import bzip2
from tpz.errors import CompressionError, DataError
from tpz.utils import corpus

pytestmark = pytest.mark.skipif(
    not oracle.available(), reason="oracle library not built"
)

CASES = {**corpus.edge_cases(), "text": corpus.text(1 << 16),
         "mixed": corpus.mixed(150_000), "skewed": corpus.skewed_bytes(60_000)}


@pytest.mark.parametrize("name", list(CASES))
def test_stdlib_decodes_ours(name):
    data = CASES[name]
    comp = bzip2.compress(data, backend="oracle")
    assert stdbz2.decompress(comp) == data, name


@pytest.mark.parametrize("name", list(CASES))
def test_we_decode_stdlib(name):
    data = CASES[name]
    for level in (1, 9):
        comp = stdbz2.compress(data, level)
        assert bzip2.decompress(comp) == data, (name, level)


@pytest.mark.parametrize("name", list(CASES))
def test_roundtrip(name):
    data = CASES[name]
    comp = bzip2.compress(data, backend="oracle")
    assert bzip2.decompress(comp) == data, name


def test_empty():
    comp = bzip2.compress(b"", backend="oracle")
    assert stdbz2.decompress(comp) == b""
    assert bzip2.decompress(stdbz2.compress(b"")) == b""


def test_multiblock():
    """Input spanning multiple 100k blocks at level 1."""
    data = corpus.mixed(350_000)
    comp = oracle.bzip2_encode(data, level=1)
    assert stdbz2.decompress(comp) == data
    assert bzip2.decompress(comp) == data


def test_multistream():
    a, b = corpus.text(30_000), corpus.random_bytes(10_000)
    blob = stdbz2.compress(a) + stdbz2.compress(b)
    assert bzip2.decompress(blob) == a + b


def test_size_reasonable():
    data = corpus.text(1 << 16)
    ours = len(bzip2.compress(data, backend="oracle"))
    theirs = len(stdbz2.compress(data, 9))
    assert ours <= theirs * 1.1, (ours, theirs)


def test_rle1_protection():
    """Long runs exercise RLE1 (including the 255+4 split)."""
    data = b"\x00" * 1000 + b"ab" * 50 + b"\xff" * 300 + b"x" * 4 + b"\x07"
    comp = bzip2.compress(data, backend="oracle")
    assert stdbz2.decompress(comp) == data


def test_negative_truncated():
    comp = bzip2.compress(corpus.text(50_000), backend="oracle")
    with pytest.raises(CompressionError):
        bzip2.decompress(comp[: len(comp) // 2])


def test_negative_bad_magic():
    with pytest.raises(DataError):
        bzip2.decompress(b"BAh9" + b"\x00" * 50)


def test_negative_corrupt_crc():
    comp = bytearray(bzip2.compress(corpus.text(20_000), backend="oracle"))
    comp[len(comp) // 2] ^= 0xFF
    with pytest.raises(CompressionError):
        bzip2.decompress(bytes(comp))


def test_large_block():
    """Full-size 900k blocks: regression for the uint16 canonical-code
    truncation (17-bit codes corrupted the decode tables; found by a 16 MiB
    round-trip — smaller blocks never produce length-17 codes)."""
    data = corpus.mixed(2 << 20, seed=161)
    comp = bzip2.compress(data, backend="oracle")
    assert bzip2.decompress(comp) == data
    assert stdbz2.decompress(comp) == data
    assert bzip2.decompress(stdbz2.compress(data, 9)) == data


def test_incremental_decode_stream_block_granular():
    """Round 4 (VERDICT r3 item 7): bzip2 DecodeStream decodes blocks as
    they complete — O(total) across small writes, plaintext emitted
    before the stream ends, multi-stream aware."""
    import bz2 as stdbz2

    import numpy as np

    from tpz.api import DecodeStream
    from tpz.utils import corpus

    data1 = corpus.mixed(700_000, seed=5)   # multiple 100k blocks
    data2 = corpus.mixed(120_000, seed=6)
    blob = stdbz2.compress(data1, 1) + stdbz2.compress(data2, 9)
    ds = DecodeStream("bzip2")
    out = bytearray()
    rng = np.random.default_rng(0)
    pos = 0
    emitted_early = False
    while pos < len(blob):
        step = int(rng.integers(1, 5000))
        out += ds.write(blob[pos:pos + step])
        pos += step
        if out and pos < len(blob) * 0.8:
            emitted_early = True
    out += ds.finish()
    assert bytes(out) == data1 + data2
    assert emitted_early  # block granularity, not wait-for-the-end


def test_incremental_decode_whole_blob_single_write():
    """ADVICE r4 high: a single write() holding a whole multi-block
    stream must decode every block, not just the first — the round-4
    scan frontier jumped to end-of-buffer after the first candidate."""
    import bz2 as stdbz2

    from tpz.api import DecodeStream
    from tpz.utils import corpus

    data = corpus.mixed(700_000, seed=11)  # multiple 100k blocks at -1
    blob = stdbz2.compress(data, 1)
    ds = DecodeStream("bzip2")
    out = ds.write(blob)
    out += ds.finish()
    assert bytes(out) == data
    # Two streams in one write.
    data2 = corpus.mixed(250_000, seed=12)
    ds = DecodeStream("bzip2")
    out = ds.write(blob + stdbz2.compress(data2, 1))
    out += ds.finish()
    assert bytes(out) == data + data2


def test_incremental_decode_byte_aligned_magic_at_write_boundary():
    """ADVICE r4 medium: a byte-aligned block magic occupying the final
    6 bytes of the buffered data must be found (the s==0 scan dropped the
    last byte), including when a write boundary lands right after it."""
    import bz2 as stdbz2

    from tpz.api import DecodeStream
    from tpz.codecs.bzip2 import _MAGIC_BLOCK, _find_magics
    from tpz.utils import corpus

    # Direct scanner check: magic flush against the end of the buffer.
    buf = b"\x00" * 80 + _MAGIC_BLOCK.to_bytes(6, "big")
    assert 80 * 8 in _find_magics(buf, 0, len(buf) * 8)

    # End-to-end: split every multi-block stream byte position so any
    # byte-aligned boundary gets exercised as a write frontier.
    data = corpus.mixed(220_000, seed=13)
    blob = stdbz2.compress(data, 1)
    starts = _find_magics(blob, 0, len(blob) * 8)
    aligned = [s for s in starts if s % 8 == 0 and s > 0]
    cuts = sorted({(s // 8) + 6 for s in aligned} | {len(blob) // 2})
    ds = DecodeStream("bzip2")
    out = bytearray()
    pos = 0
    for cut in cuts + [len(blob)]:
        out += ds.write(blob[pos:cut])
        pos = cut
    out += ds.finish()
    assert bytes(out) == data


def test_incremental_decode_stream_errors():
    import bz2 as stdbz2

    import pytest

    from tpz.api import DecodeStream
    from tpz.errors import DataError, UnexpectedEof
    from tpz.utils import corpus

    blob = stdbz2.compress(corpus.mixed(300_000, seed=9), 1)
    ds = DecodeStream("bzip2")
    ds.write(blob[:1000])
    with pytest.raises(UnexpectedEof):
        ds.finish()
    ds2 = DecodeStream("bzip2")
    with pytest.raises(DataError):
        ds2.write(b"nonsense-bytes-here-not-bzip2!!")
        ds2.finish()
