"""gzip/zlib containers vs stdlib (interop both directions) + API surface."""

import gzip as stdgzip
import io
import zlib as stdzlib

import pytest

import tpz.api as api
from tpz.codecs import gzip_codec, zlib_codec
from tpz.errors import CompressionError, DataError
from tpz.utils import corpus

CASES = {**corpus.edge_cases(), "text": corpus.text(1 << 16),
         "mixed": corpus.mixed(1 << 17)}


@pytest.mark.parametrize("name", list(CASES))
def test_zlib_container_interop(name):
    data = CASES[name]
    ours = zlib_codec.compress(data)
    assert stdzlib.decompress(ours) == data          # stdlib reads ours
    theirs = stdzlib.compress(data, 6)
    assert zlib_codec.decompress(theirs) == data     # we read stdlib
    assert zlib_codec.decompress(ours) == data       # round-trip


@pytest.mark.parametrize("name", list(CASES))
def test_gzip_container_interop(name):
    data = CASES[name]
    ours = gzip_codec.compress(data)
    assert stdgzip.decompress(ours) == data
    theirs = stdgzip.compress(data, 6)
    assert gzip_codec.decompress(theirs) == data
    assert gzip_codec.decompress(ours) == data


def test_gzip_multimember():
    a, b = corpus.text(5000), corpus.random_bytes(3000)
    blob = stdgzip.compress(a) + stdgzip.compress(b)
    assert gzip_codec.decompress(blob) == a + b


def test_gzip_header_fields():
    data = corpus.text(2000)
    buf = io.BytesIO()
    with stdgzip.GzipFile(filename="hello.txt", mode="wb", fileobj=buf) as f:
        f.write(data)
    assert gzip_codec.decompress(buf.getvalue()) == data


def test_gzip_bad_crc():
    blob = bytearray(gzip_codec.compress(b"hello world" * 10))
    blob[-6] ^= 0xFF  # corrupt stored CRC
    with pytest.raises(DataError):
        gzip_codec.decompress(bytes(blob))


def test_zlib_bad_header():
    with pytest.raises(CompressionError):
        zlib_codec.decompress(b"\x78\x00" + b"\x00" * 20)  # bad FCHECK


def test_api_formats():
    fmts = api.formats()
    assert {"deflate", "zlib", "gzip"} <= set(fmts)
    data = corpus.mixed(50_000)
    for f in ("deflate", "zlib", "gzip"):
        assert api.decompress(api.compress(data, f), f) == data


def test_api_unknown_format():
    with pytest.raises(ValueError):
        api.compress(b"x", "zip99")


def test_codec_stream_actions():
    from tpz.action import Action

    s = api.CodecStream("gzip")
    out = s.drive(b"part one ", Action.RUN)
    assert out == b""
    out1 = s.drive(b"part two", Action.FLUSH)
    out2 = s.drive(b" tail", Action.FINISH)
    assert gzip_codec.decompress(out1 + out2) == b"part one part two tail"
    with pytest.raises(CompressionError):
        s.write(b"more")


def test_api_compress_many_gzip():
    datas = [corpus.text(50_000), b"", corpus.random_bytes(10_000)]
    blobs = api.compress_many(datas, "gzip", backend="oracle")
    for d, b in zip(datas, blobs):
        assert stdgzip.decompress(b) == d
