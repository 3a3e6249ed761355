"""Top-level codec API.

Parity: the reference crate's prelude (`EncodeExt::encode` / `DecodeExt::
decode` iterator adapters, [HIGH] SURVEY.md §2.1 "Encode/Decode traits").
The TPU-native design is block-oriented, so the primary surface is
whole-buffer `compress`/`decompress`; `CodecStream` provides the streaming/
Action-driven shape of the crate's API at the host boundary.
"""

from __future__ import annotations

from typing import Callable

from tpz.action import Action
from tpz.errors import DataError

_FORMATS: dict[str, tuple[Callable, Callable]] = {}


def register_format(name: str, compress_fn: Callable, decompress_fn: Callable):
    _FORMATS[name] = (compress_fn, decompress_fn)


def _load():
    if _FORMATS:
        return
    from tpz.codecs import deflate, gzip_codec, zlib_codec

    register_format("deflate", deflate.compress, deflate.decompress)
    register_format("zlib", zlib_codec.compress, zlib_codec.decompress)
    register_format("gzip", gzip_codec.compress, gzip_codec.decompress)
    try:
        from tpz.codecs import lzss as _lzss

        register_format("lzss", _lzss.compress, _lzss.decompress)
    except ImportError:
        pass
    try:
        from tpz.codecs import lzhuf as _lzhuf

        for m in ("lh4", "lh5", "lh6", "lh7"):
            register_format(
                m,
                (lambda d, level=6, backend="auto", _m=m:
                 _lzhuf.compress(d, method=_m, backend=backend)),
                (lambda d, _m=m: _lzhuf.decompress(d, method=_m)),
            )
    except ImportError:
        pass
    try:
        from tpz.codecs import bzip2 as _bz2

        register_format("bzip2", _bz2.compress, _bz2.decompress)
    except ImportError:
        pass


def formats() -> list[str]:
    _load()
    return sorted(_FORMATS)


def compress(data: bytes, format: str = "gzip", level: int = 6,
             backend: str = "auto") -> bytes:
    _load()
    if format not in _FORMATS:
        raise ValueError(f"unknown format {format!r}; have {formats()}")
    return _FORMATS[format][0](data, level=level, backend=backend)


def decompress(data: bytes, format: str = "gzip") -> bytes:
    _load()
    if format not in _FORMATS:
        raise ValueError(f"unknown format {format!r}; have {formats()}")
    return _FORMATS[format][1](data)


def compress_many(datas, format: str = "gzip", level: int = 6,
                  backend: str = "auto") -> list[bytes]:
    """Batch compression: one device invocation covers every buffer for
    DEFLATE-family formats (the production serving shape); other formats
    fall back to a per-buffer loop."""
    _load()
    if format in ("deflate", "gzip"):
        from tpz.codecs import deflate as _d, gzip_codec as _g

        fn = _g.compress_many if format == "gzip" else _d.compress_many
        return fn(list(datas), level=level, backend=backend)
    return [compress(d, format, level=level, backend=backend) for d in datas]


class CodecStream:
    """Streaming facade with the crate's Action semantics.

    write(b) buffers input (Action::Run); flush() forces a byte-aligned
    block boundary (Action::Flush) and returns compressed bytes so far;
    finish() terminates the stream (Action::Finish).

    The TPU design is block-batched, so Flush/Finish map to whole-buffer
    encodes of the accumulated data; each flush segment becomes an
    independent member/stream concatenated at the container level (valid
    for gzip multi-member and for raw deflate consumers that tolerate
    concatenated final blocks, which includes our own decoder).
    """

    def __init__(self, format: str = "gzip", level: int = 6,
                 backend: str = "auto") -> None:
        _load()
        if format not in _FORMATS:
            raise ValueError(f"unknown format {format!r}")
        self._format = format
        self._level = level
        self._backend = backend
        self._buf = bytearray()
        self._finished = False

    def write(self, data: bytes) -> None:
        if self._finished:
            raise DataError("stream already finished")
        self._buf += data

    def _encode_segment(self) -> bytes:
        out = compress(bytes(self._buf), self._format, self._level,
                       self._backend)
        self._buf.clear()
        return out

    def flush(self) -> bytes:
        if self._finished:
            raise DataError("stream already finished")
        if not self._buf:
            return b""
        return self._encode_segment()

    def finish(self) -> bytes:
        if self._finished:
            raise DataError("stream already finished")
        self._finished = True
        return self._encode_segment()

    def drive(self, data: bytes, action: Action) -> bytes:
        """Crate-style single entry point: feed bytes + an Action."""
        self.write(data)
        if action is Action.RUN:
            return b""
        if action is Action.FLUSH:
            return self.flush()
        return self.finish()
