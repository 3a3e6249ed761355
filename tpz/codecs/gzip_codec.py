"""gzip container (RFC 1952): header + DEFLATE + CRC-32/ISIZE trailer.

Parity: reference crate src/gzip/ `GZipEncoder`/`GZipDecoder` ([HIGH] names,
SURVEY.md §2.1; behavior pinned by RFC 1952). Decode handles the optional
FEXTRA/FNAME/FCOMMENT/FHCRC fields and multi-member streams.
"""

from __future__ import annotations

import struct

from tpz import oracle
from tpz.codecs import deflate
from tpz.constants import GZIP_CM_DEFLATE, GZIP_MAGIC, GZIP_OS_UNIX
from tpz.errors import DataError, UnexpectedEof

_FTEXT, _FHCRC, _FEXTRA, _FNAME, _FCOMMENT = 1, 2, 4, 8, 16


def _crc32(data: bytes) -> int:
    if oracle.available():
        return oracle.crc32_reflected(data) ^ 0xFFFFFFFF
    from tpz.kernels.checksums import crc32

    return crc32(data, "reflected")


def header_bytes(level: int = 6, mtime: int = 0) -> bytes:
    xfl = 2 if level >= 7 else (4 if level <= 1 else 0)
    return GZIP_MAGIC + bytes([GZIP_CM_DEFLATE, 0]) + struct.pack(
        "<I", mtime) + bytes([xfl, GZIP_OS_UNIX])


def compress(data: bytes, level: int = 6, backend: str = "auto",
             mtime: int = 0) -> bytes:
    body = deflate.compress(data, level=level, backend=backend)
    trailer = struct.pack("<II", _crc32(data), len(data) & 0xFFFFFFFF)
    return header_bytes(level, mtime) + body + trailer


def _parse_header(data: bytes, off: int) -> int:
    if len(data) - off < 10:
        raise UnexpectedEof("gzip header truncated")
    if data[off : off + 2] != GZIP_MAGIC:
        raise DataError("bad gzip magic")
    if data[off + 2] != GZIP_CM_DEFLATE:
        raise DataError(f"unsupported gzip CM {data[off + 2]}")
    flg = data[off + 3]
    pos = off + 10
    if flg & _FEXTRA:
        if len(data) - pos < 2:
            raise UnexpectedEof("FEXTRA truncated")
        (xlen,) = struct.unpack_from("<H", data, pos)
        pos += 2 + xlen
    if flg & _FNAME:
        end = data.find(b"\x00", pos)
        if end < 0:
            raise UnexpectedEof("FNAME unterminated")
        pos = end + 1
    if flg & _FCOMMENT:
        end = data.find(b"\x00", pos)
        if end < 0:
            raise UnexpectedEof("FCOMMENT unterminated")
        pos = end + 1
    if flg & _FHCRC:
        if len(data) - pos < 2:
            raise UnexpectedEof("FHCRC truncated")
        (hcrc,) = struct.unpack_from("<H", data, pos)
        # header CRC16 = low 16 bits of CRC-32 over the header bytes
        if hcrc != _crc32(data[off:pos]) & 0xFFFF:
            raise DataError("gzip header CRC mismatch")
        pos += 2
    if pos > len(data):
        raise UnexpectedEof("gzip header overruns input")
    return pos


def decompress_member_prefix(data: bytes, off: int = 0) -> tuple[bytes, int]:
    """Decode one gzip member starting at `off`; returns (plaintext,
    offset just past the member's trailer). Used by the streaming decode
    facade (member granularity)."""
    pos = _parse_header(data, off)
    plain, consumed = deflate.decompress_prefix(data[pos:])
    tpos = pos + consumed
    if len(data) - tpos < 8:
        raise UnexpectedEof("gzip trailer truncated")
    crc, isize = struct.unpack_from("<II", data, tpos)
    if crc != _crc32(plain):
        raise DataError("gzip CRC mismatch")
    if isize != len(plain) & 0xFFFFFFFF:
        raise DataError("gzip ISIZE mismatch")
    return plain, tpos + 8


def decompress(data: bytes) -> bytes:
    out = bytearray()
    off = 0
    while off < len(data):
        plain, off = decompress_member_prefix(data, off)
        out += plain
    if not out and len(data) == 0:
        raise UnexpectedEof("empty gzip input")
    return bytes(out)


def compress_many(datas, level: int = 6, backend: str = "auto",
                  mtime: int = 0) -> list[bytes]:
    """Batched gzip: device-batched DEFLATE bodies + per-buffer framing."""
    bodies = deflate.compress_many(datas, level=level, backend=backend)
    out = []
    header = header_bytes(level, mtime)
    for d, body in zip(datas, bodies):
        trailer = struct.pack("<II", _crc32(d), len(d) & 0xFFFFFFFF)
        out.append(header + body + trailer)
    return out
