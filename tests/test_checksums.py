"""Checksum kernels vs stdlib zlib (gzip CRC-32, Adler-32) and a table-driven
reference for the bzip2 CRC-32 variant."""

import zlib

import numpy as np
import pytest

from tpz.constants import CRC32_TABLE_MSB
from tpz.kernels.checksums import adler32, crc32, crc32_combine
from tpz.utils import corpus


def bzip2_crc_ref(data: bytes) -> int:
    s = 0xFFFFFFFF
    for b in data:
        s = ((s << 8) & 0xFFFFFFFF) ^ int(CRC32_TABLE_MSB[((s >> 24) ^ b) & 0xFF])
    return s ^ 0xFFFFFFFF


CASES = [
    b"",
    b"a",
    b"hello world",
    bytes(range(256)),
    corpus.text(1000),
    corpus.random_bytes(4096),
    corpus.text(100_000),
    corpus.random_bytes(1 << 17),
    corpus.repetitive(77_777),
]


@pytest.mark.parametrize("data", CASES, ids=range(len(CASES)))
def test_crc32_reflected_matches_zlib(data):
    assert crc32(data, "reflected") == zlib.crc32(data)


@pytest.mark.parametrize("data", CASES, ids=range(len(CASES)))
def test_crc32_reflected_device_path(data):
    if len(data) == 0:
        return
    assert crc32(data, "reflected", use_device=True) == zlib.crc32(data)


@pytest.mark.parametrize("data", CASES[:6], ids=range(6))
def test_crc32_msb(data):
    assert crc32(data, "msb") == bzip2_crc_ref(data)
    if data:
        assert crc32(data, "msb", use_device=True) == bzip2_crc_ref(data)


@pytest.mark.parametrize("data", CASES, ids=range(len(CASES)))
def test_adler32_matches_zlib(data):
    assert adler32(data) == zlib.adler32(data)
    if data:
        assert adler32(data, use_device=True) == zlib.adler32(data)


def test_crc32_combine():
    a = corpus.text(5000)
    b = corpus.random_bytes(7001)
    combined = crc32_combine(zlib.crc32(a), zlib.crc32(b), len(b))
    assert combined == zlib.crc32(a + b)


def test_crc32_combine_msb():
    a = corpus.text(300)
    b = corpus.random_bytes(501)
    combined = crc32_combine(
        bzip2_crc_ref(a), bzip2_crc_ref(b), len(b), variant="msb"
    )
    assert combined == bzip2_crc_ref(a + b)


def test_crc32_odd_sizes_device():
    for n in [16384, 16385, 65535, 65536, 65537]:
        data = corpus.random_bytes(n, seed=n)
        assert crc32(data, "reflected", use_device=True) == zlib.crc32(data)
