"""TPU BZip2 encode pipeline (SURVEY.md §2.1 BZip2 row, §7 PR4).

Split (v1): host C++ RLE1 + block split (byte-serial, memory-speed) ->
device batched BWT (tpz/kernels/bwt.py — the stage that dominates CPU
encoders) -> host C++ MTF/RLE2/multi-table Huffman coding. Byte-identical
to the oracle's Bzip2Encode because the C++ coder is shared and the device
BWT matches BwtEncode bit-for-bit (deterministic tie-breaks).

Blocks are padded to a power-of-two bucket so jit caches stay small.
"""

from __future__ import annotations

import numpy as np


def usable() -> bool:
    from tpz.kernels.deflate_pipeline import usable as _u

    return _u()


def _bucket(n: int) -> int:
    b = 1 << max(13, (n - 1).bit_length())
    return b


def compress(data: bytes, level: int = 9) -> bytes:
    from tpz import oracle
    from tpz.kernels.bwt import bwt_blocks

    if len(data) == 0:
        return oracle.bzip2_encode(b"", level)
    rle, off, ln, crc = oracle.bzip2_rle1(data, level)
    nb = off.size
    N = _bucket(int(ln.max()))
    blocks = np.zeros((nb, N), dtype=np.uint8)
    for b in range(nb):
        blocks[b, : ln[b]] = rle[off[b] : off[b] + ln[b]]
    last, orig = bwt_blocks(blocks, ln)
    # Re-flatten per-block last columns at the original offsets.
    flat = np.zeros(int(ln.sum()), dtype=np.uint8)
    pos = 0
    off2 = np.zeros(nb, dtype=np.int64)
    for b in range(nb):
        off2[b] = pos
        flat[pos : pos + ln[b]] = last[b, : ln[b]]
        pos += int(ln[b])
    return oracle.bzip2_assemble(flat, off2, ln, crc, orig.astype(np.uint32),
                                 level)
