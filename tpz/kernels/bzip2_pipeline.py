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
    return compress_many([data], level)[0]


def compress_many(datas, level: int = 9) -> list[bytes]:
    """Batched bzip2 encode: ALL buffers' 900k blocks share one device BWT
    invocation (amortizes the per-dispatch relay cost — VERDICT r1 #4),
    then per-buffer host coding/framing."""
    from tpz import oracle
    from tpz.kernels.bwt import bwt_blocks

    results = [None] * len(datas)
    metas = []  # (result idx, off, ln, crc, nb)
    all_blocks = []
    all_lens = []
    for i, d in enumerate(datas):
        if len(d) == 0:
            results[i] = oracle.bzip2_encode(b"", level)
            continue
        rle, off, ln, crc = oracle.bzip2_rle1(d, level)
        metas.append((i, ln, crc, len(all_blocks)))
        for b in range(off.size):
            all_blocks.append(rle[off[b] : off[b] + ln[b]])
            all_lens.append(int(ln[b]))
    if not all_blocks:
        return results
    NB = len(all_blocks)
    N = _bucket(max(all_lens))
    blocks = np.zeros((NB, N), dtype=np.uint8)
    for b, blk in enumerate(all_blocks):
        blocks[b, : len(blk)] = blk
    last, orig = bwt_blocks(blocks, np.asarray(all_lens, np.int64))
    for i, ln, crc, b0 in metas:
        nb = ln.size
        flat = np.zeros(int(ln.sum()), dtype=np.uint8)
        pos = 0
        off2 = np.zeros(nb, dtype=np.int64)
        for b in range(nb):
            off2[b] = pos
            flat[pos : pos + ln[b]] = last[b0 + b, : ln[b]]
            pos += int(ln[b])
        results[i] = oracle.bzip2_assemble(
            flat, off2, ln, crc, orig[b0 : b0 + nb].astype(np.uint32),
            level)
    return results


def ibwt_blocks(last: np.ndarray, lengths: np.ndarray,
                origs: np.ndarray) -> np.ndarray:
    """Device inverse BWT via pointer doubling (SURVEY.md §7.5, VERDICT r1
    #4): per block, the next[] permutation comes from one stable sort of
    (byte, index) keys; the n-step serial walk becomes log2(n) rounds of
    distance-doubling to the origin pointer's cycle break.

    last: [NB, N] uint8 last columns (padded); lengths [NB]; origs [NB].
    Returns [NB, N] uint8 iBWT output rows (padding undefined).
    """
    import jax
    import jax.numpy as jnp

    NB, N = last.shape
    rounds = max(1, (N - 1).bit_length())

    @jax.jit
    def run(lastj, length, orig):
        idx = jax.lax.broadcasted_iota(jnp.int32, (NB, N), 1)
        li = lastj.astype(jnp.int32)
        key = (li << 21) | idx  # N <= 2^21 (900k blocks); stable by idx
        key = jnp.where(idx < length[:, None], key, jnp.int32(0x7FFFFFFF))
        tvec = jax.lax.sort(key, dimension=1) & ((1 << 21) - 1)
        # Distance to orig along the cycle, with a self-loop break there.
        at_orig = idx == orig[:, None]
        d = jnp.where(at_orig, 0, 1)
        s = jnp.where(at_orig, idx, tvec)
        for _ in range(rounds):
            d = d + jnp.take_along_axis(d, s, axis=1)
            d = jnp.where(at_orig, 0, d)
            s = jnp.take_along_axis(s, s, axis=1)
        rank = length[:, None] - 1 - d  # orig is the walk's last element
        nbi = jax.lax.broadcasted_iota(jnp.int32, (NB, N), 0)
        out = jnp.zeros((NB, N), jnp.uint8)
        live = idx < length[:, None]
        out = out.at[nbi, jnp.where(live, rank, 0)].max(
            jnp.where(live, lastj, 0), mode="drop")
        return out

    from tpz.kernels.device_quirks import fetch

    return np.asarray(fetch(run(
        jnp.asarray(last), jnp.asarray(lengths.astype(np.int32)),
        jnp.asarray(origs.astype(np.int32)))))


def decompress(data: bytes) -> bytes | None:
    """Device decode: host Huffman/MTF/RLE2 inverse to last columns (the
    bit-serial 1%-of-work stages), device iBWT (the dominant stage), host
    RLE1 inverse + CRC checks. Returns None when the stream shape isn't
    supported (caller falls back to the serial oracle)."""
    from tpz import oracle

    scan = oracle.bzip2_scan_to_last(data)
    if scan is None:
        return None
    blob, offs, lens, origs, crcs = scan
    nb = len(offs)
    if nb == 0:
        return b""
    N = _bucket(int(lens.max()))
    last = np.zeros((nb, N), np.uint8)
    for b in range(nb):
        last[b, : lens[b]] = blob[offs[b] : offs[b] + lens[b]]
    out_rows = ibwt_blocks(last, lens, origs)
    flat = np.zeros(int(lens.sum()), np.uint8)
    pos = 0
    offs2 = np.zeros(nb, np.int64)
    for b in range(nb):
        offs2[b] = pos
        flat[pos : pos + lens[b]] = out_rows[b, : lens[b]]
        pos += int(lens[b])
    return oracle.bzip2_rle1_inverse(flat, offs2, lens, crcs)
