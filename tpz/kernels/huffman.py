"""Huffman table construction + device histogram.

Parity: reference crate src/huffman/ (cano_huff_table, [MED] SURVEY.md
§2.1). Package-merge here is a line-for-line twin of cpp/huffman.cc
(same item ordering and tie-breaks: weight, leaves-before-packages, lowest
symbol) so device-pipeline tables match the oracle's bit-for-bit; the
differential test lives in tests/test_kernels_huffman.py.

Table building is host-side in v1 (tables are tiny; SURVEY.md §7 hard part
3 allows this); histograms are computed on device.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def package_merge_np(freqs: np.ndarray, limit: int) -> np.ndarray:
    """Length-limited Huffman code lengths via package-merge.

    Twin of cpp/huffman.cc PackageMergeLengths — keep in sync.
    """
    nsyms = len(freqs)
    lengths = np.zeros(nsyms, dtype=np.uint8)
    active = np.nonzero(freqs)[0]
    n = len(active)
    if n == 0:
        return lengths
    if n == 1:
        lengths[active[0]] = 1
        return lengths
    if n > (1 << limit):
        raise ValueError("alphabet too large for length limit")

    # Item: (weight, is_package, min_sym, leaves)
    leaves = sorted(
        [(int(freqs[s]), False, int(s), (int(s),)) for s in active],
        key=lambda it: (it[0], it[1], it[2]),
    )
    prev = list(leaves)
    for _level in range(1, limit):
        packages = []
        for k in range(0, len(prev) - 1, 2):
            a, b = prev[k], prev[k + 1]
            packages.append(
                (a[0] + b[0], True, min(a[2], b[2]), a[3] + b[3])
            )
        merged = []
        li, pi = 0, 0
        keyf = lambda it: (it[0], it[1], it[2])
        while li < len(leaves) and pi < len(packages):
            if keyf(leaves[li]) <= keyf(packages[pi]):
                merged.append(leaves[li]); li += 1
            else:
                merged.append(packages[pi]); pi += 1
        merged.extend(leaves[li:])
        merged.extend(packages[pi:])
        prev = merged

    for item in prev[: 2 * (n - 1)]:
        for sym in item[3]:
            lengths[sym] += 1
    return lengths


def canonical_codes_np(lengths: np.ndarray) -> np.ndarray:
    """RFC 1951 §3.2.2 canonical code assignment (MSB-first code values)."""
    lengths = np.asarray(lengths, dtype=np.int32)
    max_len = int(lengths.max(initial=0))
    codes = np.zeros(len(lengths), dtype=np.uint32)
    if max_len == 0:
        return codes
    count = np.bincount(lengths, minlength=max_len + 1)
    count[0] = 0
    next_code = np.zeros(max_len + 1, dtype=np.uint32)
    code = 0
    for ln in range(1, max_len + 1):
        code = (code + count[ln - 1]) << 1
        next_code[ln] = code
    for i in range(len(lengths)):
        ln = lengths[i]
        if ln:
            codes[i] = next_code[ln]
            next_code[ln] += 1
    return codes


def reverse_bits_np(codes: np.ndarray, lengths: np.ndarray) -> np.ndarray:
    """Bit-reverse each code within its length (for LSB-first packing)."""
    out = np.zeros_like(codes)
    for i in range(len(codes)):
        c, ln = int(codes[i]), int(lengths[i])
        r = 0
        for _ in range(ln):
            r = (r << 1) | (c & 1)
            c >>= 1
        out[i] = r
    return out


@functools.partial(jax.jit, static_argnames=("nsyms",))
def histogram(syms: jax.Array, valid: jax.Array, nsyms: int) -> jax.Array:
    """Per-block histogram: syms [B, S] int32, valid [B, S] bool ->
    [B, nsyms] int32 counts (device scatter-add)."""
    B, S = syms.shape
    clipped = jnp.clip(syms, 0, nsyms - 1)
    upd = valid.astype(jnp.int32)
    out = jnp.zeros((B, nsyms), jnp.int32)
    bidx = jax.lax.broadcasted_iota(jnp.int32, (B, S), 0)
    return out.at[bidx, clipped].add(upd)
