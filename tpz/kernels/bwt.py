"""Burrows-Wheeler transform on device (SURVEY.md §2.1 BZip2 row: "BWT via
prefix-doubling radix sort"; §7 PR4).

bzip2 sorts ROTATIONS. Sorting rotations of s equals sorting the first-n
suffixes of s·s compared to depth n, so the kernel runs NON-cyclic
prefix-doubling over the doubled string — every shifted-rank lookup is a
plain vector shift instead of a mod-n gather. Per round: one 3-key batched
radix sort + diff/cumsum + one scatter. Ties (identical rotations of
periodic inputs) break by rotation index, matching cpp/bzip2.cc BwtEncode
exactly, so (last column, origin pointer) are bit-identical to the oracle.

Blocks are padded to a static bucket size N (post-RLE1 block <= 900000);
pad cells carry +inf keys and never influence real ranks.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

INF = np.int32(2**31 - 1)


@functools.partial(jax.jit, static_argnames=("rounds",))
def _bwt_batched(d2: jax.Array, n: jax.Array, rounds: int):
    """d2: [NB, 2N] int32 — doubled blocks (s·s then zeros); n: [NB] int32
    real lengths. Returns (last [NB, N], orig [NB])."""
    NB, N2 = d2.shape
    N = N2 // 2
    idx = jax.lax.broadcasted_iota(jnp.int32, (NB, N2), 1)
    nbidx = jax.lax.broadcasted_iota(jnp.int32, (NB, N2), 0)
    live = idx < 2 * n[:, None]

    def assign_ranks(k1, k2):
        sk1, sk2, sidx = jax.lax.sort((k1, k2, idx), dimension=1, num_keys=3)
        diff = (sk1 != jnp.roll(sk1, 1, axis=1)) | (sk2 != jnp.roll(sk2, 1, axis=1))
        diff = diff.at[:, 0].set(True)
        ranks_sorted = jnp.cumsum(diff.astype(jnp.int32), axis=1)
        out = jnp.zeros((NB, N2), jnp.int32)
        return out.at[nbidx, sidx].set(ranks_sorted)

    def all_distinct(r):
        # Live entries sort before the shared INF pad rank, so all live
        # ranks are distinct iff the max live rank equals the live count.
        mx = jnp.max(jnp.where(live, r, 0), axis=1)
        return jnp.all(mx >= 2 * n)

    # Depth-1 initial ranks. (A 4-byte-word init would overrun live tails
    # near 2n and flip the ended-suffix ordering that makes periodic ties
    # break by index — keep byte granularity; the early-exit loop below is
    # where the time goes anyway.)
    r = assign_ranks(jnp.where(live, d2, INF), jnp.zeros_like(d2))

    def cond(carry):
        r, k, i = carry
        return (i < rounds) & ~all_distinct(r)

    def body(carry):
        r, k, i = carry
        shifted_full = jnp.roll(r, -k, axis=1)
        col_ok = idx + k < N2
        # Beyond-2n reads land on the shared pad rank, which sorts after
        # every live rank — exactly the "ended suffix sorts last" rule that
        # matches cpp BwtEncode's index tie-break on periodic inputs.
        shifted = jnp.where(col_ok, shifted_full, INF)
        r2 = assign_ranks(jnp.where(live, r, INF),
                          jnp.where(live, shifted, INF))
        return r2, jnp.minimum(k * 2, N2), i + 1

    r, _, _ = jax.lax.while_loop(cond, body, (r, jnp.int32(1), jnp.int32(0)))

    # Final order: rotations = positions < n ordered by (rank, idx).
    rot_key = jnp.where(idx < n[:, None], r, INF)
    _, sidx = jax.lax.sort((rot_key, idx), dimension=1, num_keys=2)
    sa = sidx[:, :N]  # first N entries; entries >= n[b] are pad
    # last[i] = s[(sa[i] + n - 1) mod n] = d2[sa[i] + n - 1]
    nbN = jax.lax.broadcasted_iota(jnp.int32, (NB, N), 0)
    gather_idx = jnp.clip(sa + n[:, None] - 1, 0, N2 - 1)
    last = d2[nbN, gather_idx]
    orig = jnp.argmax((sa == 0).astype(jnp.int32), axis=1).astype(jnp.int32)
    return last, orig


def bwt_blocks(blocks: np.ndarray, lengths: np.ndarray):
    """blocks: [NB, N] uint8 (zero-padded); lengths: [NB]. Returns
    (last [NB, N] uint8, orig [NB] int) computed on device."""
    from tpz.kernels.device_quirks import fetch

    NB, N = blocks.shape
    d = blocks.astype(np.int32)
    n = lengths.astype(np.int32)
    # Doubled string: d2[i] = s[i mod n] for i < 2n (second copy via roll).
    d_pad = np.zeros((NB, 2 * N), np.int32)
    d_pad[:, :N] = d
    for b in range(NB):
        d_pad[b, n[b]:2 * n[b]] = d[b, :n[b]]
    rounds = max(1, (N - 1).bit_length())  # static: depth 2^rounds >= N >= n
    last, orig = _bwt_batched(jnp.asarray(d_pad), jnp.asarray(n), rounds)
    return fetch(last).astype(np.uint8), fetch(orig)
