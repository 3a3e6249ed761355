"""TPU DEFLATE encode pipeline — device tokenize/histogram/bitpack with
host (C++) table planning.

Stage structure (SURVEY.md §3.1 boundaries):
  stage1 (device, one jit): haloed block batch -> best matches (sort-based
      candidates + rank LCP, tpz/kernels/matchfinder.py) -> greedy parse
      (pointer doubling, tpz/kernels/parse.py) -> per-block symbol
      histograms.
  plan   (host, C++): cpp DeflatePlan — block types, canonical tables
      (bit-reversed), every header bit pre-placed at its absolute offset.
  stage2 (device, one jit): token slots -> prefix-sum offsets -> global
      scatter bitpack (tpz/kernels/bitpack.py).
  merge  (host): OR device body words with the C++ header stream.

Byte-identical to cpp DeflateEncode with the same profile (greedy,
max_chain=K): both implement "parse spec v1" and share the C++ planner.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from tpz.kernels import bitpack
from tpz.kernels.device_quirks import fetch, fetch_many
from tpz.kernels.matchfinder import (
    BLOCK,
    FWD_PAD,
    M_TOTAL,
    WINDOW,
    find_matches,
)
from tpz.kernels.parse import greedy_parse

MAX_SPAN = 1 << 28  # single-batch limit for int32 bit offsets


def usable() -> bool:
    import os

    if os.environ.get("TPZ_FORCE_ORACLE"):
        return False  # e.g. the ASan CI pass: jaxlib is not sanitizer-clean
    try:
        from tpz import oracle

        if not oracle.available():
            return False
        jax.devices()  # raises if the backend cannot initialize
        return True
    except Exception:
        return False


@jax.jit
def _make_blocks(span_u8: jax.Array):
    """span_u8: [WINDOW + nb*BLOCK + FWD_PAD] uint8 (leading WINDOW and
    trailing FWD_PAD are zero padding). Builds the haloed [nb, M_TOTAL]
    int32 block matrix with pure reshapes/slices — no gathers, and the
    only HBM blow-up is the 1.5x halo overlap (+int32 width).

    Relies on WINDOW == BLOCK/2 and FWD_PAD <= BLOCK."""
    nb = (span_u8.shape[0] - WINDOW - FWD_PAD) // BLOCK
    base = span_u8[WINDOW:WINDOW + nb * BLOCK].reshape(nb, BLOCK)
    prev_tail = jnp.concatenate(
        [jnp.zeros((1, WINDOW), span_u8.dtype), base[:-1, BLOCK - WINDOW:]],
        axis=0)
    next_head = jnp.concatenate(
        [base[1:, :FWD_PAD], jnp.zeros((1, FWD_PAD), span_u8.dtype)], axis=0)
    return jnp.concatenate([prev_tail, base, next_head],
                           axis=1).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("k", "use_pallas"))
def _stage1(blocks: jax.Array, span_off: jax.Array, span_len: jax.Array,
            block_len: jax.Array, k: int, use_pallas: bool = False):
    """blocks: [NB, M_TOTAL] int32 haloed data."""
    NB = blocks.shape[0]
    if use_pallas:
        # Fused path: screening in XLA, then parse+extension in one Pallas
        # walk — skips the rank-array sorts and per-position LCP gathers
        # entirely (only ~1 in 5 positions is a token, and only tokens
        # need extension).
        from tpz.kernels.matchfinder import screen_candidates
        from tpz.kernels.parse import parse_extend_pallas

        bj, bs, words, _ = screen_candidates(
            blocks, span_off, span_len, k, WINDOW, BLOCK, 258)
        words_i32 = jax.lax.bitcast_convert_type(words, jnp.int32)
        reach, mlen = parse_extend_pallas(
            bs[:, WINDOW:WINDOW + BLOCK], bj[:, WINDOW:WINDOW + BLOCK],
            words_i32, block_len[:, None], WINDOW)
        pos = jax.lax.broadcasted_iota(jnp.int32, (NB, BLOCK), 1)
        is_token = (reach > 0) & (pos < block_len[:, None])
        mdist = jnp.where(mlen > 0,
                          pos + WINDOW - bj[:, WINDOW:WINDOW + BLOCK], 0)
        cum = jnp.cumsum(is_token.astype(jnp.int32), axis=1)
        ntokens = cum[:, -1]
    else:
        mlen, mdist = find_matches(blocks, span_off, span_len, k=k)
        is_token, token_idx, ntokens = greedy_parse(mlen, mdist, block_len,
                                                    use_pallas=False)

    data_block = blocks[:, WINDOW:WINDOW + BLOCK]
    is_match = is_token & (mlen > 0)
    lsym, _, _ = bitpack.length_symbol(jnp.clip(mlen, 0, 258))
    lit_sym = jnp.where(is_match, lsym, data_block)
    dsym, _, _ = bitpack.dist_symbol(jnp.maximum(mdist, 1))

    NB = blocks.shape[0]
    bidx = jax.lax.broadcasted_iota(jnp.int32, (NB, BLOCK), 0)
    lit_hist = jnp.zeros((NB, 288), jnp.int32).at[
        bidx, jnp.clip(lit_sym, 0, 287)].add(is_token.astype(jnp.int32))
    dist_hist = jnp.zeros((NB, 30), jnp.int32).at[
        bidx, jnp.clip(dsym, 0, 29)].add(is_match.astype(jnp.int32))
    return mlen, mdist, is_token, lit_hist, dist_hist, ntokens


@functools.partial(jax.jit, static_argnames=("total_words",))
def _stage2(blocks, is_token, mlen, mdist, lit_cl, dist_cl,
            eob_val, eob_n, body_off, btype, block_len,
            chunk1_off, total_words: int):
    data_block = blocks[:, WINDOW:WINDOW + BLOCK]
    vals, nbits = bitpack.token_slots(
        data_block, is_token, mlen, mdist, lit_cl, dist_cl)
    return bitpack.assemble_stream(
        vals, nbits, eob_val, eob_n, body_off, btype, data_block, block_len,
        chunk1_off, total_words)


def compress(data: bytes, cfg=None) -> bytes:
    """Device-pipeline raw DEFLATE encode (greedy/TPU profile)."""
    from tpz import oracle

    n = len(data)
    k = 16 if cfg is None else cfg.max_chain
    if n == 0:
        return oracle.deflate_encode(b"")
    if n > MAX_SPAN:
        raise ValueError("span too large for single-batch device encode")

    nb = (n + BLOCK - 1) // BLOCK
    arr = np.frombuffer(memoryview(data), dtype=np.uint8)
    span = np.zeros(WINDOW + nb * BLOCK + FWD_PAD, dtype=np.uint8)
    span[WINDOW:WINDOW + n] = arr
    blocks = _make_blocks(jnp.asarray(span))
    span_off = jnp.asarray((np.arange(nb) * BLOCK).astype(np.int32))
    block_len_np = np.minimum(n - np.arange(nb) * BLOCK, BLOCK).astype(np.int32)
    block_len = jnp.asarray(block_len_np)

    use_pallas = jax.default_backend() == "tpu"
    mlen, mdist, is_token, lit_hist, dist_hist, ntokens = _stage1(
        blocks, span_off, jnp.int32(n), block_len, k, use_pallas)

    lit_hist_np, dist_hist_np = (a.astype(np.uint32)
                                 for a in fetch_many(lit_hist, dist_hist))
    lit_hist_np[:, 256] = 0

    plan = oracle.deflate_plan(lit_hist_np, dist_hist_np,
                               block_len_np.astype(np.int64))
    total_bits = plan["total_bits"]
    total_words = (total_bits + 31) // 32 or 1

    eob_val = plan["lit_code"][:, 256].astype(np.uint32)
    eob_n = plan["lit_len"][:, 256].astype(np.int32)

    lit_cl = (plan["lit_code"].astype(np.int32)
              | (plan["lit_len"].astype(np.int32) << 16))
    dist_cl = (plan["dist_code"].astype(np.int32)
               | (plan["dist_len"].astype(np.int32) << 16))
    words = _stage2(
        blocks, is_token, mlen, mdist,
        jnp.asarray(lit_cl), jnp.asarray(dist_cl),
        jnp.asarray(eob_val), jnp.asarray(eob_n),
        jnp.asarray(plan["body_off"].astype(np.int32)),
        jnp.asarray(plan["btype"]),
        block_len,
        jnp.asarray(plan["chunk1_off"].astype(np.int32)),
        total_words,
    )
    body = fetch(words).view(np.uint8)  # little-endian u32 -> LSB-first bytes

    total_bytes = (total_bits + 7) // 8
    out = plan["header"][:total_bytes].copy()
    out |= body[:total_bytes]
    return out.tobytes()
