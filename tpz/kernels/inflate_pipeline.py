"""Device-parallel DEFLATE decode (VERDICT r1 #2; SURVEY.md §7 hard parts
4-5, §3.5).

DEFLATE decode is bit-serial, so device parallelism needs block
boundaries. tpz's encoder publishes them: every gzip member carries a
'TZ' FEXTRA side-car (RFC-conformant, ignored by other decoders) listing
each 64 KiB block's end bit and output length. With the index:

  host   InflateScanHeaders (cpp/deflate.cc): parse ONLY the block
         headers — O(tables), no symbol scan — producing flat 2^15-entry
         decode tables, body bit offsets and stored-chunk layout.
  device ONE jit: a Pallas walk Huffman-decodes every block's symbol
         stream in parallel (tables + stream slice resident in VMEM),
         writing a (kind, dist, len/byte) marker at each token's OUTPUT
         position; stored blocks gather their bytes directly; match
         resolution is pointer doubling over the whole output span
         (log-depth rounds, SURVEY.md §7.5 technique applied to LZ77).
  host   fetch plaintext; the gzip layer verifies CRC32/ISIZE as usual.

Streams WITHOUT the side-car — foreign gzip/zlib, raw deflate, and
tpz's own >MAX_DEVICE_SPAN oracle output — take route 2 (round 3): the
host segment indexer (cpp InflateIndex, index_stream below) token-walks
the stream once at memory speed, cutting 64 KiB-output segments at
token and block-table boundaries with split-match carries; the same
fused device program then decodes every segment in parallel
(decompress_many_segmented). The C++ host path remains the conformance
reference and the fallback for declined shapes.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
import numpy as np

from tpz import constants as C
from tpz.errors import DataError
from tpz.kernels.device_quirks import fetch

BLOCK = 65536
# Per-block stream slice: encoder blocks need ~64k+header; FOREIGN
# segments (inflate_index route) may expand a few KiB past 64k inside a
# huffman block before producers fall back to stored, so carry margin.
SLICE_BYTES = BLOCK + 8192

# marker layout: kind << 28 | payload
_KIND_LIT = 1                    # payload = byte
_KIND_MATCH = 2                  # payload = dist << 9 | len


STREAM_WIN = 4096  # words; per-chain sliding SMEM window over the slice


def _symbol_walk(stream_words, body_bit_local, out_len, tab,
                 len_base, len_extra, dist_base, dist_extra,
                 start_pos=None, interpret=False, nblk: int = 8):
    """Per-block Huffman symbol decode — nblk interleaved block chains per
    kernel body (the v3w/v3y walk pattern: straight-line, no lax.cond,
    unconditional row store; independent chains hide dependent-read
    latency, BASELINE.md).

    One token consumes at most 15+5+15+13 = 48 bits, so a single 3-word
    stream window read per token serves every bit peek as pure shifts.

    Round 4 (bench/probe_extract.py on this chip): EVERY dynamic read is
    an SMEM scalar load (8.8 ns, ~0 VPU issue slots — vs the 28.3 ns,
    ~17-slot VMEM row-load+lane-select). The stream rides a per-chain
    sliding window (bitpos is monotone; conditional DMA refill every
    ~4k words), and the decode tables use the two-level layout the C++
    scan now emits (tpz/constants.py INFLATE_*): 10-bit L1 + 32-entry
    L2 chunks, 28 KiB per block fused [lit L1|lit L2|dist L1|dist L2],
    DMA'd whole per grid step. Mask replication is baked into the
    tables, so no per-block peek mask is needed.

    stream_words: [NB, SW] int32 (LE u32 of the block's stream slice)
    body_bit_local: [NB] int32 bit offset of the symbol stream within the
    slice; out_len: [NB] int32 (0 for stored blocks -> no walk);
    tab: [NB, INFLATE_LIT_TW + INFLATE_DIST_TW] int32 fused tables;
    len_base[29], len_extra[29], dist_base[30], dist_extra[30] (SMEM).
    Returns markers [NB, BLOCK] int32.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    NB, SW = stream_words.shape
    assert BLOCK % 128 == 0
    r_o = BLOCK // 128
    # Mosaic DMA rule measured on this chip (bench/probe_dma_align3.py,
    # 2026-08-20): 1-D HBM slices must cover WHOLE (8,128) tiles — both
    # the offset and the length must be multiples of 1024 words; and the
    # SMEM destination must be a flat 1-D slice (2-D row slices are
    # rejected regardless of src). Pad the per-chain strides to 1024.
    if SW % 1024:
        stream_words = jnp.concatenate(
            [stream_words,
             jnp.zeros((NB, 1024 - SW % 1024), stream_words.dtype)], axis=1)
        SW = stream_words.shape[1]
    TW = tab.shape[1]
    if TW % 1024:
        tab = jnp.concatenate(
            [tab, jnp.zeros((NB, 1024 - TW % 1024), tab.dtype)], axis=1)
        TW = tab.shape[1]
    SWIN = min(STREAM_WIN, SW)
    L1B = C.INFLATE_L1_BITS
    L1M = (1 << L1B) - 1
    OLIT2 = 1 << L1B
    ODIST1 = C.INFLATE_LIT_TW
    ODIST2 = ODIST1 + (1 << L1B)
    if start_pos is None:
        start_pos = jnp.zeros((NB,), jnp.int32)
    import os as _os2

    if _os2.environ.get("TPZ_INFLATE_WALK") == "vz":
        # Round-5 lane-parallel XLA walk (segments in vector lanes) —
        # identical markers; also the Mosaic-free fallback should a
        # Pallas walk ever regress on chip again. Trace-time env read:
        # A/B runs must use separate processes (jit caches by shape).
        return _symbol_walk_vz(stream_words, body_bit_local, out_len,
                               tab, len_base, len_extra, dist_base,
                               dist_extra, start_pos)
    NBp = -(-NB // nblk) * nblk
    if NBp != NB:
        pad = NBp - NB

        def padz(x, cols):
            return jnp.concatenate(
                [x, jnp.zeros((pad, cols), x.dtype)], axis=0)

        stream_words = padz(stream_words, SW)
        tab = padz(tab, TW)
        zpad = jnp.zeros((pad,), jnp.int32)
        body_bit_local = jnp.concatenate([body_bit_local, zpad])
        out_len = jnp.concatenate([out_len, zpad])
        start_pos = jnp.concatenate([start_pos, zpad])

    def kernel(bb_ref, ol_ref, sp_ref, lb_ref, le_ref,
               db_ref, de_ref, s_hbm, t_hbm, out_ref, s_win, t_ref,
               sbase_ref, dma_sem):
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
        out_ref[...] = jnp.zeros_like(out_ref)
        g = pl.program_id(0)
        zero = jnp.int32(0)
        one31 = jnp.int32(31)
        # s_hbm / t_hbm arrive FLAT (1-D): Mosaic only accepts 1-D DMA
        # slices covering whole (8,128) tiles — 1024-word-aligned offset
        # AND length — into flat 1-D SMEM slices (probe_dma_align3/4 on
        # this chip, 2026-08-20; the round-4 2-D row form and the first
        # round-5 128-aligned flat form both fail compilation).
        for c in range(nblk):
            cpt = pltpu.make_async_copy(
                t_hbm.at[pl.ds((g * nblk + c) * TW, TW)],
                t_ref.at[pl.ds(c * TW, TW)], dma_sem)
            cpt.start()
            cpt.wait()
            cps = pltpu.make_async_copy(
                s_hbm.at[pl.ds((g * nblk + c) * SW, SWIN)],
                s_win.at[pl.ds(c * SWIN, SWIN)], dma_sem)
            cps.start()
            cps.wait()
            sbase_ref[c] = 0

        outls = [ol_ref[g * nblk + c] for c in range(nblk)]

        def srl(x, s):
            return jax.lax.shift_right_logical(x, s)

        def step_chain(c, st):
            bitpos, out_pos, ro, orow, ok = st
            act = ok & (out_pos < outls[c])

            w = bitpos >> 5
            sh = bitpos & 31
            wc = jnp.minimum(w, jnp.int32(SW - 3))
            need = act & ((wc + 2 - sbase_ref[c]) >= jnp.int32(SWIN - 1))

            @pl.when(need)
            def _():
                # Tile-aligned window base (1024 words; <=1023 words of
                # forward coverage lost, absorbed by the refill margin).
                # MUST be `(x >> 10) * 1024`, not shifts both ways:
                # Mosaic's divisibility analysis proves mul-by-1024 but
                # not shift-left-by-10 (on-chip error: "Failed to prove
                # that a tile index ... is divisible by the tiling").
                nb = jax.lax.shift_right_logical(
                    jnp.minimum(wc, jnp.int32(SW - SWIN)), 10) * 1024
                cpw = pltpu.make_async_copy(
                    s_hbm.at[pl.ds((g * nblk + c) * SW + nb, SWIN)],
                    s_win.at[pl.ds(c * SWIN, SWIN)], dma_sem)
                cpw.start()
                cpw.wait()
                sbase_ref[c] = nb

            woff = c * SWIN + jnp.clip(wc - sbase_ref[c], 0, SWIN - 3)
            w0 = s_win[woff]
            w1 = s_win[woff + 1]
            w2 = s_win[woff + 2]

            def bits_at(off, n):
                # n-bit window at bit sh+off of the 96-bit (w0,w1,w2)
                # window; off+n <= 48 and sh <= 31 keep it in range.
                b = sh + off
                wi = b >> 5
                s2 = b & 31
                lo = jnp.where(wi == 0, w0, jnp.where(wi == 1, w1, w2))
                hi = jnp.where(wi == 0, w1, jnp.where(wi == 1, w2, zero))
                v = srl(lo, s2) | jnp.where(
                    s2 > 0, jax.lax.shift_left(hi, (32 - s2) & one31), 0)
                return v & (srl(jnp.int32(-1), (32 - n) & one31)
                            & jnp.where(n > 0, -1, 0))

            peek = bits_at(zero, jnp.int32(15))
            tb = c * TW
            e1 = t_ref[tb + (peek & L1M)]
            esc1 = (e1 & 31) == 31
            e1b = t_ref[tb + OLIT2 + srl(e1, 5) + (srl(peek, L1B) & 31)]
            e = jnp.where(esc1, e1b, e1)
            clen = e & 31
            sym = e >> 5
            okn = ok & (clen > 0) & (sym != 256) & (sym <= 285)

            is_match = sym > 256
            li = jnp.clip(sym - 257, 0, 28)
            eb = le_ref[li]
            lval = lb_ref[li] + bits_at(clen, eb)
            pk = bits_at(clen + eb, jnp.int32(15))
            d1 = t_ref[tb + ODIST1 + (pk & L1M)]
            escd = (d1 & 31) == 31
            d1b = t_ref[tb + ODIST2 + srl(d1, 5) + (srl(pk, L1B) & 31)]
            e2 = jnp.where(escd, d1b, d1)
            dlen = e2 & 31
            ds = jnp.clip(e2 >> 5, 0, 29)
            okn = okn & (~is_match | (dlen > 0))
            deb = de_ref[ds]
            dval = db_ref[ds] + bits_at(clen + eb + dlen, deb)

            nbits = jnp.where(is_match, clen + eb + dlen + deb, clen)
            adv = jnp.where(is_match, lval, 1)
            mark = jnp.where(is_match,
                             (_KIND_MATCH << 28) | (dval << 9) | lval,
                             (_KIND_LIT << 28) | sym)
            mark = jnp.where(okn, mark, 0)
            adv = jnp.where(okn, adv, jnp.int32(BLOCK))  # corrupt: abort

            r1 = out_pos >> 7
            changed = act & (r1 != ro)
            orow_n = jnp.where(changed, jnp.zeros_like(orow), orow)
            orow_n = jnp.where(act & (lane == (out_pos & 127)), mark,
                               orow_n)
            ro_n = jnp.where(changed, r1, ro)
            out_ref[c, pl.ds(ro_n, 1), :] = orow_n
            bitpos_n = jnp.where(act, bitpos + nbits, bitpos)
            out_pos_n = jnp.where(act, out_pos + adv, out_pos)
            return (bitpos_n, out_pos_n, ro_n, orow_n,
                    jnp.where(act, okn, ok))

        def cond(states):
            alive = states[0][4] & (states[0][1] < outls[0])
            for c in range(1, nblk):
                alive = alive | (states[c][4] & (states[c][1] < outls[c]))
            return alive

        def body(states):
            return tuple(step_chain(c, states[c]) for c in range(nblk))

        init = tuple(
            (bb_ref[g * nblk + c], sp_ref[g * nblk + c],
             sp_ref[g * nblk + c] >> 7,
             jnp.zeros((1, 128), jnp.int32), True)
            for c in range(nblk))
        jax.lax.while_loop(cond, body, init)

    out = pl.pallas_call(
        kernel,
        grid=(NBp // nblk,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] * 7 + [
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((nblk, r_o, 128), lambda b: (b, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((NBp, r_o, 128), jnp.int32),
        scratch_shapes=[pltpu.SMEM((nblk * SWIN,), jnp.int32),
                        pltpu.SMEM((nblk * TW,), jnp.int32),
                        pltpu.SMEM((nblk,), jnp.int32),
                        pltpu.SemaphoreType.DMA],
        interpret=interpret,
    )(body_bit_local, out_len, start_pos, len_base,
      len_extra, dist_base, dist_extra,
      stream_words.reshape(-1), tab.reshape(-1))
    return out.reshape(NBp, BLOCK)[:NB]


def _symbol_walk_vz(stream_words, body_bit_local, out_len, tab,
                    len_base, len_extra, dist_base, dist_extra,
                    start_pos):
    """Lane-parallel XLA twin of the Pallas symbol walk: every segment
    advances one token per loop trip IN VECTOR LANES (~7 dynamic
    gathers + 1 scatter per trip over NB-wide vectors), so trip count is
    max-tokens-per-segment instead of sum/nblk. Marker-identical to the
    Pallas kernel (differential test in tests/test_inflate_pipeline.py);
    env-gated via TPZ_INFLATE_WALK=vz pending the chip A/B."""
    NB, SW = stream_words.shape
    TW = tab.shape[1]
    L1B = C.INFLATE_L1_BITS
    L1M = (1 << L1B) - 1
    OLIT2 = 1 << L1B
    ODIST1 = C.INFLATE_LIT_TW
    ODIST2 = ODIST1 + (1 << L1B)
    s_flat = stream_words.reshape(-1)
    t_flat = tab.reshape(-1)
    seg = jnp.arange(NB, dtype=jnp.int32)
    s_base = seg * jnp.int32(SW)
    t_base = seg * jnp.int32(TW)
    zero = jnp.zeros((NB,), jnp.int32)
    one31 = jnp.int32(31)

    def srl(x, s):
        return jax.lax.shift_right_logical(x, s)

    def body(c):
        bitpos, out_pos, ok, out = c
        act = ok & (out_pos < out_len)
        w = bitpos >> 5
        sh = bitpos & 31
        wc = jnp.minimum(w, jnp.int32(SW - 3))
        w0 = s_flat[s_base + wc]
        w1 = s_flat[s_base + wc + 1]
        w2 = s_flat[s_base + wc + 2]

        def bits_at(off, n):
            b = sh + off
            wi = b >> 5
            s2 = b & 31
            lo = jnp.where(wi == 0, w0, jnp.where(wi == 1, w1, w2))
            hi = jnp.where(wi == 0, w1, jnp.where(wi == 1, w2, 0))
            v = srl(lo, s2) | jnp.where(
                s2 > 0, jax.lax.shift_left(hi, (32 - s2) & one31), 0)
            return v & (srl(jnp.full_like(v, -1), (32 - n) & one31)
                        & jnp.where(n > 0, -1, 0))

        peek = bits_at(zero, jnp.full_like(zero, 15))
        e1 = t_flat[t_base + (peek & L1M)]
        esc1 = (e1 & 31) == 31
        e1b = t_flat[t_base + OLIT2 + srl(e1, 5) + (srl(peek, L1B) & 31)]
        e = jnp.where(esc1, e1b, e1)
        clen = e & 31
        sym = e >> 5
        okn = ok & (clen > 0) & (sym != 256) & (sym <= 285)

        is_match = sym > 256
        li = jnp.clip(sym - 257, 0, 28)
        eb = len_extra[li]
        lval = len_base[li] + bits_at(clen, eb)
        pk = bits_at(clen + eb, jnp.full_like(zero, 15))
        d1 = t_flat[t_base + ODIST1 + (pk & L1M)]
        escd = (d1 & 31) == 31
        d1b = t_flat[t_base + ODIST2 + srl(d1, 5) + (srl(pk, L1B) & 31)]
        e2 = jnp.where(escd, d1b, d1)
        dlen = e2 & 31
        ds = jnp.clip(e2 >> 5, 0, 29)
        okn = okn & (~is_match | (dlen > 0))
        deb = dist_extra[ds]
        dval = dist_base[ds] + bits_at(clen + eb + dlen, deb)

        nbits = jnp.where(is_match, clen + eb + dlen + deb, clen)
        adv = jnp.where(is_match, lval, 1)
        mark = jnp.where(is_match,
                         (_KIND_MATCH << 28) | (dval << 9) | lval,
                         (_KIND_LIT << 28) | sym)
        mark = jnp.where(okn, mark, 0)
        adv = jnp.where(okn, adv, jnp.int32(BLOCK))  # corrupt: abort

        col = jnp.where(act, out_pos, jnp.int32(BLOCK))
        out = out.at[seg, col].set(mark, mode="drop")
        return (jnp.where(act, bitpos + nbits, bitpos),
                jnp.where(act, out_pos + adv, out_pos),
                jnp.where(act, okn, ok), out)

    def cond(c):
        return jnp.any(c[2] & (c[1] < out_len))

    init = (body_bit_local, start_pos, jnp.ones((NB,), bool),
            jnp.zeros((NB, BLOCK + 1), jnp.int32))
    final = jax.lax.while_loop(cond, body, init)
    return final[3][:, :BLOCK]


def _materialize_fn(markers, stream_words, btype, c0_pos_l, c0_len,
                    c1_pos_l, out_len, carry=None):
    """Padded-stage XLA: stored-block byte fill, liveness masking, and
    (segment mode) carry-marker synthesis. markers [NB, BLOCK];
    stream_words [NB, SW] int32 (LE u32 view of each slice — bytes are
    derived on device so the slice isn't transferred twice, round 4);
    *_l offsets local to each slice; carry [NB] int32
    ((dist << 9) | len, 0 = none). Returns [NB, BLOCK]."""
    NB = markers.shape[0]
    pos = jax.lax.broadcasted_iota(jnp.int32, (NB, BLOCK), 1)

    # Stored blocks: every position is a literal from the input slice.
    in_local = jnp.where(pos < c0_len[:, None],
                         c0_pos_l[:, None] + pos,
                         c1_pos_l[:, None] + (pos - c0_len[:, None]))
    in_local = jnp.clip(in_local, 0, SLICE_BYTES - 1)
    word = jnp.take_along_axis(stream_words, in_local >> 2, axis=1)
    sbyte = (jax.lax.shift_right_logical(
        word, (in_local & 3) << 3)) & 0xFF
    stored_mark = (_KIND_LIT << 28) | sbyte
    markers = jnp.where((btype == 0)[:, None], stored_mark, markers)

    live = pos < out_len[:, None]
    markers = jnp.where(live, markers, (_KIND_LIT << 28))

    if carry is not None:
        # A match split across the preceding segment boundary re-enters
        # as a synthetic match marker at local position 0; the rest of
        # its span must read as blank (the walk never wrote it).
        clen = carry & 511
        cmark = (_KIND_MATCH << 28) | carry
        markers = jnp.where((carry > 0)[:, None] & (pos < clen[:, None]),
                            jnp.where(pos == 0, cmark[:, None], 0),
                            markers)
    return markers


def _resolve_wide(ptr, val, gpos):
    """Unpacked pointer doubling; semantics mirror the packed path
    exactly (resolved <=> ptr == own index; a round adopts the target's
    value if the target is resolved, else chases its pointer)."""

    def full_round(carry):
        p, v = carry
        tp = p[p]
        tv = v[p]
        res = tp == p
        return (jnp.where(res, gpos, tp), jnp.where(res, tv, v))

    ptr, val = full_round(full_round((ptr, val)))

    def cond(carry):
        return ~jnp.all(carry[0] == gpos)

    ptr, val = jax.lax.while_loop(cond, full_round, (ptr, val))
    return val.astype(jnp.uint8)


def _resolve_fn(markers, dist_bias: int = 0, wide: bool = False,
                interpret: bool = False):
    """Match resolution over flat dense markers -> [N] uint8.

    Round 4: the Pallas copy machine (tpz/kernels/resolve_walk.py) —
    in-order vectorized match copies at VMEM speed — replaces pointer
    doubling on the compiled path (measured 1.66 s -> see BASELINE
    round-4 for the 8 MiB stage split). Halo-chained chunks bound packed
    pointers, so even >2^24 spans (the old WIDE mode) use it; `wide` is
    kept for the batch planners' memory accounting only.

    interpret=True (the CPU test suite) keeps the XLA doubling twin:
    simulating the copy machine's while-loop per chain-step is orders of
    magnitude slower than running doubling natively, and the resolvers'
    equivalence is differentially proven in tests/test_resolve_walk.py
    over the same marker space."""
    import os as _os4

    if interpret or _os4.environ.get("TPZ_RESOLVE") == "doubling":
        # TPZ_RESOLVE=doubling forces the XLA pointer-doubling resolver
        # on the compiled path too — the escape hatch if the Pallas copy
        # machine (never yet compiled on the real chip, VERDICT r4 weak
        # #6) hits a Mosaic issue, and the A/B knob for measuring it.
        return _resolve_doubling(markers, dist_bias=dist_bias, wide=wide)
    from tpz.kernels import resolve_walk

    return resolve_walk.resolve_dense(markers, dist_bias=dist_bias,
                                      interpret=False)


def _resolve_doubling(markers, dist_bias: int = 0, wide: bool = False):
    """Dense-stage XLA: match expansion + packed-state pointer doubling
    (round-3; the round-2 version cost THREE
    whole-array gathers per round at this chip's ~0.14 G elem/s gather
    floor). Round 4: superseded by the resolve_walk copy machine as the
    production path; retained as the spec twin for differential tests.

    Key facts:
      1. state = ptr << 8 | val packed in ONE uint32 ("resolved" is
         ptr == own index), so a doubling round is a SINGLE gather.
         Requires N <= 2^24 (MAX_DECODE_SPAN).
      2. self-overlapping matches (dist < len, the RLE-style runs that
         create byte chains as deep as the run) collapse in closed form:
         byte i of match (start, len, dist) reads start - dist +
         ((i - start) mod dist), which always lands BEFORE the match, so
         chain depth is bounded by the token chain (~hundreds measured),
         not the byte chain (~64 K worst case) => <= ~9 doubling rounds.

    markers: flat [N] int32 in DENSE output space. Returns [N] uint8."""
    flat = markers
    N = flat.shape[0]
    gpos = jnp.arange(N, dtype=jnp.int32)
    kind = flat >> 28
    is_start = kind == _KIND_MATCH
    # Fill inside matches: latest match start at/before each position.
    seg = jax.lax.cummax(jnp.where(is_start | (kind == _KIND_LIT),
                                   jnp.where(is_start, gpos, -gpos - 1),
                                   jnp.int32(-(1 << 30))))
    # seg >= 0 -> latest token is a match starting at seg; < 0 -> literal.
    in_match = seg >= 0
    start = jnp.maximum(seg, 0)
    smark = flat[start]
    mlen = smark & 511
    # dist_bias: LZHUF markers store dist-1 (its 2^16 window exceeds the
    # 16-bit marker field by one).
    mdist = ((smark >> 9) & 0xFFFF) + dist_bias
    inside = in_match & (gpos < start + mlen)
    k = gpos - start
    d = jnp.maximum(mdist, 1)
    src = start - mdist + (k - (k // d) * d)  # mod-collapse (see above)
    # Corrupt streams can point before the batch start; clamping keeps the
    # gather safe and the walk monotone (CRC checks reject the garbage).
    ptr = jnp.clip(jnp.where(inside, src, gpos), 0, N - 1)
    val = jnp.where(inside, 0, flat & 0xFF)
    if wide:
        # WIDE mode (round 3): ptr/val as separate int32 arrays — two
        # gathers per full round instead of one, but no 2^24 pointer
        # bound, so single streams up to MAX_DECODE_SPAN_WIDE decode on
        # device. Chosen per dispatch by the batch planners.
        return _resolve_wide(ptr, val, gpos)
    state = ((ptr.astype(jnp.uint32) << 8)
             | val.astype(jnp.uint32))
    self_hi = gpos.astype(jnp.uint32) << 8

    def full_round(s):
        p = (s >> 8).astype(jnp.int32)
        g = s[p]  # the round's single gather
        tgt_resolved = (g >> 8) == (s >> 8)
        return jnp.where(tgt_resolved,
                         self_hi | (g & jnp.uint32(0xFF)),
                         g & jnp.uint32(0xFFFFFF00))

    # Full-width doubling only (round-3 final): the tiered-compaction
    # schedule (sort the unresolved set to a static N/4, N/16 prefix and
    # gather/scatter only that) was built from the relay-down cost model
    # and LOST on the real chip — 1.88 s / 21 effective rounds vs 1.66 s
    # / 10 rounds plain at 8 MiB (bench/profile_decode_stages.py,
    # 2026-08-18): the tier sorts + .at[].set scatters cost more than the
    # full-width gathers they save, because chain depth is ~10, not the
    # modeled ~21.
    state = full_round(full_round(state))

    def cond(s):
        return ~jnp.all((s & jnp.uint32(0xFFFFFF00)) == self_hi)

    state = jax.lax.while_loop(cond, full_round, state)
    return (state & jnp.uint32(0xFF)).astype(jnp.uint8)


def _decode_fused_fn(stream_words, body_bit_local, walk_out_len, tab,
                     len_base, len_extra,
                     dist_base, dist_extra, btype, c0_pos_l,
                     c0_len, c1_pos_l, out_len, interpret: bool = False,
                     nblk: int = 8, wide: bool = False):
    """Whole decode as ONE device program: Pallas symbol walk -> marker
    resolution — one dispatch, no host round-trip between stages (the
    relay charges ~0.6 s per invocation, BASELINE.md). Entries are
    encoder blocks: every non-final out_len == BLOCK, so padded marker
    space IS dense output space."""
    markers = _symbol_walk(stream_words, body_bit_local, walk_out_len,
                           tab, len_base, len_extra, dist_base, dist_extra,
                           interpret=interpret, nblk=nblk)
    markers = _materialize_fn(markers, stream_words, btype, c0_pos_l,
                              c0_len, c1_pos_l, out_len)
    return _resolve_fn(markers.reshape(-1), wide=wide,
                       interpret=interpret)


def _decode_segmented_fn(stream_words, body_bit_local, walk_out_len,
                         tab, len_base,
                         len_extra, dist_base, dist_extra, btype,
                         c0_pos_l, c0_len, c1_pos_l, out_len, start_pos,
                         carry, dense_off, interpret: bool = False,
                         nblk: int = 8, wide: bool = False,
                         out_p: int = 0):
    """Segment-mode fused decode (SURVEY.md §7.4 route 2): entries come
    from the host InflateIndex over ANY stream — ragged out_lens (block
    cuts, stored blocks) and split-match carries. The padded [NB, BLOCK]
    marker space is compacted to dense output space with ONE placement
    sort before resolution."""
    NB = walk_out_len.shape[0]
    markers = _symbol_walk(stream_words, body_bit_local, walk_out_len,
                           tab, len_base, len_extra, dist_base, dist_extra,
                           start_pos=start_pos, interpret=interpret,
                           nblk=nblk)
    markers = _materialize_fn(markers, stream_words, btype, c0_pos_l,
                              c0_len, c1_pos_l, out_len, carry=carry)
    pos = jax.lax.broadcasted_iota(jnp.int32, (NB, BLOCK), 1)
    live = pos < out_len[:, None]
    key = jnp.where(live, dense_off[:, None] + pos, jnp.int32(2**31 - 1))
    mpark = jnp.where(live, markers, (_KIND_LIT << 28))
    _, dense = jax.lax.sort(
        (key.reshape(-1), mpark.reshape(-1)), dimension=0, num_keys=1)
    if out_p:
        # Live entries sort to a dense prefix (keys 0..total-1); the
        # resolution — the expensive stage — runs over the static
        # bucketed prefix instead of all NBp*BLOCK padded slots.
        dense = jax.lax.slice(dense, (0,), (out_p,))
    return _resolve_fn(dense, wide=wide, interpret=interpret)


def usable(explicit: bool = False) -> bool:
    from tpz.kernels.deflate_pipeline import usable as enc_usable

    return enc_usable(explicit)


_resolve_jit = jax.jit(_resolve_fn,
                       static_argnames=("dist_bias", "wide", "interpret"))
_walk_jit = jax.jit(_symbol_walk, static_argnames=("interpret", "nblk"))
_decode_fused = jax.jit(_decode_fused_fn,
                        static_argnames=("interpret", "nblk", "wide"))
_decode_segmented = jax.jit(_decode_segmented_fn,
                            static_argnames=("interpret", "nblk", "wide",
                                             "out_p"))

# Packed resolution state (ptr << 8 | val in uint32) caps one decode
# dispatch at 2^24 output bytes (16 MiB); decompress_many sub-batches.
# Oversized SINGLE streams switch to the WIDE (unpacked) resolution,
# bounded only by memory.
MAX_DECODE_SPAN = 1 << 24
MAX_DECODE_SPAN_WIDE = 1 << 27


def decompress_indexed(stream: bytes, end_bits: np.ndarray,
                       out_lens: np.ndarray,
                       interpret: bool | None = None) -> bytes:
    """Decode an encoder-indexed raw DEFLATE stream on device."""
    return decompress_many_indexed(
        [(stream, end_bits, out_lens)], interpret=interpret)[0]


def decompress_many_indexed(items, interpret: bool | None = None,
                            _wide: bool = False):
    """Batch-decode many indexed raw DEFLATE streams in ONE device
    program (walk + resolution fused): the production serving shape —
    the per-invocation relay dispatch cost amortizes over the batch.

    items: list of (stream_bytes, end_bits, out_lens). Pointer packing
    bounds one dispatch at MAX_DECODE_SPAN output bytes; bigger batches
    split. Match sources never cross buffer starts (each stream's window
    resets), so a shared flat output space is safe."""
    from tpz import oracle

    if interpret is None:
        # The symbol walk is a Mosaic kernel; off-TPU it runs in the
        # Pallas interpreter (slow but exact — used by the CPU tests).
        interpret = jax.default_backend() != "tpu"
    results = [None] * len(items)
    idxs = []
    for i, (stream, end_bits, out_lens) in enumerate(items):
        nb = len(end_bits)
        if nb == 0 or int(np.sum(out_lens)) == 0:
            results[i] = b""
            continue
        if np.any(np.asarray(out_lens)[:-1] != BLOCK):
            raise DataError("index block lengths must be 64 KiB except last")
        idxs.append(i)
    if not idxs:
        return results

    # Split oversized batches; an oversized SINGLE stream cannot split
    # (pointer space must cover its whole output) — it dispatches alone
    # under the WIDE (unpacked) resolution instead.
    total_out = sum(len(items[i][1]) * BLOCK for i in idxs)
    if not _wide and total_out > MAX_DECODE_SPAN:
        group, group_out = [], 0
        for i in idxs:
            need = len(items[i][1]) * BLOCK
            if need > MAX_DECODE_SPAN_WIDE:
                raise DataError("stream exceeds MAX_DECODE_SPAN_WIDE")
            if need > MAX_DECODE_SPAN:
                results[i] = decompress_many_indexed(
                    [items[i]], interpret, _wide=True)[0]
                continue
            if group and group_out + need > MAX_DECODE_SPAN:
                for gi, out in zip(group, decompress_many_indexed(
                        [items[g] for g in group], interpret)):
                    results[gi] = out
                group, group_out = [], 0
            group.append(i)
            group_out += need
        if group:
            for gi, out in zip(group, decompress_many_indexed(
                    [items[g] for g in group], interpret)):
                results[gi] = out
        return results

    # Scan first: a block whose (valid) pathological tree overflows the
    # two-level L2 capacity reports lit_bits == -1 — decline that item
    # to the host decoder (its result stays None).
    scans = {}
    kept = []
    for i in idxs:
        scan = oracle.inflate_scan_headers(items[i][0],
                                           np.asarray(items[i][1]))
        if (scan["lit_bits"] < 0).any():
            continue
        scans[i] = scan
        kept.append(i)
    idxs = kept
    if not idxs:
        return results

    nbs = [len(items[i][1]) for i in idxs]
    NB = sum(nbs)
    TWALL = C.INFLATE_LIT_TW + C.INFLATE_DIST_TW
    slices = np.zeros((NB, SLICE_BYTES), np.uint8)
    body_bit_local = np.zeros(NB, np.int32)
    c0_pos_l = np.zeros(NB, np.int32)
    c0_len = np.zeros(NB, np.int32)
    c1_pos_l = np.zeros(NB, np.int32)
    walk_out_len = np.zeros(NB, np.int32)
    out_len_all = np.zeros(NB, np.int32)
    btype = np.zeros(NB, np.int32)
    tab = np.zeros((NB, TWALL), np.int32)
    b0 = 0
    for i, nb in zip(idxs, nbs):
        stream, end_bits, out_lens = items[i]
        scan = scans[i]
        sb = np.frombuffer(stream, np.uint8)
        slice_start = np.zeros(nb, np.int64)
        starts = np.concatenate([[0], np.asarray(end_bits)[:-1]])
        for b in range(nb):
            s0 = int(starts[b]) // 8
            s1 = min(len(sb), (int(end_bits[b]) + 7) // 8 + 8)
            take = min(s1 - s0, SLICE_BYTES)
            slices[b0 + b, :take] = sb[s0:s0 + take]
            slice_start[b] = s0
        sl = slice(b0, b0 + nb)
        body_bit_local[sl] = (scan["body_bit"] - 8 * slice_start)
        c0_pos_l[sl] = scan["c0_pos"] - slice_start
        c0_len[sl] = scan["c0_len"]
        c1_pos_l[sl] = scan["c1_pos"] - slice_start
        out_len_all[sl] = np.asarray(out_lens)
        walk_out_len[sl] = np.where(scan["btype"] == 0, 0,
                                    np.asarray(out_lens))
        btype[sl] = scan["btype"]
        tab[sl, :C.INFLATE_LIT_TW] = scan["lit_tab"]
        tab[sl, C.INFLATE_LIT_TW:] = scan["dist_tab"]
        b0 += nb

    sw = np.ascontiguousarray(slices).view("<u4").astype(np.int32)
    out = _decode_fused(
        jnp.asarray(sw), jnp.asarray(body_bit_local),
        jnp.asarray(walk_out_len), jnp.asarray(tab),
        jnp.asarray(np.asarray(C.DEFLATE_LENGTH_BASE, np.int32)),
        jnp.asarray(np.asarray(C.DEFLATE_LENGTH_EXTRA, np.int32)),
        jnp.asarray(np.asarray(C.DEFLATE_DIST_BASE, np.int32)),
        jnp.asarray(np.asarray(C.DEFLATE_DIST_EXTRA, np.int32)),
        jnp.asarray(btype), jnp.asarray(c0_pos_l),
        jnp.asarray(c0_len), jnp.asarray(c1_pos_l),
        jnp.asarray(out_len_all), interpret=interpret, wide=_wide)
    flat = np.asarray(fetch(out))
    b0 = 0
    for i, nb in zip(idxs, nbs):
        span = flat[b0 * BLOCK:(b0 + nb) * BLOCK].reshape(nb, BLOCK)
        n_out = int(np.sum(items[i][2]))
        if int(items[i][2][-1]) == BLOCK:
            results[i] = span.reshape(-1)[:n_out].tobytes()
        else:
            results[i] = (span[:-1].reshape(-1).tobytes()
                          + span[-1, :int(items[i][2][-1])].tobytes())
        b0 += nb
    return results


def index_stream(stream: bytes):
    """Host-side segment index over any raw DEFLATE stream (SURVEY.md
    §7.4 route 2; cpp InflateIndex). Returns the index dict (with
    'consumed' bytes) or None when the stream doesn't fit the device
    path — the caller uses the host decoder."""
    from tpz import oracle

    if not oracle.available():
        return None
    import os as _os3

    # Tunable cut size (device sweep knob): the lane-parallel vz walk
    # gains twice from smaller segments — more lanes AND fewer trips
    # (trips = max tokens per segment) — at the cost of padded marker
    # rows. Default stays one 64 KiB block per segment.
    seg_out = int(_os3.environ.get("TPZ_SEG_OUT", BLOCK))
    idx = oracle.inflate_index(stream, seg_out=seg_out,
                               max_span_bytes=SLICE_BYTES - 1024)
    if idx is None or len(idx["out_lens"]) == 0:
        return None
    if int(np.sum(idx["out_lens"])) > MAX_DECODE_SPAN_WIDE:
        return None
    return idx


def decompress_segmented(stream: bytes, idx: dict,
                         interpret: bool | None = None) -> bytes:
    """Decode one indexed stream via the segment route."""
    return decompress_many_segmented([(stream, idx)], interpret)[0]


def decompress_many_segmented(items, interpret: bool | None = None,
                              _wide: bool = False):
    """Batch-decode host-indexed streams (index_stream) in ONE fused
    device program. Unlike the encoder-TZ path, entries are SEGMENTS:
    ragged out_lens (block-table cuts, stored blocks) and split-match
    carries; the device program compacts padded marker space to dense
    output space with one placement sort before resolution.

    items: list of (stream_bytes, idx_dict)."""
    from tpz import oracle

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    results = [None] * len(items)
    idxs = [i for i, (_, idx) in enumerate(items)
            if len(idx["out_lens"]) > 0]
    for i, (_, idx) in enumerate(items):
        if len(idx["out_lens"]) == 0:
            results[i] = b""
        elif int(np.max(idx["out_lens"])) > BLOCK:
            # The [NB, BLOCK] marker space holds at most BLOCK output
            # bytes per segment; a malformed caller-supplied index would
            # otherwise surface as a trace-time slice error (ADVICE r3
            # #4 — make the per-segment contract explicit).
            raise DataError("segment out_len exceeds BLOCK")
    if not idxs:
        return results

    total_out = sum(int(np.sum(items[i][1]["out_lens"])) for i in idxs)
    if not _wide and total_out > MAX_DECODE_SPAN:
        group, group_out = [], 0
        for i in idxs:
            need = int(np.sum(items[i][1]["out_lens"]))
            if need > MAX_DECODE_SPAN_WIDE:
                raise DataError("stream exceeds MAX_DECODE_SPAN_WIDE")
            if need > MAX_DECODE_SPAN:
                results[i] = decompress_many_segmented(
                    [items[i]], interpret, _wide=True)[0]
                continue
            if group and group_out + need > MAX_DECODE_SPAN:
                for gi, out in zip(group, decompress_many_segmented(
                        [items[g] for g in group], interpret)):
                    results[gi] = out
                group, group_out = [], 0
            group.append(i)
            group_out += need
        if group:
            for gi, out in zip(group, decompress_many_segmented(
                    [items[g] for g in group], interpret)):
                results[gi] = out
        return results

    # Scan first; items whose trees overflow the two-level L2 capacity
    # (lit_bits == -1) decline to the host decoder (result stays None).
    scans = {}
    kept = []
    for i in idxs:
        stream, idx = items[i]
        scan = oracle.inflate_scan_segments(
            stream, idx["hdr_bits"], idx["seg_bits"], idx["end_bits"])
        if (scan["lit_bits"] < 0).any():
            continue
        scans[i] = scan
        kept.append(i)
    idxs = kept
    if not idxs:
        return results

    nbs = [len(items[i][1]["out_lens"]) for i in idxs]
    NB = sum(nbs)
    total_out = sum(int(np.sum(items[i][1]["out_lens"])) for i in idxs)
    # Bucket the compile key: every distinct (segment count, output
    # size) pair is a fresh XLA program otherwise — on the axon relay a
    # ~30-60 s remote compile per FOREIGN STREAM (measured 53 s "warm"
    # at 8 MiB, 2026-08-18). Segments pad to a power of two of dead
    # rows (out_len 0: the walk's while-chains exit on entry, the live
    # mask blanks them) and the resolution runs over a power-of-two
    # bucket of the dense output, so real-world streams reuse a handful
    # of compiled programs.
    NBP = max(4, 1 << (NB - 1).bit_length())
    out_p = max(1 << 16, 1 << (int(total_out) - 1).bit_length())
    slices = np.zeros((NBP, SLICE_BYTES), np.uint8)
    body_bit_local = np.zeros(NBP, np.int32)
    c0_pos_l = np.zeros(NBP, np.int32)
    c0_len = np.zeros(NBP, np.int32)
    c1_pos_l = np.zeros(NBP, np.int32)
    walk_out_len = np.zeros(NBP, np.int32)
    out_len_all = np.zeros(NBP, np.int32)
    start_pos = np.zeros(NBP, np.int32)
    carry = np.zeros(NBP, np.int32)
    btype = np.zeros(NBP, np.int32)
    TWALL = C.INFLATE_LIT_TW + C.INFLATE_DIST_TW
    tab = np.zeros((NBP, TWALL), np.int32)
    b0 = 0
    for i, nb in zip(idxs, nbs):
        stream, idx = items[i]
        scan = scans[i]
        sb = np.frombuffer(stream, np.uint8)
        slice_start = np.zeros(nb, np.int64)
        for b in range(nb):
            s0 = int(idx["seg_bits"][b]) // 8
            s1 = min(len(sb), (int(idx["end_bits"][b]) + 7) // 8 + 8)
            take = min(s1 - s0, SLICE_BYTES)
            slices[b0 + b, :take] = sb[s0:s0 + take]
            slice_start[b] = s0
        sl = slice(b0, b0 + nb)
        body_bit_local[sl] = (scan["body_bit"] - 8 * slice_start)
        c0_pos_l[sl] = scan["c0_pos"] - slice_start
        c0_len[sl] = scan["c0_len"]
        c1_pos_l[sl] = scan["c1_pos"] - slice_start
        out_len_all[sl] = idx["out_lens"]
        cl = idx["carry_len"].astype(np.int32)
        start_pos[sl] = cl
        carry[sl] = (idx["carry_dist"].astype(np.int32) << 9) | cl
        walk_out_len[sl] = np.where(scan["btype"] == 0, 0,
                                    idx["out_lens"])
        btype[sl] = scan["btype"]
        tab[sl, :C.INFLATE_LIT_TW] = scan["lit_tab"]
        tab[sl, C.INFLATE_LIT_TW:] = scan["dist_tab"]
        b0 += nb

    dense_off = np.cumsum(out_len_all.astype(np.int64)) - out_len_all
    sw = np.ascontiguousarray(slices).view("<u4").astype(np.int32)
    out = _decode_segmented(
        jnp.asarray(sw), jnp.asarray(body_bit_local),
        jnp.asarray(walk_out_len), jnp.asarray(tab),
        jnp.asarray(np.asarray(C.DEFLATE_LENGTH_BASE, np.int32)),
        jnp.asarray(np.asarray(C.DEFLATE_LENGTH_EXTRA, np.int32)),
        jnp.asarray(np.asarray(C.DEFLATE_DIST_BASE, np.int32)),
        jnp.asarray(np.asarray(C.DEFLATE_DIST_EXTRA, np.int32)),
        jnp.asarray(btype), jnp.asarray(c0_pos_l),
        jnp.asarray(c0_len), jnp.asarray(c1_pos_l),
        jnp.asarray(out_len_all), jnp.asarray(start_pos),
        jnp.asarray(carry), jnp.asarray(dense_off.astype(np.int32)),
        interpret=interpret, wide=_wide, out_p=out_p)
    flat = np.asarray(fetch(out))
    b0 = 0
    pos = 0
    for i, nb in zip(idxs, nbs):
        n_out = int(np.sum(items[i][1]["out_lens"]))
        results[i] = flat[pos:pos + n_out].tobytes()
        pos += n_out
        b0 += nb
    return results
