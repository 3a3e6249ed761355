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

Streams without the side-car (other producers, zlib/raw) decode on the
C++ host path, which remains the conformance reference.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from tpz import constants as C
from tpz.errors import DataError
from tpz.kernels.device_quirks import fetch

BLOCK = 65536
SLICE_BYTES = BLOCK + 2048      # per-block stream slice (worst case ~64k+hdr)
TAB = 1 << 15

# marker layout: kind << 28 | payload
_KIND_LIT = 1                    # payload = byte
_KIND_MATCH = 2                  # payload = dist << 9 | len


def _symbol_walk(stream_words, body_bit_local, out_len, lit_tab, dist_tab,
                 lit_mask, dist_mask, len_base, len_extra, dist_base,
                 dist_extra, interpret=False):
    """Per-block Huffman symbol decode.

    stream_words: [NB, SW] int32 (LE u32 of the block's stream slice)
    body_bit_local: [NB] int32 bit offset of the symbol stream within the
    slice; out_len: [NB] int32 (0 for stored blocks -> no walk);
    lit_tab/dist_tab: [NB, TAB] int32 (sym << 5 | len entries);
    lit_mask/dist_mask: [NB] int32 (2^bits - 1); len_base[29], len_extra
    [29], dist_base[30], dist_extra[30]: int32 (SMEM).
    Returns markers [NB, BLOCK] int32.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    NB, SW = stream_words.shape
    assert SW % 128 == 0 and BLOCK % 128 == 0
    r_s, r_o = SW // 128, BLOCK // 128
    s3 = stream_words.reshape(NB, r_s, 128)
    l3 = lit_tab.reshape(NB, TAB // 128, 128)
    d3 = dist_tab.reshape(NB, TAB // 128, 128)

    def kernel(bb_ref, ol_ref, lm_ref, dm_ref, lb_ref, le_ref, db_ref,
               de_ref, s_ref, lt_ref, dt_ref, out_ref):
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
        out_ref[...] = jnp.zeros_like(out_ref)
        b = pl.program_id(0)
        out_len = ol_ref[b]
        lmask = lm_ref[b]
        dmask = dm_ref[b]

        def rd(ref, pos):
            row = ref[0, pl.ds(pos >> 7, 1), :]
            return jnp.sum(jnp.where(lane == (pos & 127), row, 0))

        def peek(bitpos, n):
            # Scalar logical bit window (Mosaic has no scalar bitcast, so
            # stay in int32 with explicit logical shifts).
            w = bitpos >> 5
            sh = bitpos & 31
            w0 = rd(s_ref, w)
            w1 = rd(s_ref, w + 1)
            lo = jax.lax.shift_right_logical(w0, sh)
            hi = jnp.where(sh > 0,
                           jax.lax.shift_left(w1, (32 - sh) & 31), 0)
            return (lo | hi) & ((jnp.int32(1) << n) - 1)

        def cond(c):
            # (bitpos, out_pos, r, orow, ok)
            return (c[1] < out_len) & c[4]

        def body(c):
            bitpos, out_pos, r, orow, ok = c
            r_new = out_pos >> 7

            @pl.when(r_new != r)
            def _():
                out_ref[0, pl.ds(r, 1), :] = orow

            orow = jnp.where(r_new != r, jnp.zeros_like(orow), orow)

            e = rd(lt_ref, (peek(bitpos, jnp.int32(15)) & lmask))
            clen = e & 31
            sym = e >> 5
            bitpos = bitpos + clen
            ok = ok & (clen > 0) & (sym != 256) & (sym <= 285)

            def lit_case(_):
                return out_pos + 1, (_KIND_LIT << 28) | sym, bitpos

            def match_case(_):
                eb = le_ref[jnp.clip(sym - 257, 0, 28)]
                lval = (lb_ref[jnp.clip(sym - 257, 0, 28)]
                        + peek(bitpos, eb))
                bp = bitpos + eb
                e2 = rd(dt_ref, (peek(bp, jnp.int32(15)) & dmask))
                dlen = e2 & 31
                ds = e2 >> 5
                bp = bp + dlen
                deb = de_ref[jnp.clip(ds, 0, 29)]
                dval = (db_ref[jnp.clip(ds, 0, 29)]
                        + peek(bp, deb))
                bp = bp + deb
                return (out_pos + lval,
                        (_KIND_MATCH << 28) | (dval << 9) | lval, bp)

            nxt, mark, bitpos = jax.lax.cond(sym < 256, lit_case,
                                             match_case, 0)
            mark = jnp.where(ok, mark, 0)
            nxt = jnp.where(ok, nxt, out_len)  # abort on corrupt stream
            orow = jnp.where(ok & (lane == (out_pos & 127)), mark, orow)
            return bitpos, nxt, r_new, orow, ok

        init = (bb_ref[b], jnp.int32(0), jnp.int32(0),
                jnp.zeros((1, 128), jnp.int32), True)
        bitpos, out_pos, r, orow, ok = jax.lax.while_loop(cond, body, init)
        out_ref[0, pl.ds(r, 1), :] = orow

    out = pl.pallas_call(
        kernel,
        grid=(NB,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] * 8 + [
            pl.BlockSpec((1, r_s, 128), lambda b: (b, 0, 0)),
            pl.BlockSpec((1, TAB // 128, 128), lambda b: (b, 0, 0)),
            pl.BlockSpec((1, TAB // 128, 128), lambda b: (b, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, r_o, 128), lambda b: (b, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((NB, r_o, 128), jnp.int32),
        interpret=interpret,
    )(body_bit_local, out_len, lit_mask, dist_mask, len_base, len_extra,
      dist_base, dist_extra, s3, l3, d3)
    return out.reshape(NB, BLOCK)


def _resolve_fn(markers, slices, btype, c0_pos_l, c0_len, c1_pos_l,
                out_len, n_out: int):
    """XLA stage: stored-block byte fill + match expansion + pointer
    doubling. markers [NB, BLOCK]; slices [NB, SLICE_BYTES] uint8;
    *_l offsets local to each slice. Returns [n_out_pad] uint8."""
    NB = markers.shape[0]
    pos = jax.lax.broadcasted_iota(jnp.int32, (NB, BLOCK), 1)

    # Stored blocks: every position is a literal from the input slice.
    in_local = jnp.where(pos < c0_len[:, None],
                         c0_pos_l[:, None] + pos,
                         c1_pos_l[:, None] + (pos - c0_len[:, None]))
    sbyte = jnp.take_along_axis(
        slices, jnp.clip(in_local, 0, SLICE_BYTES - 1), axis=1)
    stored_mark = (_KIND_LIT << 28) | sbyte.astype(jnp.int32)
    markers = jnp.where((btype == 0)[:, None], stored_mark, markers)

    live = pos < out_len[:, None]
    markers = jnp.where(live, markers, (_KIND_LIT << 28))

    flat = markers.reshape(-1)
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
    mdist = (smark >> 9) & 0xFFFF
    inside = in_match & (gpos < start + mlen)
    ptr = jnp.where(inside, gpos - mdist, gpos)
    val = jnp.where(inside, 0, flat & 0xFF).astype(jnp.int32)
    resolved = ~inside

    def cond(c):
        return ~jnp.all(c[2])

    def body(c):
        val, ptr, resolved = c
        pv = val[ptr]
        pr = resolved[ptr]
        val = jnp.where(resolved, val, pv)
        resolved2 = resolved | pr
        ptr = jnp.where(resolved, ptr, ptr[ptr])
        return val, ptr, resolved2

    val, ptr, resolved = jax.lax.while_loop(cond, body,
                                            (val, ptr, resolved))
    return val.astype(jnp.uint8)


def usable() -> bool:
    from tpz.kernels.deflate_pipeline import usable as enc_usable

    return enc_usable()


_resolve_jit = jax.jit(_resolve_fn, static_argnames=("n_out",))
_walk_jit = jax.jit(_symbol_walk, static_argnames=("interpret",))


def decompress_indexed(stream: bytes, end_bits: np.ndarray,
                       out_lens: np.ndarray,
                       interpret: bool | None = None) -> bytes:
    """Decode an encoder-indexed raw DEFLATE stream on device."""
    from tpz import oracle

    if interpret is None:
        # The symbol walk is a Mosaic kernel; off-TPU it runs in the
        # Pallas interpreter (slow but exact — used by the CPU tests).
        interpret = jax.default_backend() != "tpu"
    nb = len(end_bits)
    n_out = int(np.sum(out_lens))
    if nb == 0 or n_out == 0:
        return b""
    if np.any(out_lens[:-1] != BLOCK):
        raise DataError("index block lengths must be 64 KiB except last")
    scan = oracle.inflate_scan_headers(stream, np.asarray(end_bits))

    sb = np.frombuffer(stream, np.uint8)
    slices = np.zeros((nb, SLICE_BYTES), np.uint8)
    slice_start = np.zeros(nb, np.int64)
    starts = np.concatenate([[0], np.asarray(end_bits)[:-1]])
    for b in range(nb):
        s0 = int(starts[b]) // 8
        s1 = min(len(sb), (int(end_bits[b]) + 7) // 8 + 8)
        take = min(s1 - s0, SLICE_BYTES)
        slices[b, :take] = sb[s0:s0 + take]
        slice_start[b] = s0

    body_bit_local = (scan["body_bit"] - 8 * slice_start).astype(np.int32)
    c0_pos_l = (scan["c0_pos"] - slice_start).astype(np.int32)
    c1_pos_l = (scan["c1_pos"] - slice_start).astype(np.int32)
    walk_out_len = np.where(scan["btype"] == 0, 0,
                            np.asarray(out_lens)).astype(np.int32)

    lit_mask = ((1 << scan["lit_bits"]) - 1).astype(np.int32)
    dist_mask = np.where(scan["dist_bits"] > 0,
                         (1 << scan["dist_bits"]) - 1, 0).astype(np.int32)
    len_base = np.asarray(C.DEFLATE_LENGTH_BASE, np.int32)
    len_extra = np.asarray(C.DEFLATE_LENGTH_EXTRA, np.int32)
    dist_base = np.asarray(C.DEFLATE_DIST_BASE, np.int32)
    dist_extra = np.asarray(C.DEFLATE_DIST_EXTRA, np.int32)

    sw = np.ascontiguousarray(slices).view("<u4").astype(np.int32)

    markers = _walk_jit(
        jnp.asarray(sw), jnp.asarray(body_bit_local),
        jnp.asarray(walk_out_len),
        jnp.asarray(scan["lit_tab"].astype(np.int32)),
        jnp.asarray(scan["dist_tab"].astype(np.int32)),
        jnp.asarray(lit_mask), jnp.asarray(dist_mask),
        jnp.asarray(len_base), jnp.asarray(len_extra),
        jnp.asarray(dist_base), jnp.asarray(dist_extra),
        interpret=interpret)

    out = _resolve_jit(
        markers, jnp.asarray(slices), jnp.asarray(scan["btype"]),
        jnp.asarray(c0_pos_l), jnp.asarray(scan["c0_len"]),
        jnp.asarray(c1_pos_l),
        jnp.asarray(np.asarray(out_lens).astype(np.int32)),
        n_out=nb * BLOCK)
    return np.asarray(fetch(out))[:n_out].tobytes()
