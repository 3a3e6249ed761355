"""Pallas match resolution — the LZ77 copy machine (round 4).

Replaces the XLA pointer-doubling resolve (inflate_pipeline._resolve_fn's
doubling path) for the dense marker space shared by the DEFLATE and LZHUF
device decodes. Motivation (bench/profile_decode_stages.py, 2026-08-19):
doubling costs ~10 full-width gather rounds = 1.66 s per 8 MiB on this
chip, because every round prices the WHOLE array at the ~0.14 G elem/s
gather floor; and the measured chase-depth distribution (mean 22.9, max
179 on the mixed corpus) kills naive per-byte chasing too. The copy
machine instead does what a CPU inflate does — in-order vectorized match
copies — at VMEM speed:

  phase 1  segments of SEG positions resolve independently (W interleaved
           chains per grid step, one segment each). Within a segment the
           in-order walk makes every match copy read already-final data,
           so match bytes cost ~1/128th of a (1,128) vector op each:
           chunks of up to 128 bytes move as two row reads + two dynamic
           lane rolls + selects. Self-overlapping (RLE) matches use
           modular source re-basing: the readable window doubles every
           chunk, so a len-258 dist-1 run costs ~9 chunks, not 258.
           Copies reaching BEFORE the segment emit path-compressed
           pointer entries (no reads), so phase-2 chains are 1 deep per
           segment hop.
  phase 2  one chain walks the whole array in order; runs of consecutive
           pointers (what compressed cross-segment copies look like)
           move as the same vector chunks. Work is ~(rows + leftover
           chunks) steps — a few ms — because >95 % of bytes resolved in
           phase 1.

Entries are packed state in int32: (global_index << 8) | byte when
resolved (resolved <=> srl(entry, 8) == own index), (target << 8) when a
pointer — the same convention as the doubling path, so the two resolvers
are drop-in interchangeable (differentially tested in
tests/test_inflate_pipeline.py).

Streams longer than PHASE2_CAP positions chain PHASE2_CAP-sized chunks
through a window-sized HALO of resolved output re-fed as literal markers
(the LZ window caps match reach, RFC 1951: 32 KiB; lh7: 64 KiB), which
replaces the old unbounded WIDE doubling for single giant streams.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_KIND_LIT = 1
_KIND_MATCH = 2

# One phase-2 invocation holds the whole span in VMEM twice (marker in +
# state out): 2^22 positions = 2 x 16 MiB, comfortably under the 64 MiB
# scoped cap with pipeline scratch. Larger inputs chain via halo.
PHASE2_CAP = 1 << 22


def _srl(x, s):
    return jax.lax.shift_right_logical(x, s)


def _inject_boundary_carries(markers, step: int, start: int = 0):
    """XLA prepass: at every `step`-multiple boundary, if a match spans
    the cut, write a synthetic continuation marker (same dist, remaining
    len) at the boundary position. Phase-1 chains (and chained chunks)
    then never need to see a match marker from outside their window —
    the copy that crossed simply stops at the cut and the next window
    restarts it. Matches are <= 511 bytes so one marker per boundary
    suffices. A no-op where no match crosses (e.g. the encoder-indexed
    space, whose matches never cross 64 KiB blocks)."""
    N = markers.shape[0]
    if step >= N:
        return markers
    gpos = jnp.arange(N, dtype=jnp.int32)
    kind = _srl(markers, 28)
    is_start = kind == _KIND_MATCH
    seg = jax.lax.cummax(jnp.where(
        is_start | (kind == _KIND_LIT),
        jnp.where(is_start, gpos, -gpos - 1), jnp.int32(-(1 << 30))))
    bpos = jnp.arange(start + step, N, step, dtype=jnp.int32)
    s = seg[bpos]
    sm = markers[jnp.maximum(s, 0)]
    mlen = sm & 511
    covers = (s >= 0) & (s < bpos) & (s + mlen > bpos)
    inj = ((jnp.int32(_KIND_MATCH) << 28)
           | (sm & (0xFFFF << 9)) | (s + mlen - bpos))
    upd = jnp.where(covers, inj, markers[bpos])
    return markers.at[bpos].set(upd)


def _phase_call(arr, base0, *, phase: int, W: int, SR: int,
                dist_bias: int, interpret: bool):
    """One resolve pass. arr [R, 128] int32 — markers (phase 1) or packed
    state (phase 2). base0: scalar int32 — global index of row 0 (the
    halo-chaining offset). Returns [R, 128] int32 packed state.

    Grid step g runs W chains; chain c owns rows [c*SR, (c+1)*SR) of the
    step's (W*SR, 128) block. Chains never read outside their own
    segment — cross-segment references become pointer entries."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    R = arr.shape[0]
    assert R % (W * SR) == 0
    G = R // (W * SR)

    def kernel(b0_ref, m_ref, out_ref):
        MASKHI = jnp.int32(-256)
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
        g = pl.program_id(0)
        gbase0 = b0_ref[0] + g * (W * SR * 128)
        zero = jnp.int32(0)

        def lsel(row, k):
            return jnp.sum(jnp.where(lane == k, row, 0))

        def row_init(raw, gi):
            if phase == 1:
                lit = _srl(raw, 28) == _KIND_LIT
                return jnp.where(lit, (gi << 8) | (raw & 0xFF), gi << 8)
            return raw  # phase 2: rows are already packed state

        def step_chain(c, s):
            (r, nextlane, srow, orow, rem, src0, dist, dst) = s
            seg_base = gbase0 + c * (SR * 128)
            act = r < SR
            in_copy = act & (rem > 0)
            scanning = act & (rem == 0)
            row_base = seg_base + r * 128
            gi = row_base + lane

            # ---- COPY chunk (predicated) ----
            dlane = dst & 127
            dsafe = jnp.maximum(dist, 1)
            q = dst - src0
            src_eff = src0 + (q - (q // dsafe) * dsafe)
            avail = dst - src_eff
            c_len = jnp.minimum(jnp.minimum(rem, 128 - dlane), avail)
            cross = src_eff < seg_base
            c_len = jnp.where(
                cross, jnp.minimum(c_len, seg_base - src_eff), c_len)
            c_len = jnp.maximum(c_len, 1)  # dist>=1 => avail>=1; safety
            lsrc = src_eff - seg_base
            tr = _srl(jnp.maximum(lsrc, 0), 7)
            srclane = jnp.maximum(lsrc, 0) & 127
            v0 = out_ref[pl.ds(c * SR + jnp.clip(tr, 0, SR - 1), 1), :]
            v1 = out_ref[pl.ds(c * SR + jnp.clip(tr + 1, 0, SR - 1), 1), :]
            v0 = jnp.where(tr == r, orow, v0)
            v1 = jnp.where(tr + 1 == r, orow, v1)
            sh = dlane - srclane
            r0 = pltpu.roll(v0, sh, axis=1)
            r1 = pltpu.roll(v1, sh, axis=1)
            take0 = (lane - dlane) < (128 - srclane)
            rolled = jnp.where(take0, r0, r1)
            src_idx = src_eff + (lane - dlane)
            res = _srl(rolled, 8) == src_idx
            entry_in = jnp.where(res, (gi << 8) | (rolled & 0xFF),
                                 rolled & MASKHI)
            entry_cross = jnp.maximum(src_idx, 0) << 8
            entry = jnp.where(cross, entry_cross, entry_in)
            cmask = (lane >= dlane) & (lane < dlane + c_len)
            orow_c = jnp.where(in_copy & cmask, entry, orow)
            dst_c = dst + c_len
            rem_c = rem - c_len
            copy_row_done = in_copy & ((dlane + c_len) == 128)

            # ---- SCAN (predicated) ----
            if phase == 1:
                is_tok = (_srl(srow, 28) == _KIND_MATCH) & (lane >= nextlane)
            else:
                is_tok = (_srl(srow, 8) != gi) & (lane >= nextlane)
            ml = jnp.min(jnp.where(is_tok, lane, 128))
            has_tok = scanning & (ml < 128)
            mlc = jnp.minimum(ml, 127)
            mk = lsel(srow, mlc)
            if phase == 1:
                t_len = mk & 511
                t_dist = (_srl(mk, 9) & 0xFFFF) + dist_bias
            else:
                d_ml = _srl(mk, 8) - (row_base + mlc)
                run = is_tok & ((_srl(srow, 8) - gi) == d_ml)
                nb = jnp.min(jnp.where((lane > mlc) & ~run, lane, 128))
                t_len = nb - mlc
                t_dist = -d_ml
            tok_ok = has_tok & (t_dist > 0) & (t_len > 0)
            tok_bad = has_tok & ~(t_dist > 0) & (t_len > 0)
            row_done_scan = scanning & (ml == 128)

            # ---- advance / merge ----
            adv = row_done_scan | copy_row_done
            rs = jnp.clip(r, 0, SR - 1)
            orow_mid = jnp.where(in_copy, orow_c, orow)
            out_ref[pl.ds(c * SR + rs, 1), :] = orow_mid
            r_n = jnp.where(adv, r + 1, r)
            rn_c = jnp.clip(r_n, 0, SR - 1)
            raw_new = m_ref[pl.ds(c * SR + rn_c, 1), :]
            gi_new = seg_base + r_n * 128 + lane
            init_new = row_init(raw_new, gi_new)
            load = adv & (r_n < SR)
            srow_n = jnp.where(load, raw_new, srow)
            orow_n = jnp.where(load, init_new, orow_mid)
            rem_n = jnp.where(in_copy, rem_c, jnp.where(tok_ok, t_len, rem))
            dst_n = jnp.where(in_copy, dst_c,
                              jnp.where(tok_ok, row_base + mlc, dst))
            src0_n = jnp.where(tok_ok, row_base + mlc - t_dist, src0)
            dist_n = jnp.where(tok_ok, t_dist, dist)
            nl = jnp.where(in_copy, dst_c & 127,
                           jnp.where(tok_bad, mlc + 1, nextlane))
            nextlane_n = jnp.where(adv, zero, nl)
            return (r_n, nextlane_n, srow_n, orow_n, rem_n, src0_n,
                    dist_n, dst_n)

        def init_chain(c):
            raw0 = m_ref[pl.ds(c * SR, 1), :]
            gi0 = gbase0 + c * (SR * 128) + lane
            return (zero, zero, raw0, row_init(raw0, gi0), zero, zero,
                    jnp.int32(1), zero)

        def cond(states):
            # r < SR only: a copy left in flight at the segment's end can
            # only come from corrupt input (boundary carries restart
            # crossing matches in the next segment) — drop it.
            alive = states[0][0] < SR
            for c in range(1, W):
                alive = alive | (states[c][0] < SR)
            return alive

        def body(states):
            return tuple(step_chain(c, states[c]) for c in range(W))

        jax.lax.while_loop(cond, body,
                           tuple(init_chain(c) for c in range(W)))

    out = pl.pallas_call(
        kernel,
        grid=(G,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((W * SR, 128), lambda g: (g, 0)),
        ],
        out_specs=pl.BlockSpec((W * SR, 128), lambda g: (g, 0)),
        out_shape=jax.ShapeDtypeStruct((R, 128), jnp.int32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(jnp.asarray(base0, jnp.int32).reshape(1), arr)
    return out


def resolve_copy_machine(markers, dist_bias: int = 0,
                         interpret: bool = False,
                         base0=0, state_in: bool = False):
    """markers: flat [N] int32 dense markers, N % 128 == 0, N + base0
    <= 2^24 (packed-pointer bound). Returns [N] int32 packed state
    (callers take `& 0xFF` for bytes). base0 offsets global indices (the
    halo-chaining hook). state_in: markers are already packed state
    (re-entry after halo chaining)."""
    N = markers.shape[0]
    rows = N // 128
    arr = markers.reshape(rows, 128)

    if not state_in:
        # ---- phase 1: segment-parallel ----
        import os as _os

        # Round-5 on-chip sweep (16 MiB indexed decode wall): W=8/SR=1024
        # 4.65 s, W=16/SR=512 4.20 s, W=32/SR=256 5.42 s — more, shorter
        # chains cut the sequential step count until phase-2 boundary
        # carries overtake; W=16/SR=512 is the default.
        SR = int(_os.environ.get(
            "TPZ_RESOLVE_SR", 512))
        if rows < SR:
            SR = rows
        W = min(int(_os.environ.get("TPZ_RESOLVE_W", 16)),
                -(-rows // SR))
        if W * SR > rows and rows % SR == 0:
            W = rows // SR
        pad = (-rows) % (W * SR)
        if W == 1 and rows + pad <= SR:
            # Single segment: phase 2 alone resolves it (phase 1 would
            # be the identical pass).
            if pad:
                arr = jnp.concatenate(
                    [arr,
                     jnp.full((pad, 128), _KIND_LIT << 28, jnp.int32)])
            out = _phase_call(arr, base0, phase=1, W=1, SR=rows + pad,
                              dist_bias=dist_bias, interpret=interpret)
            return out[:rows].reshape(-1)
        arr = _inject_boundary_carries(
            arr.reshape(-1), SR * 128).reshape(rows, 128)
        if pad:
            arr = jnp.concatenate(
                [arr, jnp.full((pad, 128), _KIND_LIT << 28, jnp.int32)])
        arr = _phase_call(arr, base0, phase=1, W=W, SR=SR,
                          dist_bias=dist_bias, interpret=interpret)
    # ---- phase 2: one in-order chain over everything ----
    padded_rows = arr.shape[0]
    out = _phase_call(arr, base0, phase=2, W=1, SR=padded_rows,
                      dist_bias=dist_bias, interpret=interpret)
    return out[:rows].reshape(-1)


@functools.partial(jax.jit, static_argnames=("dist_bias", "interpret",
                                             "halo", "n_chunks"))
def _resolve_chained_fn(markers, dist_bias, interpret, halo, n_chunks):
    """Halo-chained resolve for N > PHASE2_CAP: resolve PHASE2_CAP-sized
    chunks in order; each later chunk gets the previous chunk's last
    `halo` positions re-fed as resolved state at base0 = halo so its
    backward copies land in range (LZ window <= halo)."""
    N = markers.shape[0]
    # Matches crossing a chunk cut restart as synthetic carries; their
    # dist <= the LZ window <= halo, so the restarted copy stays inside
    # the re-fed halo region.
    markers = _inject_boundary_carries(markers, PHASE2_CAP)
    outs = []
    prev_tail = None
    for k in range(n_chunks):
        lo = k * PHASE2_CAP
        hi = min(N, lo + PHASE2_CAP)
        part = jax.lax.slice(markers, (lo,), (hi,))
        if prev_tail is None:
            st = resolve_copy_machine(part, dist_bias, interpret)
        else:
            ext = jnp.concatenate([prev_tail, part])
            st = resolve_copy_machine(ext, dist_bias, interpret,
                                      base0=0, state_in=False)
            st = jax.lax.slice(st, (halo,), (halo + hi - lo,))
        outs.append((st & 0xFF).astype(jnp.uint8))
        # Next chunk's halo: the last `halo` resolved bytes as literal
        # markers (already-final => re-entering phase 1 re-resolves them
        # as self-resolved literals at local indices).
        tail = jax.lax.slice(st, (hi - lo - halo,), (hi - lo,))
        prev_tail = (jnp.int32(_KIND_LIT << 28)) | (tail & 0xFF)
    return jnp.concatenate(outs)


def resolve_dense(markers, dist_bias: int = 0, interpret: bool = False,
                  halo: int = 1 << 16):
    """Drop-in replacement for the doubling resolve: flat [N] int32
    dense markers -> [N] uint8 plaintext. Any N % 128 == 0; spans past
    PHASE2_CAP chain through the halo. halo must be >= the format's LZ
    window (64 KiB covers lh7; DEFLATE needs 32 KiB)."""
    N = markers.shape[0]
    if N <= PHASE2_CAP:
        st = resolve_copy_machine(markers, dist_bias, interpret)
        return (st & 0xFF).astype(jnp.uint8)
    n_chunks = -(-N // PHASE2_CAP)
    return _resolve_chained_fn(markers, dist_bias, interpret, halo,
                               n_chunks)
