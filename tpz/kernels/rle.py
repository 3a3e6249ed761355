"""RLE1 / RLE2 run-length scan kernels (SURVEY.md §2.1 BZip2 row:
"RLE1/RLE2 as run-length scan kernels").

Both are formulated as segmented scans — run boundaries by neighbor
compare, run starts by cummax, in-run offsets by subtraction — followed by
a prefix-sum + scatter compaction. The production bzip2 pipeline keeps
these on the C++ host path (byte-serial RLE at memory speed beats the
scatter compaction on current hardware); the kernels serve the fused
all-device pipeline and are differential-tested against the C++ oracle.

RLE1 (bzip2 pre-pass): maximal byte runs recut into <=259-byte units; a
unit of length >= 4 emits 4 bytes + a count byte (len-4), shorter units
emit their bytes verbatim — identical to cpp/bzip2.cc Rle1Units.

RLE2 digits: a zero run of length m emits floor(log2(m+1)) RUNA/RUNB
symbols where digit i is bit i of (m+1) (0 -> RUNA, 1 -> RUNB) — the
bijective base-2 code.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _run_starts(x: jax.Array):
    """x: [NB, n]. Returns (is_start [NB,n] bool, start_idx [NB,n] int32 --
    index of the current maximal run's first position)."""
    NB, n = x.shape
    prev = jnp.roll(x, 1, axis=1)
    is_start = jnp.concatenate(
        [jnp.ones((NB, 1), bool), (x != prev)[:, 1:]], axis=1)
    idx = jax.lax.broadcasted_iota(jnp.int32, (NB, n), 1)
    start_idx = jax.lax.cummax(jnp.where(is_start, idx, -1), axis=1)
    return is_start, start_idx


@jax.jit
def rle1_encode(d: jax.Array, length: jax.Array):
    """d: [NB, n] int32 bytes; length: [NB]. Returns (out [NB, n+pad]
    int32 RLE1 bytes, out_len [NB]) — bzip2 pre-pass, unit-for-unit equal
    to the C++ oracle."""
    NB, n = d.shape
    idx = jax.lax.broadcasted_iota(jnp.int32, (NB, n), 1)
    live = idx < length[:, None]
    dm = jnp.where(live, d, -1 - idx)  # unique values kill runs in padding
    _, start_idx = _run_starts(dm)
    # Run length at every position: scatter-max of (idx+1) at start-of-next
    # run is complex; instead compute via the NEXT run start.
    j = idx - start_idx                       # offset in maximal run
    # maximal run length: distance to next start (suffix trick): compute
    # next_start via reverse cummin of start positions.
    is_start, _ = _run_starts(dm)
    nxt = jnp.where(is_start, idx, n)
    next_start = jnp.flip(jax.lax.cummin(
        jnp.flip(jnp.where(is_start, idx, jnp.int32(n)), axis=1), axis=1),
        axis=1)
    # next_start[i] = first start > i: shift the reverse-cummin by one.
    next_start = jnp.concatenate(
        [next_start[:, 1:], jnp.full((NB, 1), n, jnp.int32)], axis=1)
    run_len = next_start - start_idx
    u_pos = j % 259
    u_len = jnp.minimum(259, run_len - (j - u_pos))
    is_countpos = (u_pos == 3) & (u_len >= 4)
    emit = jnp.where(live,
                     jnp.where(u_pos < 4, 1, 0) + is_countpos.astype(jnp.int32),
                     0)
    offs = jnp.cumsum(emit, axis=1) - emit
    out_len = offs[:, -1] + emit[:, -1]
    cap = n + (n // 4) + 8
    out = jnp.zeros((NB, cap + 1), jnp.int32)
    nbidx = jax.lax.broadcasted_iota(jnp.int32, (NB, n), 0)
    # byte slot
    o0 = jnp.where(live & (u_pos < 4), offs, cap)
    out = out.at[nbidx, o0].max(d, mode="drop")
    # count slot (after the 4th byte)
    o1 = jnp.where(live & is_countpos, offs + 1, cap)
    out = out.at[nbidx, o1].max(jnp.clip(u_len - 4, 0, 255), mode="drop")
    return out[:, :cap], out_len


@jax.jit
def rle2_encode(r: jax.Array, length: jax.Array):
    """r: [NB, n] int32 MTF ranks; length: [NB]. Returns (syms [NB, n+pad]
    int32 RLE2 symbols with RUNA=0/RUNB=1 and v -> v+1, sym_len [NB]).
    EOB is appended by the caller.

    Round-3 rewrite: the old kernel expanded a run's RUNA/RUNB digits with
    21 masked scatters (~400 M priced updates per 16 MiB). A run of length
    m emits nd = bit_length(m+1)-1 <= m digits, so digit i can ride the
    run's i-th zero POSITION instead: every position emits at most one
    symbol, offsets are a per-row monotone unique sequence, and one
    inverse-permutation sort places the whole stream."""
    NB, n = r.shape
    idx = jax.lax.broadcasted_iota(jnp.int32, (NB, n), 1)
    live = idx < length[:, None]
    is_zero = live & (r == 0)
    prevz = jnp.concatenate(
        [jnp.zeros((NB, 1), bool), is_zero[:, :-1]], axis=1)
    zstart = is_zero & ~prevz
    start_idx = jax.lax.cummax(jnp.where(zstart, idx, -1), axis=1)
    nxt_zero = jnp.concatenate(
        [is_zero[:, 1:], jnp.zeros((NB, 1), bool)], axis=1)
    run_end = is_zero & ~nxt_zero
    # Broadcast each run's end index back over the run (reverse cummin).
    end_idx = jnp.flip(jax.lax.cummin(
        jnp.flip(jnp.where(run_end, idx, jnp.int32(n)), axis=1), axis=1),
        axis=1)
    m = end_idx - start_idx + 1      # full zero-run length, at every zero
    mp1 = m + 1
    # nd = bit_length(m+1) - 1 via integer compares (float log2 rounds).
    nd = jnp.zeros_like(m)
    for k in range(1, 22):
        nd = nd + (mp1 >= (1 << k)).astype(jnp.int32)
    j = idx - start_idx              # offset of this zero within its run
    emit_digit = is_zero & (j < nd)
    emit_plain = live & ~is_zero
    emit = emit_plain | emit_digit
    val = jnp.where(emit_plain, r + 1,
                    jnp.where(emit_digit, (mp1 >> j) & 1, 0))
    emit_i = emit.astype(jnp.int32)
    offs = jnp.cumsum(emit_i, axis=1) - emit_i
    sym_len = offs[:, -1] + emit_i[:, -1]
    cap = n + 8
    # Place by sort: emitter offsets are unique and ascending per row;
    # non-emitters park past them (n + idx keeps keys unique).
    key = jnp.where(emit, offs, n + idx)
    _, out = jax.lax.sort((key, val), dimension=1, num_keys=1)
    return jnp.concatenate(
        [out, jnp.zeros((NB, cap - n), jnp.int32)], axis=1), sym_len


def mtf_rle2_reference(last: np.ndarray) -> list[int]:
    """Sequential numpy reference of MTF+RLE2 (twin of cpp/bzip2.cc) for
    kernel tests."""
    used = sorted(set(last.tolist()))
    order = list(range(len(used)))
    to_seq = {b: i for i, b in enumerate(used)}
    out = []
    zero_run = 0

    def flush():
        nonlocal zero_run
        m = zero_run
        i = 0
        mp1 = m + 1
        nd = mp1.bit_length() - 1
        for i in range(nd):
            out.append((mp1 >> i) & 1)
        zero_run = 0

    for b in last.tolist():
        v = to_seq[b]
        j = order.index(v)
        if j == 0:
            zero_run += 1
            continue
        if zero_run:
            flush()
        order.pop(j)
        order.insert(0, v)
        out.append(j + 1)
    if zero_run:
        flush()
    return out
