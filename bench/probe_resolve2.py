#!/usr/bin/env python
"""Decompose the copy-machine resolve cost (round 4).

profile_decode_stages.py showed resolve = 1620 ms/8 MiB with phase 2
(the single in-order chain) at ~1300 ms ~= 20 us/row — 100x above an
issue-cost estimate of its body. This probe isolates:

  1. phase 2 FLOOR: the W=1 chain over fully-resolved state (pure
     scan+advance, no copies) at several span sizes -> per-row cost.
  2. phase 1 at SR in {1024, 2048, 4096} (same serial work, fewer
     segments) + pointer count left behind each way.
  3. phase 2 over each phase-1 output (real stop/run distribution).
  4. the old full-width doubling for the same markers, for reference.

Run: PYTHONPATH=/root/repo python bench/probe_resolve2.py [MiB]
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from tpz.utils import corpus
from tpz.codecs import deflate
from tpz.kernels import inflate_pipeline as ip
from tpz.kernels import resolve_walk as rw
from tpz.kernels.device_quirks import fetch
from tpz import oracle


def timed(label, fn, *a):
    f = jax.jit(fn)
    r = f(*a)
    fetch(jnp.sum(r & 0xFF))  # warm + sync
    t0 = time.time()
    r = f(*a)
    s = int(fetch(jnp.sum(r & 0xFF)))
    dt = time.time() - t0
    print(f"{label}: {dt*1000:.0f} ms (check {s & 0xFFFF})", flush=True)
    return r, dt


def dense_markers(mib: int):
    """Dense post-materialize markers for a real indexed stream (same
    assembly as bench/profile_decode_stages.py)."""
    from tpz import constants as C

    data = corpus.mixed(mib << 20, seed=11)
    stream, end_bits, out_lens = deflate.compress_indexed(data)
    nb = len(end_bits)
    scan = oracle.inflate_scan_headers(stream, np.asarray(end_bits))
    sb = np.frombuffer(stream, np.uint8)
    slices = np.zeros((nb, ip.SLICE_BYTES), np.uint8)
    slice_start = np.zeros(nb, np.int64)
    starts = np.concatenate([[0], np.asarray(end_bits)[:-1]])
    for b in range(nb):
        s0 = int(starts[b]) // 8
        s1 = min(len(sb), (int(end_bits[b]) + 7) // 8 + 8)
        take = min(s1 - s0, ip.SLICE_BYTES)
        slices[b, :take] = sb[s0:s0 + take]
        slice_start[b] = s0
    body_bit_local = (scan["body_bit"] - 8 * slice_start).astype(np.int32)
    walk_out_len = np.where(scan["btype"] == 0, 0,
                            np.asarray(out_lens)).astype(np.int32)
    sw = np.ascontiguousarray(slices).view("<u4").astype(np.int32)
    tab = np.concatenate([scan["lit_tab"], scan["dist_tab"]],
                         axis=1).astype(np.int32)
    markers = ip._symbol_walk(
        jnp.asarray(sw), jnp.asarray(body_bit_local),
        jnp.asarray(walk_out_len), jnp.asarray(tab),
        jnp.asarray(np.asarray(C.DEFLATE_LENGTH_BASE, np.int32)),
        jnp.asarray(np.asarray(C.DEFLATE_LENGTH_EXTRA, np.int32)),
        jnp.asarray(np.asarray(C.DEFLATE_DIST_BASE, np.int32)),
        jnp.asarray(np.asarray(C.DEFLATE_DIST_EXTRA, np.int32)),
        interpret=False, nblk=8)
    markers = ip._materialize_fn(
        markers, jnp.asarray(sw),
        jnp.asarray(scan["btype"].astype(np.int32)),
        jnp.asarray((scan["c0_pos"] - slice_start).astype(np.int32)),
        jnp.asarray(scan["c0_len"].astype(np.int32)),
        jnp.asarray((scan["c1_pos"] - slice_start).astype(np.int32)),
        jnp.asarray(np.asarray(out_lens, np.int32)))
    return markers, data


def main():
    mib = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    N = mib << 20
    rows = N // 128

    # --- 1. phase-2 floor over fully-resolved state ---
    for span_mib in (1, 4, mib):
        n = span_mib << 20
        gi = jnp.arange(n, dtype=jnp.int32)
        resolved = ((gi << 8) | 65).reshape(n // 128, 128)

        def p2(arr):
            return rw._phase_call(arr, 0, phase=2, W=1, SR=arr.shape[0],
                                  dist_bias=0, interpret=False)

        _, dt = timed(f"phase2 floor {span_mib} MiB", p2, resolved)
        print(f"  -> {dt/(n//128)*1e6:.2f} us/row", flush=True)

    # --- markers from a real stream ---
    markers, data = dense_markers(mib)
    mk = markers.reshape(-1)[:N]
    print(f"markers: {mk.shape[0]} positions", flush=True)

    # --- 2/3. phase 1 at several SR + phase 2 over its output ---
    carried = rw._inject_boundary_carries(mk, 1024 * 128)
    for SR in (1024, 2048, 4096):
        W = 8
        if rows % (W * SR):
            print(f"SR={SR}: skip (rows {rows} not divisible)", flush=True)
            continue
        car = rw._inject_boundary_carries(mk, SR * 128)
        arr = car.reshape(rows, 128)

        def p1(a):
            return rw._phase_call(a, 0, phase=1, W=W, SR=SR,
                                  dist_bias=0, interpret=False)

        st, dt1 = timed(f"phase1 SR={SR}", p1, arr)
        gi = jnp.arange(N, dtype=jnp.int32).reshape(rows, 128)
        nptr = int(fetch(jnp.sum(
            (jax.lax.shift_right_logical(st, 8) != gi).astype(jnp.int32))))
        print(f"  -> pointers left: {nptr} ({nptr/N*100:.2f}%)",
              flush=True)

        def p2b(a):
            return rw._phase_call(a, 0, phase=2, W=1, SR=rows,
                                  dist_bias=0, interpret=False)

        timed(f"phase2 after SR={SR}", p2b, st)

    # --- 4. old full-width doubling reference ---
    def doubling(flat):
        gpos = jnp.arange(N, dtype=jnp.int32)
        kind = flat >> 28
        is_start = kind == 2
        seg = jax.lax.cummax(jnp.where(is_start | (kind == 1),
                                       jnp.where(is_start, gpos, -gpos - 1),
                                       jnp.int32(-(1 << 30))))
        in_match = seg >= 0
        start = jnp.maximum(seg, 0)
        smark = flat[start]
        mlen = smark & 511
        mdist = (smark >> 9) & 0xFFFF
        inside = in_match & (gpos < start + mlen)
        k = gpos - start
        d = jnp.maximum(mdist, 1)
        src = start - mdist + (k - (k // d) * d)
        ptr = jnp.clip(jnp.where(inside, src, gpos), 0, N - 1)
        val = jnp.where(inside, 0, flat & 0xFF)
        state = (ptr.astype(jnp.uint32) << 8) | val.astype(jnp.uint32)
        self_hi = gpos.astype(jnp.uint32) << 8

        def full_round(s):
            p = (s >> 8).astype(jnp.int32)
            g = s[p]
            tgt_resolved = (g >> 8) == (s >> 8)
            return jnp.where(tgt_resolved,
                             self_hi | (g & jnp.uint32(0xFF)),
                             g & jnp.uint32(0xFFFFFF00))

        def cond(c):
            s, n = c
            return (n < 24) & ~jnp.all(
                (s & jnp.uint32(0xFFFFFF00)) == self_hi)

        state, nr = jax.lax.while_loop(
            cond, lambda c: (full_round(c[0]), c[1] + 1),
            (state, jnp.int32(0)))
        return (state & jnp.uint32(0xFF)).astype(jnp.int32) | (nr << 16)

    r, _ = timed("old full-width doubling", doubling, mk)
    print(f"  rounds: {int(fetch(r[0])) >> 16}", flush=True)

    # correctness cross-check of the production resolve
    out = rw.resolve_dense(mk, dist_bias=0)
    got = bytes(np.asarray(fetch(out)))
    print("copy-machine output matches:", got == bytes(data[:N]),
          flush=True)


if __name__ == "__main__":
    main()
