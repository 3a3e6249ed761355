#!/usr/bin/env python
"""Full stage split of the indexed device DEFLATE decode at N MiB.

profile_decode.py times walk vs whole-wall; this script accounts for
EVERY millisecond: host prep (scan + numpy assembly), h2d per operand,
walk, materialize, resolve (current schedule vs pure full-width vs
full-until-small-then-tier), d2h fetch, and the mop-up round count.

Run: PYTHONPATH=/root/repo python bench/profile_decode_stages.py [MiB]
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
from tpz.kernels.device_quirks import fetch
from tpz import oracle, constants as C


def t(label, fn, *a, **k):
    r = fn(*a, **k)
    jax.block_until_ready(r)
    t0 = time.time()
    r = fn(*a, **k)
    jax.block_until_ready(r)
    print(f"{label}: {(time.time()-t0)*1000:.0f} ms", flush=True)
    return r


def resolve_variant(markers_flat, schedule):
    """Local resolve twin with a configurable tier schedule + round
    counter. schedule: 'current' | 'full' | 'late-tier'."""
    flat = markers_flat
    N = flat.shape[0]
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

    def compact(s, P):
        unres = (s & jnp.uint32(0xFFFFFF00)) != self_hi
        _, poss = jax.lax.sort(
            ((~unres).astype(jnp.int32), gpos), dimension=0, num_keys=1)
        return poss[:P]

    def tier_rounds(s, pos_c, nrounds):
        def one(_, carry):
            s, st_c = carry
            p = (st_c >> 8).astype(jnp.int32)
            g = s[p]
            tgt_res = (g >> 8) == (st_c >> 8)
            st_n = jnp.where(
                tgt_res,
                (pos_c.astype(jnp.uint32) << 8) | (g & jnp.uint32(0xFF)),
                g & jnp.uint32(0xFFFFFF00))
            return s.at[pos_c].set(st_n), st_n

        s, _ = jax.lax.fori_loop(0, nrounds, one, (s, s[pos_c]))
        return s

    nrounds0 = jnp.int32(0)
    if schedule == "current":
        state = full_round(full_round(state))
        if N >= (1 << 20):
            pos1 = compact(state, N // 4)
            state = tier_rounds(state, pos1, 3)
            pos2 = compact(state, N // 16)
            state = tier_rounds(state, pos2, 8)
        nrounds0 = jnp.int32(2 + 3 + 8)
    elif schedule == "late-tier":
        # full rounds while unresolved > N/16, then tier to the end
        def cond(c):
            s, n = c
            unres = (s & jnp.uint32(0xFFFFFF00)) != self_hi
            return (jnp.sum(unres.astype(jnp.int32)) > N // 16) & (n < 24)

        state, nrounds0 = jax.lax.while_loop(
            cond, lambda c: (full_round(c[0]), c[1] + 1),
            (state, jnp.int32(0)))
        pos2 = compact(state, N // 16)
        state = tier_rounds(state, pos2, 10)
        nrounds0 = nrounds0 + 10

    def cond(c):
        s, n = c
        return ~jnp.all((s & jnp.uint32(0xFFFFFF00)) == self_hi)

    state, nr = jax.lax.while_loop(
        cond, lambda c: (full_round(c[0]), c[1] + 1),
        (state, nrounds0))
    return (state & jnp.uint32(0xFF)).astype(jnp.uint8), nr


def main():
    mib = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    size = mib << 20
    data = corpus.mixed(size, seed=11)
    print(f"encoding {mib} MiB (device, indexed)...", flush=True)
    stream, end_bits, out_lens = deflate.compress_indexed(bytes(data), backend="tpu")

    # --- host prep (the decompress_many_indexed preamble) ---
    t0 = time.time()
    nb = len(end_bits)
    scan = oracle.inflate_scan_headers(stream, np.asarray(end_bits))
    t_scan = time.time() - t0
    t0 = time.time()
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
    t_prep = time.time() - t0
    print(f"host scan: {t_scan*1000:.0f} ms, numpy prep: "
          f"{t_prep*1000:.0f} ms", flush=True)

    # --- h2d per operand ---
    for name, arr in (("sw", sw), ("tab", tab), ("slices", slices)):
        jax.block_until_ready(jax.device_put(arr))
        t0 = time.time()
        jax.block_until_ready(jax.device_put(arr))
        print(f"h2d {name} ({arr.nbytes/1e6:.0f} MB): "
              f"{(time.time()-t0)*1000:.0f} ms", flush=True)

    d = {
        "sw": jnp.asarray(sw),
        "bb": jnp.asarray(body_bit_local),
        "wol": jnp.asarray(walk_out_len),
        "tab": jnp.asarray(tab),
        "lb": jnp.asarray(np.asarray(C.DEFLATE_LENGTH_BASE, np.int32)),
        "le": jnp.asarray(np.asarray(C.DEFLATE_LENGTH_EXTRA, np.int32)),
        "db": jnp.asarray(np.asarray(C.DEFLATE_DIST_BASE, np.int32)),
        "de": jnp.asarray(np.asarray(C.DEFLATE_DIST_EXTRA, np.int32)),
        "sl": jnp.asarray(slices),
        "bt": jnp.asarray(scan["btype"].astype(np.int32)),
        "c0p": jnp.asarray((scan["c0_pos"] - slice_start).astype(np.int32)),
        "c0l": jnp.asarray(scan["c0_len"].astype(np.int32)),
        "c1p": jnp.asarray((scan["c1_pos"] - slice_start).astype(np.int32)),
        "ol": jnp.asarray(np.asarray(out_lens, np.int32)),
    }

    walk = jax.jit(lambda: ip._symbol_walk(
        d["sw"], d["bb"], d["wol"], d["tab"],
        d["lb"], d["le"], d["db"], d["de"], interpret=False, nblk=8))
    markers = t("walk (nblk=8)", walk)

    mat = jax.jit(lambda m: ip._materialize_fn(
        m, d["sw"], d["bt"], d["c0p"], d["c0l"], d["c1p"], d["ol"]))
    markers = t("materialize", mat, markers)
    mflat = markers.reshape(-1)

    cur = jax.jit(lambda m: ip._resolve_fn(m))
    out = t("resolve current", cur, mflat)

    for sched in ("current", "full", "late-tier"):
        fn = jax.jit(lambda m, s=sched: resolve_variant(m, s))
        o, nr = t(f"resolve[{sched}]", fn, mflat)
        print(f"  rounds={int(fetch(nr))}", flush=True)
        assert bool(jnp.all(o == out))

    t0 = time.time()
    flat = np.asarray(fetch(out))
    print(f"d2h out ({flat.nbytes/1e6:.0f} MB): "
          f"{(time.time()-t0)*1000:.0f} ms", flush=True)
    n_out = int(np.sum(out_lens))
    got = flat[:n_out].tobytes()
    print("bytes ok:", got == (data if isinstance(data, bytes)
                               else bytes(data)), flush=True)


if __name__ == "__main__":
    main()
