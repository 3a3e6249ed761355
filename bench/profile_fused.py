"""Stage profile of the fused DEFLATE encode via checkpoint differences.

Each timing target is a jitted PREFIX of the fused pipeline that reduces
its live intermediates to one scalar (so d2h is 4 bytes, not 100 MB), and
every iteration feeds fresh input bytes (the axon relay dedups identical
(program, input) dispatches — BASELINE.md methodology). Stage cost =
difference between consecutive prefixes.

Usage: PYTHONPATH="/root/repo:$PYTHONPATH" python bench/profile_fused.py
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from tpz.kernels import bitpack
from tpz.kernels import deflate_pipeline as dp
from tpz.kernels.matchfinder import BLOCK, FWD_PAD, WINDOW
from tpz.utils import corpus


def _csum(*xs):
    tot = jnp.zeros((), jnp.int32)
    for x in xs:
        tot = tot + jnp.sum(jax.lax.bitcast_convert_type(
            x.astype(jnp.int32) if x.dtype != jnp.int32 else x, jnp.int32))
    return tot


def build_prefix(stage, k, lazy, screen_bytes, max_lazy, nb, cap_words,
                 tables):
    from tpz.kernels.deflate_plan_device import plan_device
    from tpz.kernels.matchfinder import suffix_screen_w
    from tpz.kernels.parse import parse_extend_pallas_v3y, parse_extend_v3z

    sl = slice(WINDOW, WINDOW + BLOCK)
    restart = 16384  # DeflateConfig.restart
    parse_variant = os.environ.get("TPZ_PARSE", "v3z")

    @jax.jit
    def fn(span, span_off, span_len, block_len, buf_start, bfinal, out_buf,
           tabs):
        words = dp._make_words(span)
        if stage == 0:
            return _csum(words)
        pk1, pk2, cap_at = suffix_screen_w(
            words, span_off, span_len, k, WINDOW, BLOCK, 258, screen_bytes,
            restart)
        if stage == 1:
            return _csum(pk1, pk2)
        words_i32 = jax.lax.bitcast_convert_type(words, jnp.int32)
        walk = (parse_extend_v3z if parse_variant == "v3z"
                else parse_extend_pallas_v3y)
        reach, mlen, mdist = walk(
            pk1[:, sl], pk2[:, sl], cap_at[:, sl], words_i32,
            block_len[:, None], WINDOW, 258, screen_bytes,
            lazy=lazy, max_lazy=max_lazy, restart=restart)
        if stage == 2:
            return _csum(reach, mlen, mdist)
        NB = words.shape[0]
        pos = jax.lax.broadcasted_iota(jnp.int32, (NB, BLOCK), 1)
        is_token = (reach > 0) & (pos < block_len[:, None])
        data_block = (words[:, sl] & jnp.uint32(0xFF)).astype(jnp.int32)
        is_match = is_token & (mlen > 0)
        lsym, _, _ = bitpack.length_symbol(jnp.clip(mlen, 0, 258))
        lit_sym = jnp.where(is_match, lsym, data_block)
        dsym, _, _ = bitpack.dist_symbol(jnp.maximum(mdist, 1))
        lit_hist = dp._hist_by_sort(
            jnp.where(is_token, jnp.clip(lit_sym, 0, 287), 288), 288)
        dist_hist = dp._hist_by_sort(
            jnp.where(is_match, jnp.clip(dsym, 0, 29), 30), 30)
        if stage == 3:
            return _csum(lit_hist, dist_hist)
        lit_hist = lit_hist.at[:, 256].set(0)
        plan = plan_device(lit_hist, dist_hist, block_len, buf_start,
                           bfinal, tabs, live=block_len > 0)
        if stage == 4:
            return _csum(plan["body_off"], plan["end_pos"], plan["btype"])
        table320 = jnp.concatenate(
            [plan["lit_cl"], plan["dist_cl"],
             jnp.zeros((NB, 2), jnp.int32)], axis=1)
        out = bitpack.assemble_stream_v2(
            data_block, is_token, mlen, mdist, table320, plan["body_off"],
            plan["btype"], block_len, plan["chunk1_off"],
            (plan["hdr_vals"], plan["hdr_nbits"], plan["hdr_offs"]),
            out_buf)
        return _csum(out) + _csum(plan["end_pos"])

    return fn


STAGE_NAMES = ["make_words", "suffix_screen", "walk", "histograms",
               "plan_device", "assemble_v2"]


def main():
    size = int(os.environ.get("TPZ_BENCH_BYTES", 16 << 20))
    iters = int(os.environ.get("TPZ_PROF_ITERS", 3))
    from tpz.codecs.deflate import DeflateConfig

    cfg = DeflateConfig(level=int(os.environ.get("TPZ_PROF_LEVEL", "6")))
    k, lazy = cfg.max_chain, cfg.lazy
    screen_bytes, max_lazy = cfg.screen_bytes, cfg.max_lazy
    print(f"profile: {size>>20} MiB, k={k}, lazy={lazy}, "
          f"screen_bytes={screen_bytes}")

    nb = (size + BLOCK - 1) // BLOCK
    span_off = jnp.asarray(np.arange(nb, dtype=np.int32) * BLOCK)
    span_len = jnp.asarray(np.full(nb, size, np.int32))
    block_len = jnp.asarray(np.minimum(
        size - np.arange(nb) * BLOCK, BLOCK).astype(np.int32))
    buf_start = jnp.asarray(np.eye(1, nb, 0, dtype=bool).ravel())
    bfinal = jnp.asarray(np.eye(1, nb, nb - 1, dtype=bool).ravel())
    cap_words = (9 * size + 31) // 32 + 3 * nb + 16
    cap_words = (cap_words + (1 << 16) - 1) >> 16 << 16
    out_buf = jnp.zeros((cap_words + 2,), jnp.uint32)

    from tpz.kernels.deflate_plan_device import plan_tables

    tables = {kk: jnp.asarray(v) for kk, v in plan_tables().items()}

    def make_span(seed):
        data = corpus.mixed(size, seed=seed)
        span = np.zeros(WINDOW + nb * BLOCK + FWD_PAD, dtype=np.uint8)
        span[WINDOW:WINDOW + size] = np.frombuffer(data, np.uint8)
        return jnp.asarray(span)

    spans = [make_span(100 + i) for i in range(iters)]
    warm_span = make_span(7)

    prev = 0.0
    results = []
    for stage in range(6):
        fn = build_prefix(stage, k, lazy, screen_bytes, max_lazy, nb,
                          cap_words, tables)
        # warm-up/compile (untimed)
        r = fn(warm_span, span_off, span_len, block_len, buf_start, bfinal,
               out_buf, tables)
        jax.block_until_ready(r)
        float(jax.device_get(r))
        ts = []
        for i in range(iters):
            t0 = time.time()
            r = fn(spans[i], span_off, span_len, block_len, buf_start,
                   bfinal, out_buf, tables)
            float(jax.device_get(r))
            ts.append(time.time() - t0)
        ts.sort()
        med = ts[len(ts) // 2]
        results.append(med)
        print(f"prefix<={STAGE_NAMES[stage]:14s} {med*1e3:8.1f} ms  "
              f"(delta {1e3*(med-prev):8.1f} ms)  min {ts[0]*1e3:.1f}")
        prev = med


if __name__ == "__main__":
    main()
