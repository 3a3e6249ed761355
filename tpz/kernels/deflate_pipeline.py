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
from tpz.kernels.device_quirks import fetch
from tpz.kernels.matchfinder import BLOCK, FWD_PAD, WINDOW, find_matches
from tpz.kernels.parse import greedy_parse

# Single-batch limit for int32 bit offsets: worst case (incompressible ->
# stored blocks) costs just over 8 bits/byte, so bound at 9 bits/byte to
# keep 32*total_words + 31 inside int32 (ADVICE r1: 1<<28 was ~0.4% over).
MAX_SPAN = (2**31 - 1) // 9
# Single fused-invocation span bound. The screen sort used to cost
# ~0.4 GB HBM per MiB of span (64 MiB wanted ~27 GB and OOMed this
# 16 GB chip); round 3's lax.map chunking removed that term, but the
# bound stays at the measured-safe 32 MiB until the bigger span is
# re-validated on hardware (override: TPZ_MAX_DEVICE_SPAN). Bigger
# batches split into sequential dispatches (compress_many).
import os as _os

MAX_DEVICE_SPAN = int(_os.environ.get("TPZ_MAX_DEVICE_SPAN", 32 << 20))


def _axon_relay_down() -> bool:
    """True when jax is configured for the axon relay backend but the
    relay socket is not accepting connections. In that state
    ``jax.devices()`` HANGS retrying inside the PJRT plugin instead of
    raising (observed when the relay process dies mid-session), so
    ``usable()`` must answer from a cheap socket probe, not from jax.
    A live-socket probe also catches the relay dying mid-process, when
    ``jax.devices()`` would keep returning its cached device list while
    every dispatch stalls."""
    import os
    import socket

    try:
        plats = jax.config.jax_platforms or ""
    except Exception:
        plats = os.environ.get("JAX_PLATFORMS", "")
    if "axon" not in plats:
        return False
    port = int(os.environ.get("TPZ_AXON_PROBE_PORT", 8082))
    try:
        with socket.create_connection(("127.0.0.1", port), timeout=2.0):
            return False
    except OSError:
        return True


# Compute-liveness state for _axon_compute_hung(): (verdict_ts, hung).
# Guarded by _probe_lock; the probe thread reference dedups concurrent
# probes (at most one exists at a time, so a half-dead relay cannot leak
# a thread per call). _probe_warm flips after the first completed probe:
# the first dispatch of a fresh process on this relay takes minutes
# (measured 221 s cold vs 0.5 s warm, VERDICT r4 weak #2), so only
# SUBSEQUENT probes get the short deadline. _shutdown makes a parked
# probe thread exit its polling loop at interpreter teardown instead of
# blocking inside the runtime (round-4 "FATAL: exception not rethrown").
_probe_lock = None
_probe_state = [0.0, False]
_probe_thread = [None]
_probe_warm = [False]
_shutdown = [False]


def _stamp_path() -> str:
    import os

    base = os.environ.get(
        "TPZ_COMPILE_CACHE_DIR",
        os.path.join(os.path.expanduser("~"), ".cache", "tpz_xla"))
    return os.path.join(base, "relay_health.json")


def _write_stamp(cold_seconds: float) -> None:
    """Record a successful relay validation (next to the compile cache)
    so later processes can report/expect the measured cold-dispatch
    time instead of re-deriving the cold-vs-dead distinction."""
    import json
    import os
    import time

    try:
        path = _stamp_path()
        os.makedirs(os.path.dirname(path), exist_ok=True)
        with open(path, "w") as f:
            json.dump({"ts": time.time(), "cold_seconds": cold_seconds}, f)
    except OSError:
        pass


def _axon_compute_hung() -> bool:
    """True when the axon relay accepts connections but COMPUTE is hung
    or degraded past serving usefulness (observed 2026-08-19: socket up,
    tiny dispatch 11 s, 8-element d2h fetch 77 s — vs <2 s healthy).
    The socket probe in _axon_relay_down() cannot see this state, and a
    caller that routes "auto" onto such a relay blocks for minutes.

    Strategy: once per TTL, run one tiny dispatch in a daemon thread
    that POLLS result readiness (never blocks inside the runtime) and
    wait up to TPZ_AXON_COMPUTE_DEADLINE seconds (default 20; a healthy
    warm relay answers in well under 2). The FIRST probe of a process is
    exempt: a cold dispatch on this relay measures minutes on a healthy
    chip (221 s, VERDICT r4), so it gets TPZ_AXON_COLD_DEADLINE (default
    900) — cold must not be conflated with dead. On timeout the backend
    is marked hung until a LATER probe completes — the parked thread
    itself flips the verdict back the moment the relay recovers, so
    recovery is observed without spawning new threads."""
    import atexit
    import os
    import threading
    import time

    global _probe_lock
    if _probe_lock is None:
        _probe_lock = threading.Lock()
        atexit.register(lambda: _shutdown.__setitem__(0, True))
    ttl = float(os.environ.get("TPZ_AXON_COMPUTE_TTL", 300.0))
    warm_deadline = float(os.environ.get("TPZ_AXON_COMPUTE_DEADLINE", 20.0))
    cold_deadline = float(os.environ.get("TPZ_AXON_COLD_DEADLINE", 900.0))
    now = time.time()
    with _probe_lock:
        deadline = warm_deadline if _probe_warm[0] else cold_deadline
        fresh = (now - _probe_state[0]) < ttl
        if fresh and _probe_state[1]:
            return True
        if fresh and not _probe_state[1]:
            return False
        if _probe_thread[0] is not None and _probe_thread[0].is_alive():
            return True  # previous probe still stuck -> still hung
        done = threading.Event()
        t_start = time.time()

        def _probe():
            ok = False
            try:
                import numpy as _np

                v = jnp.arange(3, dtype=jnp.int32) + 1
                # Poll readiness instead of a blocking fetch: a thread
                # blocked inside the runtime at interpreter exit crashes
                # teardown (round-4 weak #9). Park at most 2x the cold
                # deadline, and bail out the moment atexit fires.
                t_end = time.time() + 2 * cold_deadline
                ready = not hasattr(v, "is_ready")
                while (not ready and time.time() < t_end
                       and not _shutdown[0]):
                    ready = v.is_ready()
                    if not ready:
                        time.sleep(0.05)
                if ready and not _shutdown[0]:
                    ok = int(_np.asarray(v)[2]) == 3
            except Exception:
                ok = False
            with _probe_lock:
                _probe_state[0] = time.time()
                _probe_state[1] = not ok
                _probe_thread[0] = None
                if ok:
                    was_warm = _probe_warm[0]
                    _probe_warm[0] = True
                else:
                    was_warm = True
            if ok and not was_warm:
                _write_stamp(time.time() - t_start)
            done.set()

        t = threading.Thread(target=_probe, daemon=True,
                             name="tpz-axon-compute-probe")
        _probe_thread[0] = t
        t.start()
    finished = done.wait(deadline)
    if not finished:
        with _probe_lock:
            # Leave _probe_thread set: its eventual completion records
            # the recovery timestamp and verdict.
            _probe_state[0] = time.time()
            _probe_state[1] = True
        return True
    with _probe_lock:
        return _probe_state[1]


def usable(explicit: bool = False) -> bool:
    """Whether the device pipelines can serve.

    explicit=True is for backend="tpu" requests: they must always
    ATTEMPT the device rather than trust a (possibly stale, possibly
    cold-conflated) liveness verdict (VERDICT r4 next item 3) — only the
    cheap definitive checks (oracle built, relay socket up, backend
    init) gate an explicit request."""
    import os

    if os.environ.get("TPZ_FORCE_ORACLE"):
        return False  # e.g. the ASan CI pass: jaxlib is not sanitizer-clean
    try:
        from tpz import oracle

        if not oracle.available():
            return False
        if _axon_relay_down():
            return False
        jax.devices()  # raises if the backend cannot initialize
        try:
            plats = jax.config.jax_platforms or ""
        except Exception:
            plats = os.environ.get("JAX_PLATFORMS", "")
        if not explicit and "axon" in plats and _axon_compute_hung():
            return False
        return True
    except Exception:
        return False


@jax.jit
def _make_words(span_u8: jax.Array):
    """span_u8: [WINDOW + nb*BLOCK + FWD_PAD] uint8 (leading WINDOW and
    trailing FWD_PAD are zero padding). Builds the haloed [nb, M_TOTAL]
    matrix of u32 little-endian 4-byte windows with pure shifts/reshapes —
    no gathers, no separate int32 byte matrix (byte at p = w & 0xFF), and
    the 4-byte windows are computed on the 1-D span so they are exact even
    across row boundaries.

    Relies on WINDOW == BLOCK/2 and FWD_PAD <= BLOCK."""
    d = span_u8.astype(jnp.uint32)
    w = (d | (jnp.roll(d, -1) << 8) | (jnp.roll(d, -2) << 16)
         | (jnp.roll(d, -3) << 24))
    nb = (span_u8.shape[0] - WINDOW - FWD_PAD) // BLOCK
    base = w[WINDOW:WINDOW + nb * BLOCK].reshape(nb, BLOCK)
    # Halo/pad columns re-slice the same 1-D word array, so every word
    # reflects its true span context (row 0's halo words come from the
    # span's leading zero padding).
    prev_tail = jnp.concatenate(
        [w[:WINDOW][None, :], base[:-1, BLOCK - WINDOW:]], axis=0)
    next_head = jnp.concatenate(
        [base[1:, :FWD_PAD], jnp.zeros((1, FWD_PAD), w.dtype)], axis=0)
    return jnp.concatenate([prev_tail, base, next_head], axis=1)


def _stage1_core(words: jax.Array, span_off: jax.Array, span_len: jax.Array,
                 block_len: jax.Array, k: int, use_pallas: bool = False,
                 lazy: bool = False, suffix: bool = False,
                 screen_bytes: int = 16, max_lazy: int = 258,
                 restart: int = 0, parse: str = "v3y"):
    """words: [NB, M_TOTAL] u32 haloed 4-byte windows (byte = w & 0xFF).

    suffix=True runs parse spec v3 (suffix-space candidates, top-2
    extension, max_lazy — cpp/lzss.cc suffix_mode); False runs the v1
    hash screen (still used by LZHUF)."""
    NB = words.shape[0]
    if suffix and use_pallas:
        from tpz.kernels.parse import (parse_extend_pallas_v3y,
                                       parse_extend_v3z)

        from tpz.kernels.matchfinder import suffix_screen_w_chunked

        pk1, pk2, cap_at = suffix_screen_w_chunked(
            words, span_off, span_len, k, WINDOW, BLOCK, 258,
            screen_bytes, restart)
        words_i32 = jax.lax.bitcast_convert_type(words, jnp.int32)
        sl = slice(WINDOW, WINDOW + BLOCK)
        # parse="v3z" (the DEFAULT since the round-5 chip A/B: 11.3x
        # over v3y at 8 MiB, byte-identical — BASELINE.md round 5)
        # selects the lane-parallel walk; "v3y" keeps the scalar-chain
        # Pallas walk. It is a STATIC arg (env read at the dispatch
        # wrapper) so A/B switches retrace instead of hitting the cache.
        if parse == "v3z":
            reach, mlen, mdist = parse_extend_v3z(
                pk1[:, sl], pk2[:, sl], cap_at[:, sl], words_i32,
                block_len[:, None], WINDOW, 258, screen_bytes,
                lazy=lazy, max_lazy=max_lazy, restart=restart)
        else:
            reach, mlen, mdist = parse_extend_pallas_v3y(
                pk1[:, sl], pk2[:, sl], cap_at[:, sl], words_i32,
                block_len[:, None], WINDOW, 258, screen_bytes,
                lazy=lazy, max_lazy=max_lazy, restart=restart)
        pos = jax.lax.broadcasted_iota(jnp.int32, (NB, BLOCK), 1)
        is_token = (reach > 0) & (pos < block_len[:, None])
        cum = jnp.cumsum(is_token.astype(jnp.int32), axis=1)
        ntokens = cum[:, -1]
    elif suffix:
        from tpz.kernels.matchfinder import find_matches_v3

        mlen, mdist = find_matches_v3(
            words, span_off, span_len, k, screen_bytes=screen_bytes,
            lazy=lazy, max_lazy=max_lazy, restart=restart)
        is_token, token_idx, ntokens = greedy_parse(mlen, mdist, block_len,
                                                    use_pallas=False)
    elif use_pallas:
        # v1 fused path: hash screening in XLA, then parse+extension in one
        # Pallas walk.
        from tpz.kernels.matchfinder import screen_candidates_w
        from tpz.kernels.parse import parse_extend_pallas

        bj, bs, _, _ = screen_candidates_w(
            words, span_off, span_len, k, WINDOW, BLOCK, 258)
        words_i32 = jax.lax.bitcast_convert_type(words, jnp.int32)
        reach, mlen = parse_extend_pallas(
            bs[:, WINDOW:WINDOW + BLOCK], bj[:, WINDOW:WINDOW + BLOCK],
            words_i32, block_len[:, None], WINDOW, lazy=lazy)
        pos = jax.lax.broadcasted_iota(jnp.int32, (NB, BLOCK), 1)
        is_token = (reach > 0) & (pos < block_len[:, None])
        mdist = jnp.where(mlen > 0,
                          pos + WINDOW - bj[:, WINDOW:WINDOW + BLOCK], 0)
        cum = jnp.cumsum(is_token.astype(jnp.int32), axis=1)
        ntokens = cum[:, -1]
    else:
        data = (words & jnp.uint32(0xFF)).astype(jnp.int32)
        mlen, mdist = find_matches(data, span_off, span_len, k=k)
        is_token, token_idx, ntokens = greedy_parse(mlen, mdist, block_len,
                                                    use_pallas=False)

    data_block = (words[:, WINDOW:WINDOW + BLOCK]
                  & jnp.uint32(0xFF)).astype(jnp.int32)
    is_match = is_token & (mlen > 0)
    lsym, _, _ = bitpack.length_symbol(jnp.clip(mlen, 0, 258))
    lit_sym = jnp.where(is_match, lsym, data_block)
    dsym, _, _ = bitpack.dist_symbol(jnp.maximum(mdist, 1))

    lit_hist = _hist_by_sort(
        jnp.where(is_token, jnp.clip(lit_sym, 0, 287), 288), 288)
    dist_hist = _hist_by_sort(
        jnp.where(is_match, jnp.clip(dsym, 0, 29), 30), 30)
    return mlen, mdist, is_token, lit_hist, dist_hist, ntokens


def _hist_by_sort(sym: jax.Array, nbins: int) -> jax.Array:
    """Per-row histogram via 1-key sort + branchless vectorized binary
    search: hist[k] = lower_bound(k+1) - lower_bound(k) on the sorted row.

    XLA scatter costs per UPDATE (~0.14 G/s on this chip, BASELINE.md), so
    the two [NB, BLOCK] scatter-add histograms cost ~33 M updates per
    16 MiB; a single-array sort (~1 G keys/s) plus ceil(log2 B) rounds of
    [NB, nbins+1] gathers is ~3x cheaper at this geometry. Masked-out
    positions must be pre-set to `nbins` (they sort last, never counted)."""
    NB, B = sym.shape
    s = jax.lax.sort(sym, dimension=1)
    k = jnp.arange(nbins + 1, dtype=jnp.int32)[None, :]
    k = jnp.broadcast_to(k, (NB, nbins + 1))
    lb = jnp.zeros((NB, nbins + 1), jnp.int32)
    for bit in reversed(range(B.bit_length())):
        cand = lb + (1 << bit)
        v = jnp.take_along_axis(s, jnp.minimum(cand, B) - 1, axis=1)
        lb = jnp.where((cand <= B) & (v < k), cand, lb)
    return lb[:, 1:] - lb[:, :-1]


_stage1 = functools.partial(
    jax.jit, static_argnames=("k", "use_pallas", "lazy", "suffix",
                              "screen_bytes", "max_lazy",
                              "restart", "parse"))(_stage1_core)


def _fused_encode_fn(span, span_off, span_len, block_len, buf_start, bfinal,
                     out_buf, tables, k: int, use_pallas: bool, lazy: bool,
                     suffix: bool = False, screen_bytes: int = 16,
                     max_lazy: int = 258, restart: int = 0,
                     parse: str = "v3y"):
    """The whole encode as ONE program (VERDICT r1 #1/#7): stage1 ->
    on-device planning (tpz/kernels/deflate_plan_device.py) -> stage2,
    with header bits emitted by the same scatter. No host round-trip, no
    program swap between stages; the only d2h is the final fetch.

    Output words are allocated at the static worst case (out_buf, just
    over 9 bits/byte; the capacity rides as an array shape, not a static,
    to dodge the jax 0.9.0 fastpath mis-dispatch across static variants);
    end_pos[NB] reports each block's exact end bit so the host can slice
    per-buffer bytes."""
    from tpz.kernels.deflate_plan_device import plan_device

    words = _make_words(span)
    mlen, mdist, is_token, lit_hist, dist_hist, _ = _stage1_core(
        words, span_off, span_len, block_len, k, use_pallas, lazy,
        suffix, screen_bytes, max_lazy, restart, parse)
    lit_hist = lit_hist.at[:, 256].set(0)
    # block_len == 0 marks padding blocks (sharded layouts; the batch path
    # never produces them — empty buffers are filtered host-side).
    plan = plan_device(lit_hist, dist_hist, block_len, buf_start, bfinal,
                       tables, live=block_len > 0)
    data_block = (words[:, WINDOW:WINDOW + BLOCK]
                  & jnp.uint32(0xFF)).astype(jnp.int32)
    NB = data_block.shape[0]
    table320 = jnp.concatenate(
        [plan["lit_cl"], plan["dist_cl"], jnp.zeros((NB, 2), jnp.int32)],
        axis=1)
    out = bitpack.assemble_stream_v2(
        data_block, is_token, mlen, mdist, table320, plan["body_off"],
        plan["btype"], block_len, plan["chunk1_off"],
        (plan["hdr_vals"], plan["hdr_nbits"], plan["hdr_offs"]), out_buf)
    return out, plan["end_pos"]


_fused_jit = jax.jit(_fused_encode_fn,
                     static_argnames=("k", "use_pallas", "lazy", "suffix",
                                      "screen_bytes", "max_lazy", "restart",
                                      "parse"))
_plan_tables_dev = None


def _fused_encode(span, span_off, span_len, block_len, buf_start, bfinal,
                  out_buf, k: int, use_pallas: bool, lazy: bool,
                  suffix: bool = False, screen_bytes: int = 16,
                  max_lazy: int = 258, restart: int = 0):
    """Dispatch wrapper: passes the planner's lookup tables as REAL
    arguments. jax 0.9.0 drops hoisted trace constants when a jitted
    function accumulates multiple input signatures ("Computation compiled
    for N inputs but called with M"), so nothing inside the fused program
    may close over non-scalar constants."""
    global _plan_tables_dev
    if _plan_tables_dev is None:
        from tpz.kernels.deflate_plan_device import plan_tables

        _plan_tables_dev = {kk: jnp.asarray(v)
                            for kk, v in plan_tables().items()}
    return _fused_jit(span, span_off, span_len, block_len, buf_start,
                      bfinal, out_buf, _plan_tables_dev, k=k,
                      use_pallas=use_pallas, lazy=lazy, suffix=suffix,
                      screen_bytes=screen_bytes, max_lazy=max_lazy,
                      restart=restart,
                      parse=_os.environ.get("TPZ_PARSE", "v3z"))


def oracle_lazy_encode(data: bytes, k: int) -> bytes:
    from tpz import oracle

    return oracle.deflate_encode(
        data, oracle.params_array(max_chain=k, lazy=True))


def compress(data: bytes, cfg=None) -> bytes:
    """Device-pipeline raw DEFLATE encode (greedy/TPU profile)."""
    return compress_many([data], cfg)[0]


def compress_indexed(data: bytes, cfg=None):
    """Encode one buffer and return (stream_bytes, block_end_bits,
    block_out_lens) — the block index that makes device-parallel decode
    possible (SURVEY.md §7.4 encoder-assisted side-car; stored in a gzip
    FEXTRA subfield by tpz/codecs/gzip_codec.py, which every conformant
    gzip decoder skips)."""
    res = compress_many([data], cfg, want_index=True)
    return res[0]


def compress_many(datas, cfg=None, want_index: bool = False):
    """Batch-encode many independent buffers in ONE stage1/stage2 pair.

    Each buffer is its own DEFLATE stream (window reset between buffers);
    all buffers' blocks share the device batch, so the per-invocation
    relay/program-swap cost (~seconds on this environment's axon tunnel)
    amortizes over the whole set — the production serving shape
    (SURVEY.md §2.2 DP row: independent streams are the scaling unit).
    Cross-buffer halo contamination is impossible: candidate insertability
    and per-position caps are derived from each block's own span bounds.
    """
    from tpz import oracle

    if cfg is None:
        from tpz.codecs.deflate import DeflateConfig

        cfg = DeflateConfig()
    k = cfg.max_chain
    lazy = cfg.lazy
    suffix = getattr(cfg, "suffix_mode", False)
    screen_bytes = getattr(cfg, "screen_bytes", 16)
    max_lazy = getattr(cfg, "max_lazy", 258)
    restart = getattr(cfg, "restart", 0)
    use_pallas = jax.default_backend() == "tpu"
    if lazy and not use_pallas and not suffix and not want_index:
        # the portable XLA v1 parse is greedy-only; the v1 lazy profile
        # needs the fused Pallas walk — fall back to the oracle off-TPU
        # (spec v3 has a full portable path via find_matches_v3)
        return [oracle.deflate_encode(d, cfg.params_array()) for d in datas]
    results = [None] * len(datas)
    idxs = [i for i, d in enumerate(datas) if len(d) > 0]
    for i, d in enumerate(datas):
        if len(d) == 0:
            blob = oracle.deflate_encode(b"")
            results[i] = ((blob, np.array([8 * len(blob)], np.int64),
                           np.array([0], np.int64))
                          if want_index else blob)
    if not idxs:
        return results

    # HBM liveness bounds one fused invocation (~0.4 GB of screen-sort
    # working set per MiB of span on this chip; 64 MiB OOMs a 16 GB part).
    # Oversized batches split into sequential sub-dispatches; an oversized
    # SINGLE buffer can't split mid-stream (later blocks' bit offsets
    # depend on earlier output), so it takes the C++ oracle — which is
    # byte-identical to this pipeline by construction.
    if sum(len(datas[i]) for i in idxs) > MAX_DEVICE_SPAN:
        for i in list(idxs):
            if len(datas[i]) > MAX_DEVICE_SPAN:
                blob = oracle.deflate_encode(datas[i], cfg.params_array())
                results[i] = (blob, None, None) if want_index else blob
                idxs.remove(i)
        group, group_bytes = [], 0
        for i in idxs:
            if group and group_bytes + len(datas[i]) > MAX_DEVICE_SPAN:
                for gi, blob in zip(group, compress_many(
                        [datas[g] for g in group], cfg, want_index)):
                    results[gi] = blob
                group, group_bytes = [], 0
            group.append(i)
            group_bytes += len(datas[i])
        if group:
            for gi, blob in zip(group, compress_many(
                    [datas[g] for g in group], cfg, want_index)):
                results[gi] = blob
        return results

    nbs = [(len(datas[i]) + BLOCK - 1) // BLOCK for i in idxs]
    NB = sum(nbs)
    span = np.zeros(WINDOW + NB * BLOCK + FWD_PAD, dtype=np.uint8)
    span_off_np = np.empty(NB, np.int32)
    span_len_np = np.empty(NB, np.int32)
    block_len_np = np.empty(NB, np.int32)
    b0 = 0
    pos = WINDOW
    for i, nb_i in zip(idxs, nbs):
        d = datas[i]
        span[pos:pos + len(d)] = np.frombuffer(memoryview(d), np.uint8)
        span_off_np[b0:b0 + nb_i] = np.arange(nb_i) * BLOCK
        span_len_np[b0:b0 + nb_i] = len(d)
        block_len_np[b0:b0 + nb_i] = np.minimum(
            len(d) - np.arange(nb_i) * BLOCK, BLOCK)
        pos += nb_i * BLOCK
        b0 += nb_i

    # Per-buffer flags: each buffer's first block starts a word-aligned
    # output region; its last block carries BFINAL.
    buf_start_np = np.zeros(NB, bool)
    bfinal_np = np.zeros(NB, bool)
    b0 = 0
    for nb_i in nbs:
        buf_start_np[b0] = True
        bfinal_np[b0 + nb_i - 1] = True
        b0 += nb_i

    # Static worst-case output size: stored blocks cost < 8.01 bits/byte
    # + 69 bits/chunk + per-buffer word alignment; 9 bits/byte dominates.
    # Rounded up to 64k words to bound compile variants (TPU compiles are
    # expensive over the relay).
    total_len = sum(len(datas[i]) for i in idxs)
    cap_words = (9 * total_len + 31) // 32 + 3 * NB + 16
    cap_words = (cap_words + (1 << 16) - 1) >> 16 << 16

    out_words, end_pos = _fused_encode(
        jnp.asarray(span), jnp.asarray(span_off_np),
        jnp.asarray(span_len_np), jnp.asarray(block_len_np),
        jnp.asarray(buf_start_np), jnp.asarray(bfinal_np),
        jnp.zeros((cap_words + 2,), jnp.uint32),
        k, use_pallas, lazy, suffix, screen_bytes, max_lazy, restart)
    # Two-phase fetch: the tiny end_pos first, then only the live prefix
    # of the padded output (d2h over the relay runs ~22 MB/s — fetching
    # the 9-bits/byte worst case would triple the transfer). The prefix
    # length is quantized to bound slice-program variants.
    end_pos_np = np.asarray(fetch(end_pos))
    used_words = (int(end_pos_np[-1]) + 31) // 32
    q = min((used_words + (1 << 16) - 1) >> 16 << 16, cap_words)
    body = np.asarray(fetch(out_words[:q])).view(np.uint8)

    b0 = 0
    start_bit = 0
    for i, nb_i in zip(idxs, nbs):
        end_bit = int(end_pos_np[b0 + nb_i - 1])
        nbytes = (end_bit - start_bit + 7) // 8
        blob = body[start_bit // 8 : start_bit // 8 + nbytes].tobytes()
        if want_index:
            ends = (end_pos_np[b0:b0 + nb_i].astype(np.int64) - start_bit)
            results[i] = (blob, ends,
                          block_len_np[b0:b0 + nb_i].astype(np.int64))
        else:
            results[i] = blob
        start_bit = (end_bit + 31) // 32 * 32
        b0 += nb_i
    return results
