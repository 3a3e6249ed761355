"""Roofline models for the device pipelines (VERDICT r3 next item 5).

Relates each benchmarked device path to the MEASURED primitive rates of
this chip (BASELINE.md "Primitive | Rate" table, re-measured round 1-3 by
bench/tune sweeps) and to the hardware peaks, so bench.py can report
"% of achievable" per row and the driver can see that figure move
round-over-round instead of only end-to-end MB/s.

The models are deliberately coarse WORK COUNTS, not simulations: for each
pipeline we count the dominant primitive invocations per input byte from
the kernel geometry (documented per model below), price them at the
measured rates, and call the sum the achievable-time lower bound. A path
at ~100% is primitive-bound (speed of light for this formulation — only a
reformulation helps); a path at 5% is leaving measured performance on the
table (dispatch overhead, serial walks, host round-trips).

Rates are per THIS chip (TPU v5e via the axon relay). The walk rate is
the measured Pallas serial-walk floor from the round-3/4 probes
(BASELINE.md round-3 notes), not a hardware constant.
"""

from __future__ import annotations

# Measured primitive rates (BASELINE.md table; elems are u32 lanes).
RATES = {
    "sort_keys_per_s": 1.0e9,       # 1-key radix sort
    "sort3_keys_per_s": 0.64e9,     # 3+-key sort
    "cumsum_elems_per_s": 2.2e9,
    "gather_elems_per_s": 0.14e9,   # XLA gather/scatter floor
    "elementwise_bytes_per_s": 289e9,  # fused u32 chain, r+w
    "hbm_bytes_per_s": 819e9,       # chip peak, context only
    "walk_positions_per_s": 62e6,   # measured v3y/inflate serial-walk
                                    # floor (~16 MiB / 270 ms of pure
                                    # walk at NBLK=2, round-3 W-sweep)
    # Round-5 lane-parallel (v3z) walk: one loop trip advances every
    # 16 KiB sub-walk in vector lanes; per-trip cost is the fused
    # gather+scatter+ALU body. Derived from the 8 MiB stage profile
    # (476 ms / ~40k trips over 8 groups, 4-gather form) — re-derive
    # when the merged-gather number lands.
    "v3z_trips_per_s": 8.4e4,
    "dispatch_floor_s": 0.6,        # relay fixed per-dispatch cost
}


def _price(work: dict) -> tuple[float, dict]:
    """work: {primitive: count} -> (seconds lower bound, per-term secs)."""
    terms = {}
    for k, n in work.items():
        if k == "dispatch":
            terms[k] = n * RATES["dispatch_floor_s"]
        else:
            terms[k] = n / RATES[k.replace("_count", "_per_s")]
    return sum(terms.values()), terms


def deflate_encode_model(nbytes: int, screen_bytes: int = 16,
                         r_neighbors: int = 8) -> dict:
    """Per-64KiB-block geometry (matchfinder.suffix_screen_w + parse v3y +
    plan + bitpack), M = WINDOW + BLOCK + FWD_PAD ~= 98816 elems/block:

    - screen sort: (screen_bytes/4 + 2)-key sort of M elems, plus the
      1-key inverse-permutation sort of M  -> priced at the 3-key rate
      for the multi-key and the 1-key rate for the inverse.
    - neighbor scan: 2*R rolls x (screen_bytes/4) word compares over M
      elems -> elementwise.
    - parse walk: BLOCK positions through the serial Pallas walk.
    - plan: negligible (per-block 288/30-symbol package-merge).
    - bitpack: cumsum over tokens + elementwise emission over BLOCK.
    """
    blk = 65536
    m = 32768 + blk + 512
    nb = max(1, (nbytes + blk - 1) // blk)
    nw = screen_bytes // 4
    # v3z walk (the default since round 5): lax.map groups of 16 blocks,
    # ~5k trips per group on the mixed corpus (BASELINE round-5 trip
    # structure), every trip one fused gather+scatter+ALU body.
    groups = max(1, (nb + 15) // 16)
    return {
        "sort3_keys_count": nb * m,                      # multi-key screen
        "sort_keys_count": nb * m,                       # inverse perm
        "elementwise_bytes_count": nb * m * 4 * (2 * r_neighbors * nw),
        "v3z_trips_count": groups * 5000,
        "cumsum_elems_count": nb * blk,
        "dispatch": 1,
    }


def deflate_decode_model(nbytes: int) -> dict:
    """Indexed device inflate: MSB bit walk over compressed bits (walk
    positions ~= tokens ~= nbytes/4 on the mixed corpus), dense marker
    materialize (elementwise over output), copy-machine resolve (vector
    chunks ~ output bytes / 64 effective), one d2h fetch (elementwise)."""
    tokens = nbytes // 4
    return {
        "walk_positions_count": tokens,
        "elementwise_bytes_count": 3 * nbytes,
        "cumsum_elems_count": nbytes,
        "dispatch": 1,
    }


def bzip2_encode_model(nbytes: int) -> dict:
    """Device bzip2 encode: BWT prefix-doubling ~= 6 effective rounds of
    3-key sort over block elems (early exit, round-3) + MTF/RLE2 scans +
    MXU coder (minor) + MSB bitpack cumsum."""
    return {
        "sort3_keys_count": 6 * nbytes,
        "cumsum_elems_count": 4 * nbytes,
        "elementwise_bytes_count": 8 * nbytes,
        "dispatch": 1,
    }


def bzip2_decode_model(nbytes: int) -> dict:
    """Device bzip2 decode: symbol walk over ~nbytes/2 records + segment
    list-ranking iBWT (gather-class at ~the walk rate, two passes)."""
    return {
        "walk_positions_count": nbytes // 2 + nbytes,
        "elementwise_bytes_count": 4 * nbytes,
        "dispatch": 1,
    }


def lzhuf_model(nbytes: int) -> dict:
    """LZHUF device paths share the DEFLATE shape (suffix screen encode /
    MSB walk + resolve decode) at dict_bits=13."""
    return deflate_decode_model(nbytes)


MODELS = {
    "deflate_encode_device": deflate_encode_model,
    "deflate_decode_device": deflate_decode_model,
    "deflate_decode_device_batched": deflate_decode_model,
    "deflate_decode_device_foreign": deflate_decode_model,
    "bzip2_encode_device": bzip2_encode_model,
    "bzip2_decode_device": bzip2_decode_model,
    "lzhuf_encode_device": lzhuf_model,
    "lzhuf_encode_device_batched": lzhuf_model,
    "lzhuf_decode_device": lzhuf_model,
}


def annotate(name: str, nbytes: int, achieved_mb_s: float) -> dict | None:
    """Roofline annotation for one bench row: achievable MB/s from the
    work model + measured rates, % of achievable achieved, and the two
    dominant cost terms (where the next optimization must go)."""
    model = MODELS.get(name)
    if model is None or not achieved_mb_s:
        return None
    secs, terms = _price(model(nbytes))
    kern_secs = secs - terms.get("dispatch", 0.0)
    achievable = nbytes / secs / 1e6
    kern_achievable = nbytes / kern_secs / 1e6 if kern_secs > 0 else None
    top = sorted(terms.items(), key=lambda kv: -kv[1])[:2]
    out = {
        # Including the relay dispatch floor: the serving ceiling at this
        # transfer size. >100% means the floor estimate is pessimistic.
        "achievable_MB_s": round(achievable, 2),
        "pct_of_achievable": round(100.0 * achieved_mb_s / achievable, 1),
        "dominant_terms": {k: round(v, 4) for k, v in top},
    }
    if kern_achievable:
        # Excluding dispatch: the primitive-priced kernel ceiling — the
        # figure that must move when a kernel reformulation lands.
        out["kernel_achievable_MB_s"] = round(kern_achievable, 2)
        out["pct_of_kernel"] = round(
            100.0 * achieved_mb_s / kern_achievable, 1)
    return out
