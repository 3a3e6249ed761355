"""Differential tests: device DEFLATE planner == C++ host planner.

The device planner (tpz/kernels/deflate_plan_device.py) must reproduce
cpp DeflatePlan bit-for-bit: code lengths, canonical codes, block types,
absolute offsets, and every header bit (VERDICT r1 #7)."""

from __future__ import annotations

import numpy as np
import pytest

from tpz import oracle
from tpz.kernels import deflate_plan_device as dpd

pytestmark = pytest.mark.skipif(not oracle.available(),
                                reason="oracle library not built")


def _render_header(hv, hn, ho, nbytes):
    """Pack device header slots into a byte array (numpy reference)."""
    out = np.zeros(nbytes + 8, dtype=np.uint8)
    hv = np.asarray(hv, dtype=np.uint64).reshape(-1)
    hn = np.asarray(hn, dtype=np.int64).reshape(-1)
    ho = np.asarray(ho, dtype=np.int64).reshape(-1)
    for v, n, o in zip(hv, hn, ho):
        if n == 0:
            continue
        v = int(v) & ((1 << int(n)) - 1)
        byte, sh = int(o) >> 3, int(o) & 7
        payload = v << sh
        while payload:
            if byte < out.size:
                out[byte] |= payload & 0xFF
            payload >>= 8
            byte += 1
    return out[:nbytes]


def _compare(lit_hist, dist_hist, block_lens):
    nb = lit_hist.shape[0]
    ref = oracle.deflate_plan(lit_hist, dist_hist,
                              block_lens.astype(np.int64))
    buf_start = np.zeros(nb, bool)
    buf_start[0] = True
    bfinal = np.zeros(nb, bool)
    bfinal[-1] = True
    dev = dpd.plan_device(
        lit_hist.astype(np.int32), dist_hist.astype(np.int32),
        block_lens.astype(np.int32), buf_start, bfinal)
    dev = {k: np.asarray(v) for k, v in dev.items()}

    np.testing.assert_array_equal(dev["btype"], ref["btype"], err_msg="btype")
    np.testing.assert_array_equal(dev["body_off"], ref["body_off"],
                                  err_msg="body_off")
    ref_c1 = np.where(ref["chunk1_off"] < 0, -(1 << 30), ref["chunk1_off"])
    np.testing.assert_array_equal(dev["chunk1_off"], ref_c1,
                                  err_msg="chunk1_off")
    assert int(dev["end_pos"][-1]) == ref["total_bits"]

    # Tables: oracle exports codes bit-reversed; device packs rev|len<<16.
    # Oracle zeroes tables for stored blocks; device does too (body_tables).
    dev_ll = dev["lit_cl"] >> 16
    dev_lc = dev["lit_cl"] & 0xFFFF
    np.testing.assert_array_equal(dev_ll, ref["lit_len"], err_msg="lit_len")
    np.testing.assert_array_equal(dev_lc, ref["lit_code"], err_msg="lit_code")
    dev_dl = dev["dist_cl"] >> 16
    dev_dc = dev["dist_cl"] & 0xFFFF
    np.testing.assert_array_equal(dev_dl, ref["dist_len"], err_msg="dist_len")
    np.testing.assert_array_equal(dev_dc, ref["dist_code"],
                                  err_msg="dist_code")

    nbytes = (ref["total_bits"] + 7) // 8
    hdr = _render_header(dev["hdr_vals"], dev["hdr_nbits"], dev["hdr_offs"],
                         nbytes)
    np.testing.assert_array_equal(hdr, ref["header"][:nbytes],
                                  err_msg="header bits")


def _hist_from_tokens(rng, nb, style):
    """Generate realistic / adversarial histogram batches."""
    lit = np.zeros((nb, 288), np.uint32)
    dist = np.zeros((nb, 30), np.uint32)
    for b in range(nb):
        if style == "text":
            syms = rng.choice(96, size=2000, p=_zipf(rng, 96)) + 32
            np.add.at(lit[b], syms, 1)
            lsy = rng.choice(28, size=400, p=_zipf(rng, 28)) + 257
            np.add.at(lit[b], lsy, 1)
            ds = rng.choice(30, size=400, p=_zipf(rng, 30))
            np.add.at(dist[b], ds, 1)
        elif style == "uniform":
            lit[b, :286] = 10
            dist[b, :] = 5
        elif style == "skew":
            lit[b, 65] = 60000
            lit[b, 66] = 1
            lit[b, 285] = 3
            dist[b, 0] = 3
        elif style == "single-lit":
            lit[b, 120] = 100
        elif style == "no-dist":
            syms = rng.integers(0, 256, 500)
            np.add.at(lit[b], syms, 1)
        elif style == "one-dist":
            lit[b, 40] = 5
            lit[b, 260] = 7
            dist[b, 4] = 7
        elif style == "random":
            k = rng.integers(1, 288)
            syms = rng.integers(0, 288, k)
            syms = syms[syms != 256]
            np.add.at(lit[b], syms, rng.integers(1, 1000))
            kd = int(rng.integers(0, 30))
            if kd:
                ds = rng.integers(0, 30, kd)
                np.add.at(dist[b], ds, rng.integers(1, 500))
    return lit, dist


def _zipf(rng, n):
    w = 1.0 / np.arange(1, n + 1)
    rng.shuffle(w)
    return w / w.sum()


@pytest.mark.parametrize("style", ["text", "uniform", "skew", "single-lit",
                                   "no-dist", "one-dist", "random"])
def test_plan_matches_oracle(style):
    rng = np.random.default_rng(hash(style) % 2**31)
    lit, dist = _hist_from_tokens(rng, 6, style)
    block_lens = np.array([65536, 65536, 32768, 100, 1, 65536][:6], np.int64)
    _compare(lit, dist, block_lens)


def test_plan_matches_oracle_fuzz():
    rng = np.random.default_rng(7)
    for trial in range(8):
        nb = int(rng.integers(1, 9))
        lit, dist = _hist_from_tokens(rng, nb, "random")
        block_lens = rng.integers(1, 65537, nb).astype(np.int64)
        _compare(lit, dist, block_lens)


def test_plan_stored_blocks():
    """Histograms that force stored blocks (incompressible uniform bytes)."""
    rng = np.random.default_rng(3)
    nb = 4
    lit = np.zeros((nb, 288), np.uint32)
    dist = np.zeros((nb, 30), np.uint32)
    for b in range(nb):
        syms = rng.integers(0, 256, 65536)
        np.add.at(lit[b], syms, 1)
    block_lens = np.array([65536, 65536, 40000, 32768], np.int64)
    _compare(lit, dist, block_lens)


def test_package_merge_length_limit_binding():
    """Frequencies whose unconstrained Huffman depth exceeds 15 exercise
    the length-limit machinery (Fibonacci-ish weights)."""
    nb = 1
    lit = np.zeros((nb, 288), np.uint32)
    dist = np.zeros((nb, 30), np.uint32)
    fib = [1, 1]
    while len(fib) < 30:
        fib.append(fib[-1] + fib[-2])
    for i, f in enumerate(fib[:25]):
        lit[0, i] = min(f, 60000)
    dist[0, 0] = 1
    _compare(lit, dist, np.array([60000], np.int64))


def test_cl_rle_long_zero_runs():
    """Trigger 18/17 zero-run encodings of every chunk shape."""
    nb = 3
    lit = np.zeros((nb, 288), np.uint32)
    dist = np.zeros((nb, 30), np.uint32)
    # run of zeros between two used symbols of length ~ (138 boundary)
    lit[0, 0] = 5
    lit[0, 150] = 5
    lit[0, 285] = 2
    dist[0, 29] = 2
    lit[1, 0] = 1
    lit[1, 12] = 1   # short zero run (11)
    dist[1, 3] = 1
    lit[2, 0] = 3
    lit[2, 4] = 3    # 3-zero run -> 17
    lit[2, 7] = 3    # 2-zero run -> literals
    dist[2, 0] = 3
    _compare(lit, dist, np.array([1000, 1000, 1000], np.int64))
