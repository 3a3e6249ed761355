"""Cross-round golden digests: fixed inputs must produce these exact
compressed bytes forever (any spec drift — parse rule, table tie-break,
header emission — changes a digest and fails loudly). Decode-direction
behavior is pinned separately by the stdlib/system interop suites."""

import hashlib

import pytest

from tpz import oracle
from tpz.utils import corpus

pytestmark = pytest.mark.skipif(
    not oracle.available(), reason="oracle library not built"
)


def sha(b: bytes) -> str:
    return hashlib.sha256(b).hexdigest()[:16]


DATA = corpus.mixed(1 << 20, seed=99)


def _current():
    return {
        "deflate_default": sha(oracle.deflate_encode(DATA)),
        "deflate_lazy": sha(oracle.deflate_encode(
            DATA, oracle.params_array(max_chain=64, lazy=True))),
        "bzip2_9": sha(oracle.bzip2_encode(DATA, 9)),
        "lzhuf_lh5": sha(oracle.lzhuf_encode(DATA, 13)),
    }


# Recorded 2026-08-17 (round 1 final encoder state).
EXPECTED = {
    "deflate_default": "c67939a86745ed2f",
    "deflate_lazy": "db9d2040c960b6fa",
    "bzip2_9": "8870e2001d2d6176",
    "lzhuf_lh5": "5f519ab1795761da",
}


def test_goldens():
    cur = _current()
    for k, v in EXPECTED.items():
        assert cur[k] == v, (
            f"{k} digest changed: {cur[k]} != {v} — encoder behavior drifted"
            f" (if intentional, update EXPECTED and note it in the commit)")
