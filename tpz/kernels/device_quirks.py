"""Device-to-host fetch helpers for the axon TPU relay.

History: early relay builds stalled 70-360 s on the FIRST d2h of a
buffer produced by a jitted program containing `lax.fori_loop`/`scan`;
fetch() used to dodge that with a separate consume dispatch. Re-probed
2026-08-19 (bench/probe_xfer2.py): the stall is gone, and the consume
dispatch now costs ~0.6 s of pure overhead per call — so fetch() is a
plain synchronous device_get again. Current relay transfer facts
(bench/probe_d2h.py): h2d ~1 GB/s, d2h ~28 MB/s regardless of
chunking/threading/async — d2h is the environment's hard decode-output
ceiling and is reported as such in bench.py's roofline detail.
"""

from __future__ import annotations

import jax
import numpy as np


def fetch(x) -> np.ndarray:
    """Synchronous device_get (kept as the single fetch choke point so
    relay workarounds can come back in one place if needed)."""
    jax.block_until_ready(x)
    return np.asarray(jax.device_get(x))


def fetch_tree(tree):
    return jax.tree_util.tree_map(fetch, tree)


def fetch_many(*xs):
    """device_get several arrays in one call."""
    jax.block_until_ready(xs)
    return [np.asarray(a) for a in jax.device_get(list(xs))]
