"""One-shot relay health probe: tiny dispatch + fetch, prints latency.

Healthy relay: < 2 s total. Half-dead (observed 2026-08-19): dispatch
~11 s, 8-element fetch 77 s+. Exit 0 iff total < threshold (default 5 s,
override TPZ_HEALTH_THRESH)."""
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

t0 = time.time()
v = jnp.arange(3, dtype=jnp.int32) + 1
t1 = time.time()
r = int(np.asarray(v)[2])
t2 = time.time()
assert r == 3
thresh = float(os.environ.get("TPZ_HEALTH_THRESH", 5.0))
total = t2 - t0
print(f"dispatch={t1-t0:.2f}s fetch={t2-t1:.2f}s total={total:.2f}s "
      f"{'HEALTHY' if total < thresh else 'DEGRADED'}", flush=True)
sys.exit(0 if total < thresh else 1)
