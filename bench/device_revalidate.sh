#!/bin/bash
# Watch for the axon relay to return, then run the round-3 device
# validation + benches + round-4 tuning sweeps once. Safe to leave
# running: probes are cheap, the work runs once, and everything logs to
# bench/device_reval.log. The chip is single-tenant, so every step runs
# sequentially in this one runner.
cd /root/repo
LOG=bench/device_reval.log
while true; do
  if ss -tln 2>/dev/null | grep -q ":8082"; then
    echo "=== relay up $(date -u) ===" >> "$LOG"
    {
      timeout 900 python -u -c "
import jax, numpy as np
print('devices:', jax.devices(), flush=True)
import bz2
from tpz.kernels import bzip2_pipeline as bp
from tpz.utils import corpus
data = bytes(corpus.mixed(4<<20, seed=3))
enc = bz2.compress(data, 9)
import time; t0=time.time()
out = bp.decompress_walk(enc)
print('bzip2 walk 4MiB:', out == data, f'{time.time()-t0:.1f}s', flush=True)
"
      timeout 1800 python -u bench/profile_bzip2_decode.py 16 9
      timeout 1800 python -u bench/profile_decode.py 16
      timeout 2400 python -u bench.py
      echo "--- tune_round4 ---"
      timeout 3600 python -u bench/tune_round4.py 8
      echo "--- 64 MiB span probe (TPZ_MAX_DEVICE_SPAN) ---"
      TPZ_MAX_DEVICE_SPAN=$((64 << 20)) TPZ_BENCH_HEADLINE_ONLY=1 \
        TPZ_BENCH_BYTES=$((32 << 20)) TPZ_BENCH_NBUF=2 \
        timeout 2400 python -u bench.py
      echo "--- NBUF=4 batched headline ---"
      TPZ_BENCH_HEADLINE_ONLY=1 TPZ_BENCH_BYTES=$((8 << 20)) \
        TPZ_BENCH_NBUF=4 timeout 1800 python -u bench.py
    } >> "$LOG" 2>&1
    echo "=== done $(date -u) ===" >> "$LOG"
    break
  fi
  sleep 60
done
