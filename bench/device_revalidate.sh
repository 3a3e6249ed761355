#!/bin/bash
# Watch for the axon relay to return, then run the round-5 on-chip gate
# in strict order:
#   1. probe_dma_align.py  — validates the flat-1D DMA pattern the four
#      walks now use (the round-4 Mosaic regression class)
#   2. make selftest-tpu   — compile+run every Pallas kernel family on
#      the chip, byte-exact round-trips (the regression gate)
#   3. bench.py            — headline + full extras matrix
#   4. stage profilers     — decode stage split (resolve_walk vs doubling)
# Safe to leave running: probes are cheap, the work runs once, and
# everything logs to bench/device_reval.log. The chip is single-tenant,
# so every step runs sequentially in this one runner.
cd /root/repo
LOG=bench/device_reval.log
while true; do
  if ss -tln 2>/dev/null | grep -q ":8082"; then
    echo "=== relay up $(date -u) ===" >> "$LOG"
    {
      echo "--- 1. DMA alignment probe ---"
      timeout 1200 python -u bench/probe_dma_align.py
      echo "--- 2. selftest-tpu gate ---"
      timeout 3600 make selftest-tpu
      echo "--- 3. bench headline + extras ---"
      timeout 3600 python -u bench.py
      echo "--- 4. decode stage split ---"
      timeout 1800 python -u bench/profile_decode_stages.py 8
      echo "--- 5. parse walk A/B (v3y vs lane-parallel v3z) ---"
      timeout 2400 python -u bench/probe_parse_ab.py 8
      echo "--- 6. vector gather pricing ---"
      timeout 1200 python -u bench/probe_vector_gather.py
      echo "--- 7. decode walk A/B (pallas vs lane-parallel vz) ---"
      timeout 3600 python -u bench/probe_inflate_ab.py 8
    } >> "$LOG" 2>&1
    echo "=== done $(date -u) ===" >> "$LOG"
    break
  fi
  sleep 60
done
