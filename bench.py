#!/usr/bin/env python
"""Headline benchmark — prints ONE JSON line for the driver.

Metric: DEFLATE device-pipeline encode throughput (GB/s per chip) on a
Silesia-like synthetic mix (the real Silesia corpus is unavailable offline;
see tpz/utils/corpus.py). vs_baseline is against the BASELINE.json
north-star target of 1 GB/s/chip (the reference crate publishes no numbers
of its own — BASELINE.md).

Timing includes host planning and all device<->host transfers (honest
end-to-end wall time); each iteration uses different input bytes so no
caching layer can elide work.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    size = int(os.environ.get("TPZ_BENCH_BYTES", 16 << 20))
    iters = int(os.environ.get("TPZ_BENCH_ITERS", 3))
    from tpz.kernels import deflate_pipeline
    from tpz.utils import corpus

    backend = "tpu"
    try:
        if not deflate_pipeline.usable():
            raise RuntimeError("device pipeline unusable")
        encode = deflate_pipeline.compress
    except Exception:
        # Chip held by another process / backend init failure: report the
        # oracle path rather than crashing (clearly labeled).
        from tpz import oracle

        backend = "oracle-cpu-fallback"
        encode = oracle.deflate_encode

    # Compile warm-up (not timed).
    warm = corpus.mixed(size, seed=7)
    out = encode(warm)
    ratio = len(out) / len(warm)

    times = []
    for i in range(iters):
        data = corpus.mixed(size, seed=1000 + i)
        t0 = time.time()
        encode(data)
        times.append(time.time() - t0)
    times.sort()
    median = times[len(times) // 2]
    gbps = size / median / 1e9
    print(json.dumps({
        "metric": "deflate_encode_silesia_like",
        "value": round(gbps, 4),
        "unit": "GB/s/chip",
        "vs_baseline": round(gbps / 1.0, 4),
        "detail": {
            "bytes": size,
            "backend": backend,
            "median_s": round(median, 4),
            "all_s": [round(t, 4) for t in times],
            "compression_ratio": round(ratio, 4),
        },
    }))


if __name__ == "__main__":
    main()
