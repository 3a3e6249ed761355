#!/usr/bin/env python
"""Stage profiler for the all-device bzip2 decode (round 3).

Times, fetch-synced: host header scan, the fused device program (symbol
walk + RLE2 expand + iBWT), host RLE1^-1, and the end-to-end walls for
the walk route vs the host oracle.
Run on the real chip:
  PYTHONPATH="/root/repo:$PYTHONPATH" python bench/profile_bzip2_decode.py [MiB] [level]
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import bz2


def main():
    mib = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    level = int(sys.argv[2]) if len(sys.argv) > 2 else 9
    from tpz import oracle
    from tpz.kernels import bzip2_pipeline as bp
    from tpz.kernels import bzip2_walk as bw
    from tpz.utils import corpus

    data = bytes(corpus.mixed(mib << 20, seed=21))
    enc = bz2.compress(data, level)
    print(f"{mib} MiB level {level} -> {len(enc)} compressed", flush=True)

    t0 = time.time()
    scan = oracle.bzip2_scan_headers(enc)
    print(f"scan_headers: {(time.time()-t0)*1000:.1f} ms "
          f"({len(scan['sym_bits'])} blocks)", flush=True)

    N = bp._bucket(bw.rec_cap_for(level))
    scap = N + 8192
    nb = len(scan["sym_bits"])
    sb = np.frombuffer(enc, np.uint8)
    slices = np.zeros((nb, scap), np.uint8)
    spans = ((scan["end_bits"] + 7) // 8 + 1
             - scan["sym_bits"] // 8).astype(np.int64)
    for b in range(nb):
        s0 = int(scan["sym_bits"][b]) // 8
        take = min(int(spans[b]), len(enc) - s0)
        slices[b, :take] = sb[s0:s0 + take]

    for rep in range(2):
        t0 = time.time()
        plain, lens, err, endbits, ok = bw.decode_blocks_device(
            scan, slices, N, rec_cap=bw.rec_cap_for(level))
        lbl = "cold" if rep == 0 else "warm"
        print(f"fused device program ({lbl}): {time.time()-t0:.2f}s "
              f"ok={ok}", flush=True)

    for rep in range(2):
        t0 = time.time()
        out = bp.decompress_walk(enc)
        assert out == data
        dt = time.time() - t0
        print(f"decompress_walk wall ({'cold' if rep == 0 else 'warm'}): "
              f"{dt:.2f}s ({(mib << 20)/dt/1e6:.2f} MB/s)", flush=True)

    t0 = time.time()
    out = oracle.bzip2_decode(enc)
    assert out == data
    dt = time.time() - t0
    print(f"host oracle: {dt:.2f}s ({(mib << 20)/dt/1e6:.2f} MB/s)",
          flush=True)


if __name__ == "__main__":
    main()
