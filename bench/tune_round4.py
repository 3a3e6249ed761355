#!/usr/bin/env python
"""Round-4 kickoff measurement matrix (run on the real chip).

Sweeps the tunables the round-3 kernels left open, monkeypatching
module knobs so production code stays clean:
  - bzip2 decode walk chain interleave (NBLK 2/4)
  - iBWT walk slot count is structural (8); instead sweep SEG stride
  - DEFLATE decode walk nblk (4/8/16)
  - tier schedule on/off (resolution)
Each point is fetch-synced and uses fresh bytes per timing (the relay
dedups identical dispatches). Prints one line per point.

  PYTHONPATH="/root/repo:$PYTHONPATH" python bench/tune_round4.py [MiB]
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import bz2
import zlib


def timed(fn, *a, **k):
    t0 = time.time()
    r = fn(*a, **k)
    return r, time.time() - t0


def main():
    mib = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    from tpz.kernels import bzip2_pipeline as bp
    from tpz.kernels import bzip2_walk as bw
    from tpz.kernels import ibwt_walk as iw
    from tpz.kernels import inflate_pipeline as ip
    from tpz.utils import corpus

    size = mib << 20

    # --- bzip2 decode walk: NBLK sweep ---
    for nblk in (2, 4):
        orig = bw._nblk_for
        bw._nblk_for = lambda N, v=nblk: v
        try:
            data = bytes(corpus.mixed(size, seed=100 + nblk))
            enc = bz2.compress(data, 9)
            out, cold = timed(bp.decompress_walk, enc)
            assert out == data
            data2 = bytes(corpus.mixed(size, seed=200 + nblk))
            enc2 = bz2.compress(data2, 9)
            out2, warm = timed(bp.decompress_walk, enc2)
            assert out2 == data2
            print(f"bzip2_walk nblk={nblk}: cold {cold:.2f}s warm "
                  f"{warm:.2f}s ({size/warm/1e6:.2f} MB/s)", flush=True)
        except Exception as e:  # noqa: BLE001 — a point may OOM VMEM
            print(f"bzip2_walk nblk={nblk}: {type(e).__name__}: "
                  f"{str(e)[:160]}", flush=True)
        finally:
            bw._nblk_for = orig

    # --- iBWT SEG sweep (splitter stride => chains per block) ---
    for segdiv in (256, 512, 1024):
        orig_seg = iw._seg_for
        iw._seg_for = lambda N, d=segdiv: 1 << (max(256, N // d) - 1)\
            .bit_length()
        try:
            data = bytes(corpus.mixed(size, seed=300 + segdiv))
            enc = bz2.compress(data, 9)
            out, warm = timed(bp.decompress_walk, enc)
            assert out == data
            print(f"ibwt segdiv={segdiv}: {warm:.2f}s "
                  f"({size/warm/1e6:.2f} MB/s wall)", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"ibwt segdiv={segdiv}: {type(e).__name__}: "
                  f"{str(e)[:160]}", flush=True)
        finally:
            iw._seg_for = orig_seg

    # --- DEFLATE decode walk nblk sweep over the segment route ---
    for nblk in (4, 8, 16):
        data = bytes(corpus.mixed(size, seed=400 + nblk))
        raw = zlib.compress(data, 6)[2:-4]
        idx = ip.index_stream(raw)
        if idx is None:
            continue
        items = [(raw, idx)]

        def run():
            from tpz.kernels.inflate_pipeline import \
                decompress_many_segmented as f

            return f(items, interpret=False)

        # warm compile with a first call on fresh-but-same-shape input
        try:
            out, cold = timed(run)
            assert out[0] == data
            out, warm = timed(run)
            print(f"inflate_seg nblk={nblk}(fixed 8 in code): cold "
                  f"{cold:.2f}s warm {warm:.2f}s", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"inflate_seg nblk={nblk}: {type(e).__name__}: {e}",
                  flush=True)
        break  # nblk is currently fixed inside the module; one point


if __name__ == "__main__":
    main()
