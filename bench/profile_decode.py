#!/usr/bin/env python
"""Stage profiler for the device DEFLATE decode path (VERDICT r2 #1).

Times, fetch-synced (axon relay: only a d2h proves completion):
  - host InflateScanHeaders
  - device symbol walk alone (markers)
  - fused walk+resolve program (one dispatch)
  - full decompress_indexed wall (incl transfers + fetch)
Run on the real chip: PYTHONPATH="/root/repo:$PYTHONPATH" python bench/profile_decode.py [MiB]
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from tpz.utils import corpus
from tpz.codecs import deflate
from tpz.kernels import inflate_pipeline as ip
from tpz.kernels.device_quirks import fetch


def main():
    mib = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    size = mib << 20
    data = corpus.mixed(size, seed=11)
    print(f"encoding {mib} MiB (device, indexed)...", flush=True)
    t0 = time.time()
    stream, end_bits, out_lens = deflate.compress_indexed(data)
    print(f"  encode: {time.time()-t0:.2f}s, {len(stream)} bytes", flush=True)

    from tpz import oracle, constants as C

    nb = len(end_bits)
    t0 = time.time()
    scan = oracle.inflate_scan_headers(stream, np.asarray(end_bits))
    print(f"scan_headers: {(time.time()-t0)*1000:.1f} ms ({nb} blocks)",
          flush=True)

    sb = np.frombuffer(stream, np.uint8)
    slices = np.zeros((nb, ip.SLICE_BYTES), np.uint8)
    slice_start = np.zeros(nb, np.int64)
    starts = np.concatenate([[0], np.asarray(end_bits)[:-1]])
    for b in range(nb):
        s0 = int(starts[b]) // 8
        s1 = min(len(sb), (int(end_bits[b]) + 7) // 8 + 8)
        take = min(s1 - s0, ip.SLICE_BYTES)
        slices[b, :take] = sb[s0:s0 + take]
        slice_start[b] = s0
    body_bit_local = (scan["body_bit"] - 8 * slice_start).astype(np.int32)
    walk_out_len = np.where(scan["btype"] == 0, 0,
                            np.asarray(out_lens)).astype(np.int32)
    sw = np.ascontiguousarray(slices).view("<u4").astype(np.int32)
    tab = np.concatenate([scan["lit_tab"], scan["dist_tab"]],
                         axis=1).astype(np.int32)

    wargs = (jnp.asarray(sw), jnp.asarray(body_bit_local),
             jnp.asarray(walk_out_len),
             jnp.asarray(tab),
             jnp.asarray(np.asarray(C.DEFLATE_LENGTH_BASE, np.int32)),
             jnp.asarray(np.asarray(C.DEFLATE_LENGTH_EXTRA, np.int32)),
             jnp.asarray(np.asarray(C.DEFLATE_DIST_BASE, np.int32)),
             jnp.asarray(np.asarray(C.DEFLATE_DIST_EXTRA, np.int32)))

    for nblk in (4, 8):
        m = ip._walk_jit(*wargs, interpret=False, nblk=nblk)
        _ = fetch(m[:8, :8])
        t0 = time.time()
        m = ip._walk_jit(*wargs, interpret=False, nblk=nblk)
        _ = fetch(m[:8, :8])
        print(f"walk nblk={nblk}: {(time.time()-t0)*1000:.0f} ms", flush=True)

    items = [(stream, end_bits, out_lens)]
    t0 = time.time()
    out = ip.decompress_many_indexed(items)
    t_cold = time.time() - t0
    assert out[0] == data
    t0 = time.time()
    out = ip.decompress_many_indexed(items)
    t_warm = time.time() - t0
    assert out[0] == data
    print(f"decompress_many wall: cold {t_cold:.2f}s, warm {t_warm:.2f}s "
          f"({size/t_warm/1e6:.2f} MB/s)", flush=True)


if __name__ == "__main__":
    main()
