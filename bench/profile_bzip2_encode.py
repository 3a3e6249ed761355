#!/usr/bin/env python
"""Stage split of the all-device bzip2 encode at N MiB (VERDICT r3 next
item 3: find where the 6 s/16 MiB goes before touching anything).

Stages: host RLE1+split (C++) | cyclic_words (numpy) | h2d | BWT |
MTF+RLE2 | multi-table coder | bitpack assembly | d2h | host splice.

Run: PYTHONPATH=/root/repo python bench/profile_bzip2_encode.py [MiB] [level]
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from tpz.utils import corpus
from tpz import oracle
from tpz.kernels import bzip2_pipeline as bp
from tpz.kernels.bwt import _bwt_batched, cyclic_words
from tpz.kernels.device_quirks import fetch


def t(label, fn, *a):
    r = fn(*a)
    jax.block_until_ready(r)
    t0 = time.time()
    r = fn(*a)
    jax.block_until_ready(r)
    print(f"{label}: {(time.time()-t0)*1000:.0f} ms", flush=True)
    return r


def main():
    mib = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    level = int(sys.argv[2]) if len(sys.argv) > 2 else 9
    data = corpus.mixed(mib << 20, seed=43)

    t0 = time.time()
    rle, off, ln, crc = oracle.bzip2_rle1(data, level)
    print(f"host rle1+split: {(time.time()-t0)*1000:.0f} ms "
          f"({off.size} blocks)", flush=True)

    NB = off.size
    N = bp._bucket(int(ln.max()))
    blocks = np.zeros((NB, N), np.uint8)
    for b in range(NB):
        blocks[b, :ln[b]] = rle[off[b]:off[b] + ln[b]]
    t0 = time.time()
    w = cyclic_words(blocks, ln.astype(np.int64))
    print(f"cyclic_words: {(time.time()-t0)*1000:.0f} ms", flush=True)

    t0 = time.time()
    wd = jax.block_until_ready(jax.device_put(w))
    nd = jax.block_until_ready(jax.device_put(ln.astype(np.int32)))
    print(f"h2d ({w.nbytes/1e6:.0f} MB): {(time.time()-t0)*1000:.0f} ms",
          flush=True)

    rounds = max(1, (N - 1).bit_length())
    bwt = jax.jit(lambda w, n: _bwt_batched(w, n, rounds))
    last, orig = t(f"BWT (rounds<={rounds}, NB={NB}, N={N})", bwt, wd, nd)

    def mtf_part(w, n):
        return bp._fused_bwt_mtf_fn(w, n, rounds)

    mtf = jax.jit(mtf_part)
    orig2, syms, sym_len, used, n_used = t("BWT+MTF+RLE2 (fused)", mtf,
                                           wd, nd)

    from tpz.kernels.bzip2_plan_device import encode_blocks

    coder = jax.jit(lambda s, sl, u, nu, o, c: encode_blocks(
        s, sl, u, nu, o, c))
    crcd = jnp.asarray(crc.astype(np.uint32))
    vals, nbits, total_bits = t("coder (encode_blocks)", coder, syms,
                                sym_len, used, n_used, orig2, crcd)

    from tpz.kernels.bitpack import assemble_stream_msb

    cap_words = (17 * NB * (N + 1) + NB * 60000 + 31) // 32 + 16
    cap_words = (cap_words + (1 << 18) - 1) >> 18 << 18
    buf_start = jnp.asarray(np.asarray([b == 0 for b in range(NB)], bool))

    def pack(vals, nbits, total_bits, bs):
        def step(pos, x):
            tb, s = x
            pos = jnp.where(s, (pos + 31) // 32 * 32 + 32, pos)
            return pos + tb, pos

        _, body_off = jax.lax.scan(step, jnp.int32(0), (total_bits, bs))
        return assemble_stream_msb(vals, nbits, body_off,
                                   cap_words), body_off

    packf = jax.jit(pack)
    words, body_off = t("bitpack assemble", packf, vals, nbits,
                        total_bits, buf_start)

    end_np = np.asarray(fetch(body_off + total_bits))
    used_words = (int(end_np[-1]) + 31) // 32
    q = min((used_words + (1 << 16) - 1) >> 16 << 16, cap_words)
    t0 = time.time()
    body = np.asarray(fetch(words[:q]))
    print(f"d2h words ({q*4/1e6:.1f} MB): {(time.time()-t0)*1000:.0f} ms",
          flush=True)

    # whole fused wall for reference
    t0 = time.time()
    out = bp.compress(data, level)
    print(f"whole compress() wall: {time.time()-t0:.2f} s "
          f"({mib*1048576/(time.time()-t0)/1e6:.2f} MB/s, "
          f"ratio {len(out)/len(data):.4f})", flush=True)
    import bz2

    assert bz2.decompress(out) == data
    print("bz2 interop ok", flush=True)


if __name__ == "__main__":
    main()
