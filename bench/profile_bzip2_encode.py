#!/usr/bin/env python
"""Stage split of the all-device bzip2 encode at N MiB (VERDICT r3 next
item 3). The relay memoizes identical invocations, so every stage warms
on chain A (pays compile) and times on chain B (fresh values).

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


def prep(seed, mib, level):
    data = corpus.mixed(mib << 20, seed=seed)
    t0 = time.time()
    rle, off, ln, crc = oracle.bzip2_rle1(data, level)
    t_rle = time.time() - t0
    NB = off.size
    N = bp._bucket(int(ln.max()))
    blocks = np.zeros((NB, N), np.uint8)
    for b in range(NB):
        blocks[b, :ln[b]] = rle[off[b]:off[b] + ln[b]]
    t0 = time.time()
    w = cyclic_words(blocks, ln.astype(np.int64))
    t_cw = time.time() - t0
    return data, w, ln, crc, N, NB, t_rle, t_cw


def _force(r):
    """block_until_ready is unreliable on the relay (device_quirks);
    only a d2h fetch proves completion — fetch one element per leaf."""
    for leaf in jax.tree_util.tree_leaves(r):
        fetch(leaf.reshape(-1)[:1])


def t(label, fn, *a):
    _force(fn(*a))  # ensure queue drained + warm
    t0 = time.time()
    r = fn(*a)
    _force(r)
    print(f"{label}: {(time.time()-t0)*1000:.0f} ms", flush=True)
    return r


def main():
    mib = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    level = int(sys.argv[2]) if len(sys.argv) > 2 else 9

    dataA, wA, lnA, crcA, N, NB, _, _ = prep(43, mib, level)
    dataB, wB, lnB, crcB, N2, NB2, t_rle, t_cw = prep(44, mib, level)
    assert (N, NB) == (N2, NB2)
    print(f"host rle1+split: {t_rle*1000:.0f} ms ({NB} blocks, N={N})",
          flush=True)
    print(f"cyclic_words: {t_cw*1000:.0f} ms", flush=True)

    t0 = time.time()
    wdB = jax.block_until_ready(jax.device_put(wB))
    ndB = jax.block_until_ready(jax.device_put(lnB.astype(np.int32)))
    print(f"h2d ({wB.nbytes/1e6:.0f} MB): {(time.time()-t0)*1000:.0f} ms",
          flush=True)
    wdA = jax.device_put(wA)
    ndA = jax.device_put(lnA.astype(np.int32))

    rounds = max(1, (N - 1).bit_length())
    bwt = jax.jit(lambda w, n: _bwt_batched(w, n, rounds))
    jax.block_until_ready(bwt(wdA, ndA))  # compile + warm on A
    t(f"BWT (rounds<={rounds})", bwt, wdB, ndB)

    mtf = jax.jit(lambda w, n: bp._fused_bwt_mtf_fn(w, n, rounds))
    outA = mtf(wdA, ndA)
    jax.block_until_ready(outA)
    outB = t("BWT+MTF+RLE2 (fused)", mtf, wdB, ndB)
    origB, symsB, sym_lenB, usedB, n_usedB = outB
    origA, symsA, sym_lenA, usedA, n_usedA = outA

    from tpz.kernels.bzip2_plan_device import encode_blocks

    coder = jax.jit(encode_blocks)
    jax.block_until_ready(coder(symsA, sym_lenA, usedA, n_usedA, origA,
                                jnp.asarray(crcA.astype(np.uint32))))
    vB = t("coder (encode_blocks)", coder, symsB, sym_lenB, usedB,
           n_usedB, origB, jnp.asarray(crcB.astype(np.uint32)))
    vals, nbits, total_bits = vB

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
    vA = coder(symsA, sym_lenA, usedA, n_usedA, origA,
               jnp.asarray(crcA.astype(np.uint32)))
    jax.block_until_ready(packf(vA[0], vA[1], vA[2], buf_start))
    words, body_off = t("bitpack assemble", packf, vals, nbits,
                        total_bits, buf_start)

    end_np = np.asarray(fetch(body_off + total_bits))
    used_words = (int(end_np[-1]) + 31) // 32
    q = min((used_words + (1 << 16) - 1) >> 16 << 16, cap_words)
    t0 = time.time()
    np.asarray(fetch(words[:q]))
    print(f"d2h words ({q*4/1e6:.1f} MB): {(time.time()-t0)*1000:.0f} ms",
          flush=True)

    # whole fused wall, warm (compile paid by a first call)
    bp.compress(dataA, level)
    t0 = time.time()
    out = bp.compress(dataB, level)
    dt = time.time() - t0
    print(f"whole compress() wall (warm): {dt:.2f} s "
          f"({mib*1.048576/dt:.2f} MB/s, ratio {len(out)/len(dataB):.4f})",
          flush=True)
    import bz2

    assert bz2.decompress(out) == dataB
    print("bz2 interop ok", flush=True)


if __name__ == "__main__":
    main()
