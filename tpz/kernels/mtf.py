"""Move-to-front transform as a scan kernel (SURVEY.md §2.1 BZip2 row:
"MTF as scan kernel").

The sequential list-walk becomes a data-parallel formula: the MTF rank of
symbol s at position i equals the number of symbols whose last occurrence
before i is more recent than s's:

    rank_i = #{ t : key_t(i) > key_s(i) },
    key_t(i) = last occurrence of t in [0, i), or -1 - t if unseen
               (unseen symbols keep their initial tail order).

last-occurrence tables are chunked cummax scans over a [chunk, alphabet]
one-hot expansion — vector ops only, no gathers in the scan.

Note: the production bzip2 pipeline keeps MTF on the C++ host path — BWT
output has tiny average MTF rank, so the byte-serial list walk runs at
memory speed and beats this kernel's fixed n x 256 work on current
hardware (measured; see bzip2_pipeline.py). The kernel exists for the
fused all-device pipeline and is differential-tested against a sequential
reference.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

CHUNK = 2048
NEG = np.int32(-300)


@functools.partial(jax.jit, static_argnames=("alpha",))
def mtf_ranks(v: jax.Array, length: jax.Array, alpha: int = 256) -> jax.Array:
    """v: [NB, n] int32 mapped symbol values (< alpha); length: [NB].
    Returns [NB, n] int32 MTF ranks (positions >= length are garbage)."""
    NB, n = v.shape
    pad = (-n) % CHUNK
    if pad:
        v = jnp.concatenate([v, jnp.zeros((NB, pad), v.dtype)], axis=1)
    nch = v.shape[1] // CHUNK
    vc = v.reshape(NB, nch, CHUNK)

    sym = jax.lax.broadcasted_iota(jnp.int32, (1, 1, alpha), 2)
    init_key = (jnp.int32(-1)
                - jax.lax.broadcasted_iota(jnp.int32, (NB, alpha), 1))

    def chunk_step(carry, xs):
        # carry: [NB, alpha] keys entering the chunk; xc: [NB, CHUNK]
        xc, base = xs
        onehot_pos = jnp.where(
            xc[:, :, None] == sym,
            base + jax.lax.broadcasted_iota(jnp.int32, (1, CHUNK, 1), 1),
            NEG)
        # last_occ within chunk, exclusive of the current position
        cmax_incl = jax.lax.cummax(onehot_pos, axis=1)
        cmax_excl = jnp.concatenate(
            [jnp.full((NB, 1, alpha), NEG, jnp.int32), cmax_incl[:, :-1]],
            axis=1)
        keys = jnp.maximum(carry[:, None, :],
                           jnp.where(cmax_excl >= 0,
                                     cmax_excl, NEG))  # [NB, CHUNK, alpha]
        own = jnp.take_along_axis(keys, xc[:, :, None], axis=2)
        ranks = jnp.sum((keys > own).astype(jnp.int32), axis=2)
        new_carry = jnp.maximum(carry,
                                jnp.where(cmax_incl[:, -1] >= 0,
                                          cmax_incl[:, -1], NEG))
        return new_carry, ranks

    bases = (jnp.arange(nch, dtype=jnp.int32) * CHUNK)
    _, ranks = jax.lax.scan(chunk_step, init_key,
                            (jnp.swapaxes(vc, 0, 1), bases))
    ranks = jnp.swapaxes(ranks, 0, 1).reshape(NB, n + pad)
    return ranks[:, :n]
