"""Greedy LZSS parse as pointer-doubling reachability (SURVEY.md §7 hard
part 1: "greedy via pointer-jumping").

The sequential greedy parse is the chain p -> p + step(p) with
step(p) = match_len(p) if a valid match starts at p else 1. The token set
is exactly the set of positions reachable from the block start, computed in
log2(BLOCK) rounds of jump-doubling:

  S_0 = {0};  S_{r+1} = S_r ∪ f_{2^r}(S_r);  f_{2^{r+1}} = f_{2^r} ∘ f_{2^r}

(every step count has a unique binary decomposition, so the union over all
rounds enumerates the whole chain). Each round is one gather + one
scatter-max over [NB, BLOCK] — no sequential scan anywhere.

Produces the identical token stream to cpp/lzss.cc's while-loop.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tpz.kernels.matchfinder import MIN_MATCH


@jax.jit
def greedy_parse(match_len: jax.Array, match_dist: jax.Array,
                 block_len: jax.Array):
    """match_len/match_dist: [NB, BLOCK] int32 (0 where no match).
    block_len: [NB] int32 — valid bytes in each block.

    Returns:
      is_token [NB, BLOCK] bool — a token starts at this position
      token_idx [NB, BLOCK] int32 — dense index of the token (valid where
        is_token)
      ntokens [NB] int32
    """
    NB, block = match_len.shape
    pos = jax.lax.broadcasted_iota(jnp.int32, (NB, block), 1)
    step = jnp.where(match_len >= MIN_MATCH, match_len, 1)
    # Clamp: jumps out of the block land on the sentinel column BLOCK
    # (handled by padding f with one extra column).
    nxt = jnp.minimum(pos + step, block)
    f = jnp.concatenate([nxt, jnp.full((NB, 1), block, jnp.int32)], axis=1)

    reach = jnp.zeros((NB, block + 1), jnp.bool_)
    reach = reach.at[:, 0].set(True)
    nbidx = jax.lax.broadcasted_iota(jnp.int32, (NB, block + 1), 0)

    rounds = block.bit_length()  # 17 for 65536
    for _ in range(rounds):
        target = f
        reach = reach.at[nbidx, target].max(reach)
        f = f[nbidx, f]

    reach = reach[:, :block]
    # Positions at/after block_len are not tokens.
    is_token = reach & (pos < block_len[:, None])
    cum = jnp.cumsum(is_token.astype(jnp.int32), axis=1)
    token_idx = cum - 1
    ntokens = cum[:, -1]
    return is_token, token_idx, ntokens
