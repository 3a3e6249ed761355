"""Workarounds for the axon TPU relay in this environment.

Empirically (see .claude/skills/verify/SKILL.md): the FIRST device-to-host
transfer of a buffer produced by a jitted program containing
`lax.fori_loop`/`scan` can stall 70-360 s in the relay. Running any small
separate device computation that consumes the result first avoids the
stall entirely. `fetch()` wraps that workaround; it is a no-op-cost copy
elsewhere (CPU tests, plain TPU runtimes).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

_consume = None


def fetch(x) -> np.ndarray:
    """device_get with the post-loop-kernel stall workaround."""
    global _consume
    if _consume is None:
        _consume = jax.jit(lambda a: a + jnp.zeros((), a.dtype))
    y = _consume(x)
    jax.block_until_ready(y)
    return np.asarray(jax.device_get(y))


def fetch_tree(tree):
    return jax.tree_util.tree_map(fetch, tree)


_consume_many = {}


def fetch_many(*xs):
    """One consume dispatch + transfers for several arrays (saves the
    per-array sync round-trips of repeated fetch())."""
    key = tuple((x.shape, str(x.dtype)) for x in xs)
    if key not in _consume_many:
        _consume_many[key] = jax.jit(
            lambda *a: tuple(v + jnp.zeros((), v.dtype) for v in a))
    ys = _consume_many[key](*xs)
    jax.block_until_ready(ys)
    return [np.asarray(jax.device_get(y)) for y in ys]
