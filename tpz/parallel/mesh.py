"""Device mesh + sharded encode step (SURVEY.md §2.2/§2.3).

The reference crate is strictly single-threaded; every parallel structure
here is new. Primary strategy: data-parallel over independent DEFLATE
blocks (`dp` axis), with the 32 KiB window halo passed between neighboring
shards (the sequence-parallel analogue of ring-attention halo exchange) and
an ordered gather of per-shard compressed sizes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P


def make_mesh(n_devices: int | None = None, axis: str = "dp") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def sharded_encode_step(mesh: Mesh, k: int = 4, window: int = 512,
                        block: int = 1024):
    """Builds the jitted sharded one-step encode: blocks sharded over `dp`,
    per-device match-find + parse + histogram, halo via ppermute, ordered
    all_gather of per-block token counts/histograms (the variable-length
    gather pattern's fixed-size prologue; SURVEY.md §2.3 item 3).

    Sizes are parameters so the dry-run can use tiny shapes; the real
    pipeline uses window=32768, block=65536.
    """
    from tpz.kernels.matchfinder import find_matches
    from tpz.kernels.parse import greedy_parse

    axis = mesh.axis_names[0]
    ndev = mesh.devices.size
    fwd = 512

    def per_shard(base, span_off, span_len):
        # base: [NBl, block] local blocks (already windowed layout without
        # halos). Halo exchange: each shard needs the last `window` bytes of
        # the previous shard's last block.
        NBl = base.shape[0]
        # intra-shard halos (previous block's tail)
        prev_tail = jnp.concatenate(
            [jnp.zeros((1, window), base.dtype), base[:-1, block - window:]],
            axis=0)
        # inter-shard halo: previous shard's last-block tail via ppermute
        last_tail = base[-1:, block - window:]
        recv = jax.lax.ppermute(
            last_tail, axis, [(i, (i + 1) % ndev) for i in range(ndev)])
        first_halo = jnp.where(
            (jax.lax.axis_index(axis) == 0)[None, None], 0, recv)
        prev_tail = prev_tail.at[0:1].set(first_halo)
        # forward pad: next block's head (zeros at shard end — a match may
        # not cross the shard's final block end anyway)
        next_head = jnp.concatenate(
            [base[1:, :fwd], jnp.zeros((1, fwd), base.dtype)], axis=0)
        haloed = jnp.concatenate([prev_tail, base, next_head],
                                 axis=1).astype(jnp.int32)
        mlen, mdist = find_matches(haloed, span_off, span_len, k=k,
                                   window=window, block=block)
        block_len = jnp.minimum(
            jnp.maximum(span_len - span_off, 0), block)
        is_token, token_idx, ntokens = greedy_parse(mlen, mdist, block_len)
        # Ordered fixed-size gather of per-block token counts — the
        # metadata prologue of the ordered ragged all-gather.
        all_counts = jax.lax.all_gather(ntokens, axis, tiled=True)
        return mlen, mdist, is_token, all_counts

    @functools.partial(jax.jit)
    def step(blocks, span_off, span_len):
        from jax import shard_map

        sharded = shard_map(
            per_shard,
            mesh=mesh,
            in_specs=(P(axis, None), P(axis), P()),
            out_specs=(P(axis, None), P(axis, None), P(axis, None), P()),
            check_vma=False,
        )
        return sharded(blocks, span_off, span_len)

    return step


def ragged_all_gather(mesh: Mesh, payload_pad: jax.Array,
                      sizes: jax.Array):
    """Ordered variable-length gather (SURVEY.md §2.3 pattern 3).

    payload_pad: [n_dev, CAP] uint8 — each device's ragged payload, padded;
    sizes: [n_dev] int32 actual lengths. Under shard_map: all_gather the
    small size vector, prefix-sum offsets, all_gather the padded payloads,
    then every device materializes the in-order concatenation.
    Returns (gathered [n_dev*CAP] uint8 concatenated by offset, total int32).
    """
    from jax import shard_map

    axis = mesh.axis_names[0]
    ndev = mesh.devices.size
    cap = payload_pad.shape[-1]

    def body(pay, sz):
        all_sizes = jax.lax.all_gather(sz, axis, tiled=True)      # [ndev]
        offsets = jnp.cumsum(all_sizes) - all_sizes               # excl scan
        all_pay = jax.lax.all_gather(pay, axis, tiled=True)       # [ndev,CAP]
        total_cap = ndev * cap
        out = jnp.zeros((total_cap,), jnp.uint8)
        # Scatter each device's payload to its stream offset.
        col = jax.lax.broadcasted_iota(jnp.int32, (ndev, cap), 1)
        dev = jax.lax.broadcasted_iota(jnp.int32, (ndev, cap), 0)
        dst = offsets[:, None] + col
        live = col < all_sizes[:, None]
        dst = jnp.where(live, dst, total_cap)  # park padding
        out = jnp.zeros((total_cap + 1,), jnp.uint8).at[
            dst.reshape(-1)].add(jnp.where(live, all_pay, 0).reshape(-1),
                                 mode="drop")
        del dev
        return out[:total_cap], jnp.sum(all_sizes)

    return jax.jit(shard_map(
        body, mesh=mesh,
        in_specs=(P(axis, None), P(axis)),
        out_specs=(P(), P()),
        check_vma=False,
    ))(payload_pad, sizes)
