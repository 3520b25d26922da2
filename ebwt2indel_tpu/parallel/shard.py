"""Position-sharded execution over a 1-D device mesh.

The reference's only parallelism is process-level input sharding
(pebwt2InDel.sh:49-83). Here the BWT *position axis* is sharded across
devices (SURVEY.md §2.5): the packed block rows live distributed in HBM,
rank queries are answered by the owning shard and combined with a psum,
flag-vector updates scatter locally, and the cluster scan exchanges a
1-element halo with its left neighbor over ICI.

All collectives are XLA collectives (psum / ppermute) inside shard_map over a
Mesh axis named 'pos' — multi-host ready (the same program runs under
jax.distributed with a global mesh).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops import rank
from ..ops.packing import PackedBwt

AXIS = "pos"


def make_mesh(n_devices: int | None = None) -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (AXIS,))


def shard_packed(pb: PackedBwt, mesh: Mesh):
    """Place the packed block rows sharded by row across the mesh.

    Returns (blocks (n_blocks_padded, 16) sharded, block_counts sharded,
    F replicated, rows_per_shard).
    """
    n_dev = mesh.devices.size
    n_blocks = pb.blocks.shape[0]
    rows = -(-n_blocks // n_dev)
    padded = np.zeros((rows * n_dev, 16), dtype=np.uint32)
    padded[:n_blocks] = pb.blocks
    # padding rows replicate the final counters so rank(i >= n) stays sane
    padded[n_blocks:, 12:16] = pb.blocks[-1, 12:16]
    counts = np.zeros((rows * n_dev, 4), dtype=np.int32)
    counts[:n_blocks] = pb.block_counts
    counts[n_blocks:] = pb.block_counts[-1]

    blocks = jax.device_put(padded, NamedSharding(mesh, P(AXIS, None)))
    block_counts = jax.device_put(counts, NamedSharding(mesh, P(AXIS, None)))
    F = jax.device_put(pb.F.astype(np.int32), NamedSharding(mesh, P()))
    return blocks, block_counts, F, rows


def sharded_parallel_rank(mesh: Mesh, rows_per_shard: int):
    """Build a sharded batched parallel_rank: each device answers the queries
    whose block it owns; answers combine with one psum over the mesh."""

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(AXIS, None), P()),
        out_specs=P(),
    )
    def _rank(blocks_local, i):
        shard = jax.lax.axis_index(AXIS)
        base = shard * rows_per_shard  # first block row owned
        b = jax.lax.shift_right_logical(i, 7)
        local = b - base
        mine = (local >= 0) & (local < rows_per_shard)
        safe = jnp.clip(local, 0, rows_per_shard - 1)
        # local rank computation on owned rows
        o = i & jnp.int32(127)
        row = blocks_local[safe]
        masks = rank._prefix_masks(o)
        chars = rank._char_plane_words(row)
        inblock = jax.lax.population_count(chars & masks[..., None, :]).sum(
            axis=-1, dtype=jnp.int32
        )
        counts = row[..., 12:16].astype(jnp.int32) + inblock
        counts = jnp.where(mine[..., None], counts, 0)
        return jax.lax.psum(counts, AXIS)

    return _rank


def sharded_cluster_scan(mesh: Mesh):
    """Sharded phase-4 mask + run statistics.

    thr_K / minima are position-sharded uint8 vectors. Each shard computes its
    local cluster-open mask, receives the left neighbor's boundary state via
    ppermute (halo of 1), and emits psum'd global statistics plus per-shard
    run-boundary flags (cluster starts) used to enumerate clusters.
    """

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(AXIS), P(AXIS)),
        out_specs=(P(AXIS), P(), P()),
    )
    def _scan(thr_local, min_local):
        mask = (thr_local != 0) & (min_local == 0)
        n_dev = jax.lax.axis_size(AXIS)
        # halo: last mask element of the left neighbor
        last = mask[-1].astype(jnp.int32)
        left_last = jax.lax.ppermute(
            last, AXIS, [(i, (i + 1) % n_dev) for i in range(n_dev)]
        )
        idx = jax.lax.axis_index(AXIS)
        left_last = jnp.where(idx == 0, 0, left_last)
        prev = jnp.concatenate([left_last[None].astype(mask.dtype), mask[:-1]])
        starts = mask & ~prev
        n_starts = jax.lax.psum(starts.sum(dtype=jnp.int32), AXIS)
        n_in = jax.lax.psum(mask.sum(dtype=jnp.int32), AXIS)
        return starts.astype(jnp.uint8), n_starts, n_in

    return _scan


# NOTE: an earlier `sharded_wave_step` demo (a simplified duplicate of
# models/traverse._node_body) was removed — the production sharded traversal
# lives in parallel/traverse.py and is tested for exact flag parity against
# the single-device path (tests/test_parallel.py).
