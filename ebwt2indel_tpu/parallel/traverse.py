"""Position-sharded wavefront traversal over a device mesh.

Multi-chip execution of the mode-1 traversal (models/traverse.py): the packed
index rows and the flag vectors are sharded over a 1-D 'pos' mesh; the work
queue is replicated (it is tiny relative to the index) and every device runs
the same deterministic queue schedule, so the only communication is one psum
per chunk combining the per-shard rank answers.

This is the simple psum formulation: each device decodes every query against
its clamped local rows and zeroes non-owned answers, so VPU decode work is
replicated while HBM gather traffic is sharded. The production multi-host
design routes queries to their owning shard with an all_to_all instead
(SURVEY.md §2.5); on a single slice the psum variant is bandwidth-equivalent
for the gather, which is the scarce resource.

Validated against the single-device traversal on a virtual CPU mesh
(tests/test_parallel.py).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from ..models import traverse as t1
from ..ops import rank
from ..ops.packing import PackedBwt
from . import shard

AXIS = shard.AXIS


@partial(jax.jit,
         static_argnames=("mesh", "rows_per_shard", "local_n", "queue_cap",
                          "chunk", "K", "k_right"))
def _sharded_node_phase(mesh, blocks, F, init, nf, *, rows_per_shard,
                        local_n, queue_cap, chunk, K, k_right):
    """Internal-node phase with sharded index + flags, replicated queue."""

    @partial(jax.shard_map, mesh=mesh,
             in_specs=(P(AXIS, None), P(), P(), P(AXIS)),
             out_specs=(P(AXIS), P(), P()),
             check_vma=False)
    def run(blocks_l, F_rep, init_rep, nf_l):
        sid = jax.lax.axis_index(AXIS)
        pos_base = sid * local_n
        w = 7
        q = jnp.zeros((queue_cap + 4 * chunk, w), dtype=jnp.int32)
        q = jax.lax.dynamic_update_slice(q, init_rep, (0, 0))

        def extend(nodes):
            coords = nodes[:, :6]
            ranks = jax.lax.psum(
                shard.local_parallel_rank(blocks_l, rows_per_shard, coords), AXIS
            )
            ext = F_rep[:, None] + jnp.swapaxes(ranks, -1, -2)
            depth = jnp.broadcast_to(nodes[:, 6:7, None] + 1,
                                     ext.shape[:-1] + (1,))
            return jnp.concatenate([ext, depth], axis=-1)

        def cond(state):
            _, head, tail, _, _ = state
            return head < tail

        def step(state):
            q, head, tail, nf_l, stats = state
            need = (tail + 4 * chunk) > q.shape[0]
            q = jax.lax.cond(need, lambda a, h: jnp.roll(a, -h, axis=0),
                             lambda a, h: a, q, head)
            tail = jnp.where(need, tail - head, tail)
            head = jnp.where(need, 0, head)
            count = jnp.minimum(tail - head, chunk)
            block = jax.lax.dynamic_slice(q, (head, jnp.int32(0)), (chunk, w))
            valid = jnp.arange(chunk, dtype=jnp.int32) < count

            depth = block[:, 6]
            last = block[:, 5]
            dummy = jnp.int32(2**30)
            idxs, vals = [], []
            lcp_values = jnp.int32(0)
            n_min = jnp.int32(0)
            for j in range(1, 5):
                border = block[:, j]
                has_prev = border > block[:, j - 1]
                condb = valid & has_prev & (border != last)
                lcp_values = lcp_values + condb.sum(dtype=jnp.int32)
                v = ((condb & (depth >= K)) * 1
                     + (condb & (depth >= k_right)) * 2)
                if j >= 2:
                    prev_size = border - block[:, j - 1]
                    cond_m = valid & (prev_size >= 2) & (border < last - 1)
                    n_min = n_min + cond_m.sum(dtype=jnp.int32)
                    v = v + cond_m * 4
                idxs.append(jnp.where(v > 0, border, dummy))
                vals.append(v)
            # local scatter of globally-indexed writes
            gi = jnp.concatenate(idxs) - pos_base
            gv = jnp.concatenate(vals)
            safe = jnp.where((gi >= 0) & (gi < local_n), gi, local_n)
            nf_l = nf_l.at[safe].add(gv, mode="drop")

            ext = extend(block)
            nch = jnp.sum(
                (ext[..., 1:6] > ext[..., 0:5]).astype(jnp.int32), axis=-1
            )
            keep = (valid[:, None] & (nch >= 2)).reshape(-1)
            out, n_out = t1._compact(ext.reshape(-1, w), keep)
            q = jax.lax.dynamic_update_slice(q, out, (tail, jnp.int32(0)))
            head = head + count
            tail = tail + n_out
            stats = (stats[0] + count, stats[1] + lcp_values,
                     stats[2] + n_min)
            return q, head, tail, nf_l, stats

        stats0 = (jnp.int32(0),) * 3
        state = (q, jnp.int32(0), jnp.int32(init_rep.shape[0]), nf_l, stats0)
        q, head, tail, nf_l, stats = jax.lax.while_loop(cond, step, state)
        return nf_l, jnp.stack(stats), tail

    return run(blocks, F, init, nf)


def navigate_nodes_sharded(pb: PackedBwt, mesh, K: int, k_right: int):
    """Run the sharded internal-node phase; returns (thr_K, thr_R, minima)
    as host arrays plus stats. Flags are reassembled from the sharded
    bit-flag vector."""
    n_dev = mesh.devices.size
    blocks, block_counts, F, rows = shard.shard_packed(pb, mesh)
    local_n = -(-pb.n // n_dev)
    pad_n = local_n * n_dev
    nf = jax.device_put(np.zeros(pad_n, np.int32),
                        NamedSharding(mesh, P(AXIS)))
    Fh = pb.F.astype(np.int32)
    init = np.array([[0, Fh[0], Fh[1], Fh[2], Fh[3], pb.n, 0]], np.int32)
    nf, stats, total = _sharded_node_phase(
        mesh, blocks, jnp.asarray(F), jnp.asarray(init), nf,
        rows_per_shard=rows, local_n=local_n,
        queue_cap=max(1 << 18, pb.n // 32), chunk=4096, K=K, k_right=k_right,
    )
    nf_h = np.asarray(nf)[: pb.n]
    return ((nf_h & 1) != 0).astype(np.uint8), \
        ((nf_h & 2) != 0).astype(np.uint8), \
        ((nf_h & 4) != 0).astype(np.uint8), np.asarray(stats)


@partial(jax.jit,
         static_argnames=("mesh", "rows_per_shard", "local_n", "queue_cap",
                          "chunk", "K", "k_right"))
def _sharded_leaf_phase(mesh, blocks, F, init, dif, *, rows_per_shard,
                        local_n, queue_cap, chunk, K, k_right):
    """Leaf phase with sharded index + diff fields, replicated queue.

    dif is a (2, local_n*n_dev)-sharded int32 buffer: field 0 = K-diff,
    field 1 = k_right-diff boundary deltas (models/traverse._leaf_body).
    """

    @partial(jax.shard_map, mesh=mesh,
             in_specs=(P(AXIS, None), P(), P(), P(None, AXIS)),
             out_specs=(P(None, AXIS), P(), P()),
             check_vma=False)
    def run(blocks_l, F_rep, init_rep, dif_l):
        sid = jax.lax.axis_index(AXIS)
        pos_base = sid * local_n
        w = 3
        q = jnp.zeros((queue_cap + 4 * chunk, w), dtype=jnp.int32)
        q = jax.lax.dynamic_update_slice(q, init_rep, (0, 0))

        def cond(state):
            _, head, tail, _, _ = state
            return head < tail

        def step(state):
            q, head, tail, dif_l, stats = state
            need = (tail + 4 * chunk) > q.shape[0]
            q = jax.lax.cond(need, lambda a, h: jnp.roll(a, -h, axis=0),
                             lambda a, h: a, q, head)
            tail = jnp.where(need, tail - head, tail)
            head = jnp.where(need, 0, head)
            count = jnp.minimum(tail - head, chunk)
            block = jax.lax.dynamic_slice(q, (head, jnp.int32(0)), (chunk, w))
            valid = jnp.arange(chunk, dtype=jnp.int32) < count
            first, second, depth = block[:, 0], block[:, 1], block[:, 2]

            dummy = jnp.int32(2**30)
            condK = valid & (depth >= K)
            condR = valid & (depth >= k_right)
            one = jnp.ones(chunk, jnp.int32)
            fields = jnp.concatenate([
                jnp.zeros(2 * chunk, jnp.int32),
                jnp.ones(2 * chunk, jnp.int32),
            ])
            gi = jnp.concatenate([
                jnp.where(condK, first + 1, dummy),
                jnp.where(condK, second, dummy),
                jnp.where(condR, first + 1, dummy),
                jnp.where(condR, second, dummy),
            ]) - pos_base
            gv = jnp.concatenate([one, -one, one, -one])
            mine = (gi >= 0) & (gi < local_n)
            safe_pos = jnp.where(mine, gi, local_n)
            flat_idx = fields * (local_n + 1) + safe_pos
            dif_flat = jnp.concatenate(
                [dif_l[0], jnp.zeros(1, jnp.int32),
                 dif_l[1], jnp.zeros(1, jnp.int32)]
            )
            dif_flat = dif_flat.at[flat_idx].add(gv, mode="drop")
            dif_l = jnp.stack([dif_flat[: local_n],
                               dif_flat[local_n + 1: 2 * local_n + 1]])

            ranks = jax.lax.psum(
                shard.local_parallel_rank(blocks_l, rows_per_shard,
                                     jnp.stack([first, second], -1)), AXIS
            )  # (chunk, 2, 4)
            lo4 = F_rep + ranks[:, 0]
            hi4 = F_rep + ranks[:, 1]
            child_depth = jnp.broadcast_to((depth + 1)[:, None], lo4.shape)
            children = jnp.stack([lo4, hi4, child_depth], axis=-1)
            keep = (valid[:, None] & ((hi4 - lo4) >= 2))
            out, n_out = t1._compact(
                jnp.swapaxes(children, 0, 1).reshape(chunk * 4, w),
                jnp.swapaxes(keep, 0, 1).reshape(chunk * 4),
            )
            q = jax.lax.dynamic_update_slice(q, out, (tail, jnp.int32(0)))
            head = head + count
            tail = tail + n_out
            stats = (stats[0] + count,
                     stats[1] + jnp.sum(jnp.where(valid, second - first - 1,
                                                  0)),
                     stats[2])
            return q, head, tail, dif_l, stats

        stats0 = (jnp.int32(0),) * 3
        state = (q, jnp.int32(0), jnp.int32(init_rep.shape[0]), dif_l, stats0)
        q, head, tail, dif_l, stats = jax.lax.while_loop(cond, step, state)
        return dif_l, jnp.stack(stats), tail

    return run(blocks, F, init, dif)


@partial(jax.jit, static_argnames=("mesh",))
def _combine_flags(mesh, nf, dif):
    """Merge the node-phase bit flags with the leaf-phase boundary deltas
    into the final sharded flag vectors.

    The range fill is a global inclusive prefix sum of the sharded deltas:
    local cumsum + the exclusive cross-shard prefix of per-shard totals
    (one all_gather of n_dev scalars over ICI).
    """

    @partial(jax.shard_map, mesh=mesh,
             in_specs=(P(AXIS), P(None, AXIS)),
             out_specs=(P(AXIS),) * 3)
    def run(nf_l, dif_l):
        sid = jax.lax.axis_index(AXIS)
        n_dev = jax.lax.axis_size(AXIS)
        cs = jnp.cumsum(dif_l, axis=1)  # (2, local_n)
        totals = jax.lax.all_gather(cs[:, -1], AXIS)  # (n_dev, 2)
        before = jnp.arange(n_dev, dtype=jnp.int32) < sid
        prefix = jnp.sum(jnp.where(before[:, None], totals, 0), axis=0)
        fill = (cs + prefix[:, None]) > 0
        thr_K = ((nf_l & 1) != 0) | fill[0]
        thr_R = ((nf_l & 2) != 0) | fill[1]
        minima = (nf_l & 4) != 0
        return thr_K, thr_R, minima

    return run(nf, dif)


def navigate_one_bwt_sharded_device(sfm: shard.ShardedFM, K: int,
                                    k_right: int):
    """Full sharded mode-1 navigation; flags STAY on device.

    Returns (thr_K, thr_R, minima) — bool jax.Arrays of padded length
    local_n * n_dev sharded P('pos') — plus (local_n, stats). Positions
    >= sfm.n are padding (their flags are always False: no traversal
    write targets them).
    """
    mesh = sfm.mesh
    n_dev = mesh.devices.size
    local_n = -(-(sfm.n + 2) // n_dev)  # room for deltas at n and n+1
    pad_n = local_n * n_dev
    queue_cap = max(1 << 18, sfm.n // 32)

    Fh = np.asarray(sfm.F)
    dif = jax.device_put(np.zeros((2, pad_n), np.int32),
                         NamedSharding(mesh, P(None, AXIS)))
    init_l = np.array([[0, Fh[0], 0]], np.int32)
    dif, st_l, _ = _sharded_leaf_phase(
        mesh, sfm.blocks, sfm.F, jnp.asarray(init_l), dif,
        rows_per_shard=sfm.rows, local_n=local_n,
        queue_cap=queue_cap, chunk=4096, K=K, k_right=k_right,
    )

    nf = jax.device_put(np.zeros(pad_n, np.int32),
                        NamedSharding(mesh, P(AXIS)))
    init_n = np.array([[0, Fh[0], Fh[1], Fh[2], Fh[3], sfm.n, 0]], np.int32)
    nf, st_n, _ = _sharded_node_phase(
        mesh, sfm.blocks, sfm.F, jnp.asarray(init_n), nf,
        rows_per_shard=sfm.rows, local_n=local_n,
        queue_cap=queue_cap, chunk=4096, K=K, k_right=k_right,
    )

    thr_K, thr_R, minima = _combine_flags(mesh, nf, dif)
    return thr_K, thr_R, minima, (local_n, (st_l, st_n))


def navigate_one_bwt_sharded(pb: PackedBwt, mesh, K: int, k_right: int):
    """Host-array wrapper over navigate_one_bwt_sharded_device, equivalent
    to models.traverse.navigate_one_bwt (parity-tested)."""
    sfm = shard.shard_fm(pb, mesh)
    thr_K, thr_R, minima, (_, stats) = navigate_one_bwt_sharded_device(
        sfm, K, k_right
    )
    return (np.asarray(thr_K)[: pb.n].astype(np.uint8),
            np.asarray(thr_R)[: pb.n].astype(np.uint8),
            np.asarray(minima)[: pb.n].astype(np.uint8), stats)
