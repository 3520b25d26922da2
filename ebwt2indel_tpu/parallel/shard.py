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

import dataclasses
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


def _char_totals(pb: PackedBwt) -> np.ndarray:
    """Total A,C,G,T occurrence counts, from the F boundaries
    (dna_bwt.hpp:47-61: F = [#TERM, #TERM+#A, ..+#C, ..+#G]). Counts are
    true int64 on the host; device arrays carry their uint32 bit patterns
    (ops.coords) so totals past 2^31 encode."""
    F = pb.F.astype(np.int64)
    t = np.array([F[1] - F[0], F[2] - F[1], F[3] - F[2], pb.n - F[3]],
                 np.int64)
    return (t & 0xFFFFFFFF).astype(np.uint32).view(np.int32)


@dataclasses.dataclass(frozen=True)
class ShardedFM:
    """Device-mesh mirror of models.fm_index.FMIndex: packed block rows and
    absolute per-block counters sharded by row over the 'pos' axis, F
    replicated, plus the per-shard character-count boundaries that let
    select route a rank r to its owning shard.
    """

    mesh: Mesh
    blocks: jax.Array  # (rows*n_dev, 16) uint32, P(AXIS, None)
    block_counts: jax.Array  # (rows*n_dev, 4) int32, P(AXIS, None)
    F: jax.Array  # (4,) int32, replicated
    bounds: jax.Array  # (n_dev+1, 4) int32, replicated — counts of each
    # char before the first block of each shard; bounds[n_dev] = totals
    rows: int  # block rows per shard
    n: int
    term: int
    # bytes of the input THIS process actually read/packed (evidence for
    # the per-host sharded loader: ~n/n_procs, not n). 0 = not tracked
    # (full-pack path).
    local_bytes: int = 0


def _check_mesh_cap(n: int, n_dev: int, rows: int) -> None:
    """Coordinate-space guards for the sharded pipeline: one mesh run
    carries to n < CAP ~ 2^32 total positions (uint32 bit patterns,
    ops.coords — reference coordinates are uint64, include.hpp:25), and
    per-shard LOCAL offsets must stay below 2^31 (local flag/delta
    vectors are plain int32-indexed)."""
    from ..ops import packing as pk

    if n >= pk.CAP:
        raise ValueError(pk.CAP_MESSAGE)
    if rows * 128 >= 2**31:
        raise ValueError(
            f"per-shard span {rows * 128} positions >= 2^31: shard "
            f"{n} positions over at least {-(-(n + 2) // (2**31 - 2))} "
            f"devices (got {n_dev})"
        )


def shard_fm(pb: PackedBwt, mesh: Mesh) -> ShardedFM:
    n_dev = mesh.devices.size
    n_blocks = pb.blocks.shape[0]
    rows = -(-n_blocks // n_dev)
    _check_mesh_cap(pb.n, n_dev, rows)
    totals = _char_totals(pb)
    padded = np.zeros((rows * n_dev, 16), dtype=np.uint32)
    padded[:n_blocks] = pb.blocks
    # padding rows carry the TOTAL counts: rank(n) on a block-aligned n
    # reads them and gets the exact totals, and select's binary search
    # (counter <= r with r < total) can never land on a padding row
    padded[n_blocks:, 12:16] = totals.astype(np.uint32)
    counts = np.zeros((rows * n_dev, 4), dtype=np.int32)
    counts[:n_blocks] = pb.block_counts
    counts[n_blocks:] = totals

    bounds = np.empty((n_dev + 1, 4), np.int32)
    bounds[:-1] = counts[:: rows][:n_dev, :]
    bounds[-1] = totals

    rep = NamedSharding(mesh, P())
    return ShardedFM(
        mesh=mesh,
        blocks=jax.device_put(padded, NamedSharding(mesh, P(AXIS, None))),
        block_counts=jax.device_put(counts,
                                    NamedSharding(mesh, P(AXIS, None))),
        F=jax.device_put(
            (pb.F & 0xFFFFFFFF).astype(np.uint32).view(np.int32), rep),
        bounds=jax.device_put(bounds, rep),
        rows=rows, n=pb.n, term=pb.term,
    )


def shard_fm_from_file(path: str, mesh: Mesh, term: int = ord("#"),
                       n_threads: int = 2) -> ShardedFM:
    """Build a ShardedFM by packing ONLY the byte ranges this process's
    devices own — the sharded loader (SURVEY.md §2.5 "BWT split into
    contiguous shards per host"; VERDICT r2 missing #1/#3). Memmap-backed:
    only the owned pages are ever read."""
    import os

    n = os.path.getsize(path)
    data = np.memmap(path, dtype=np.uint8, mode="r")
    return shard_fm_from_loader(lambda lo, hi: data[lo:hi], n, mesh, term,
                                n_threads=n_threads)


def shard_fm_from_loader(loader, n: int, mesh: Mesh, term: int = ord("#"),
                         n_threads: int = 2) -> ShardedFM:
    """shard_fm_from_file over an arbitrary byte-range source.

    ``loader(lo_char, hi_char) -> uint8 array`` supplies characters of
    the (possibly derived) input — e.g. mode 3's DA-masked second index
    reads two memmaps and masks on the fly, never materializing the full
    O(n) masked string per process.

    Per device-shard: pack its block-row range with range-local counters,
    allgather the tiny (n_dev, 5) per-shard char totals across processes,
    exscan them into per-shard base counts, and add the base to make
    counters absolute. The packed rows then assemble into the global
    sharded array with jax.make_array_from_process_local_data — no
    process ever materializes (or even reads) more than its 1/n_procs
    slice of a multi-GB input. Single-process meshes take the same path
    (the allgather degenerates) with the per-shard packs spread over a
    small thread pool. ShardedFM.local_bytes records how much of the
    input this process actually read.
    """
    from concurrent.futures import ThreadPoolExecutor

    from ..ops import packing as pk

    n_dev = mesh.devices.size
    ranges = pk.shard_row_ranges(n, n_dev)
    n_blocks = n // 128 + 1
    rows = -(-n_blocks // n_dev)
    _check_mesh_cap(n, n_dev, rows)

    devs = list(mesh.devices.flat)
    my_proc = jax.process_index()
    local_ids = [s for s, d in enumerate(devs)
                 if d.process_index == my_proc]

    def _pack(s):
        row_lo, row_hi = ranges[s]
        if row_hi <= row_lo:
            return pk.pack_bytes_range(np.zeros(0, np.uint8), row_lo, 0,
                                       term)
        lo_char = row_lo * pk.BLOCK
        hi_char = min(row_hi * pk.BLOCK, n)
        return pk.pack_bytes_range(loader(lo_char, hi_char), row_lo,
                                   row_hi - row_lo, term)

    with ThreadPoolExecutor(max(1, n_threads)) as ex:
        packs = dict(zip(local_ids, ex.map(_pack, local_ids)))
    local_bytes = sum(
        (min(ranges[s][1] * pk.BLOCK, n) - ranges[s][0] * pk.BLOCK)
        for s in local_ids if ranges[s][1] > ranges[s][0]
    )

    # exchange the tiny per-shard totals; every process reconstructs the
    # same (n_dev, 5) table from the deterministic shard->process map
    local_totals = np.stack(
        [packs[s].totals for s in local_ids]
    ) if local_ids else np.zeros((0, 5), np.int64)
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        gathered = multihost_utils.process_allgather(local_totals)
        all_totals = np.zeros((n_dev, 5), np.int64)
        for p in range(jax.process_count()):
            ids_p = [s for s, d in enumerate(devs) if d.process_index == p]
            all_totals[ids_p] = np.asarray(gathered[p])[: len(ids_p)]
    else:
        all_totals = local_totals

    totals = all_totals.sum(axis=0)  # (5,) global char counts
    bases = np.zeros((n_dev, 4), np.int64)
    np.cumsum(all_totals[:-1, :4], axis=0, out=bases[1:])

    # absolute counters + per-shard padding to exactly `rows` rows
    # (padding counters hold the global totals, as in shard_fm)
    tot4 = totals[:4]
    local_rows = np.zeros((len(local_ids) * rows, 16), np.uint32)
    local_counts = np.zeros((len(local_ids) * rows, 4), np.int32)
    for k, s in enumerate(local_ids):
        sp = packs[s]
        pk.apply_shard_base(sp, bases[s])
        local_rows[k * rows : k * rows + sp.n_rows] = sp.rows
        local_rows[k * rows + sp.n_rows : (k + 1) * rows, 12:16] = \
            (tot4 & 0xFFFFFFFF).astype(np.uint32)
        local_counts[k * rows : k * rows + sp.n_rows] = \
            (sp.row_counts & 0xFFFFFFFF).astype(np.uint32).view(np.int32)
        local_counts[k * rows + sp.n_rows : (k + 1) * rows] = \
            (tot4 & 0xFFFFFFFF).astype(np.uint32).view(np.int32)

    bounds = np.empty((n_dev + 1, 4), np.int32)
    bounds[:-1] = (bases & 0xFFFFFFFF).astype(np.uint32).view(np.int32)
    bounds[-1] = (tot4 & 0xFFFFFFFF).astype(np.uint32).view(np.int32)

    sh = NamedSharding(mesh, P(AXIS, None))
    if jax.process_count() > 1:
        blocks = jax.make_array_from_process_local_data(
            sh, local_rows, (rows * n_dev, 16))
        block_counts = jax.make_array_from_process_local_data(
            sh, local_counts, (rows * n_dev, 4))
    else:
        blocks = jax.device_put(local_rows, sh)
        block_counts = jax.device_put(local_counts, sh)

    rep = NamedSharding(mesh, P())
    F = (pk.f_from_totals(totals)
         & 0xFFFFFFFF).astype(np.uint32).view(np.int32)
    return ShardedFM(
        mesh=mesh,
        blocks=blocks,
        block_counts=block_counts,
        F=jax.device_put(F, rep),
        bounds=jax.device_put(bounds, rep),
        rows=rows, n=n, term=term,
        local_bytes=int(local_bytes),
    )


def shard_packed(pb: PackedBwt, mesh: Mesh):
    """Place the packed block rows sharded by row across the mesh.

    Returns (blocks (n_blocks_padded, 16) sharded, block_counts sharded,
    F replicated, rows_per_shard).
    """
    sfm = shard_fm(pb, mesh)
    return sfm.blocks, sfm.block_counts, sfm.F, sfm.rows


def _local_decode(blocks_local, rows_per_shard, base, i):
    """Dense-lane rank decode of a flat query vector against local block
    rows (batch in the minor dimension so the VPU popcounts run on full
    lanes). Out-of-shard queries decode garbage — callers mask or drop."""
    b = jax.lax.shift_right_logical(i, 7)
    safe = jnp.clip(b - base, 0, rows_per_shard - 1)
    o = i & jnp.int32(127)
    rowT = blocks_local[safe].T
    p0, p1, p2 = rowT[0:4], rowT[4:8], rowT[8:12]
    cnt = rowT[12:16].astype(jnp.int32)
    w = jnp.arange(4, dtype=jnp.int32)[:, None]
    take = jnp.clip(o[None, :] - w * 32, 0, 32)
    sh = jnp.minimum(take, 31).astype(jnp.uint32)
    mask = jnp.where(take == 32, jnp.uint32(0xFFFFFFFF),
                     (jnp.uint32(1) << sh) - jnp.uint32(1))
    np2m = ~p2 & mask
    t0 = p0 & np2m
    tt1 = p1 & np2m
    t2 = p0 & tt1
    pc = jax.lax.population_count
    S = pc(np2m).sum(axis=0, dtype=jnp.int32)
    x = pc(t0).sum(axis=0, dtype=jnp.int32)
    y = pc(tt1).sum(axis=0, dtype=jnp.int32)
    z = pc(t2).sum(axis=0, dtype=jnp.int32)
    return jnp.stack(
        [cnt[0] + (S - x - y + z), cnt[1] + (x - z), cnt[2] + (y - z),
         cnt[3] + z], axis=-1)


def local_parallel_rank(blocks_local, rows_per_shard, i):
    """Per-shard contribution to parallel_rank inside a shard_map region:
    decode the queries whose block rows this shard owns, zero elsewhere;
    combine across shards with a psum. i: int32 [...] -> int32 [..., 4].

    OWNED-QUERY COMPACTION: the query vector is replicated (every shard
    holds all B queries), so routing needs no communication — each shard
    scatters the indices of its owned queries into a compact
    2B/n_dev-slot buffer, decodes only that buffer, and scatters answers
    back. Per-shard decode work is O(B/n_dev); total decode work stays O(B)
    regardless of mesh size (the round-1 replicated-decode formulation did
    O(B) per shard). The rare shard whose owned count overflows the 2x
    slack buffer falls back to dense local decode (lax.cond, local-only
    branches — the psum stays outside)."""
    sid = jax.lax.axis_index(AXIS)
    n_dev = jax.lax.axis_size(AXIS)
    base = sid * rows_per_shard
    shape = i.shape
    i = i.reshape(-1)
    B = i.shape[0]
    b = jax.lax.shift_right_logical(i, 7)
    local = b - base
    mine = (local >= 0) & (local < rows_per_shard)

    if n_dev == 1:
        out = _local_decode(blocks_local, rows_per_shard, base, i)
        out = jnp.where(mine[:, None], out, 0)
        return out.reshape(shape + (4,))

    cap = max(128, -(-2 * B // n_dev))  # 2x slack over a balanced split
    slot = jnp.cumsum(mine.astype(jnp.int32)) - 1
    count = slot[-1] + 1
    tgt = jnp.where(mine, slot, cap)

    def compact_path(_):
        qbuf = jnp.zeros(cap, jnp.int32).at[tgt].set(i, mode="drop")
        back = jnp.full(cap, B, jnp.int32).at[tgt].set(
            jnp.arange(B, dtype=jnp.int32), mode="drop"
        )
        dec = _local_decode(blocks_local, rows_per_shard, base, qbuf)
        return jnp.zeros((B, 4), jnp.int32).at[back].set(dec, mode="drop")

    def dense_path(_):
        out = _local_decode(blocks_local, rows_per_shard, base, i)
        return jnp.where(mine[:, None], out, 0)

    out = jax.lax.cond(count <= cap, compact_path, dense_path, None)
    return out.reshape(shape + (4,))


def _local_decode_multi(rows, o):
    """Decode k offsets per anchor row. rows: uint32 (cap, 16); o: int32
    (cap, k) in-block offsets all decoded against that row. Returns int32
    (cap, k, 4) — the sharded twin of ops.rank._decode_rank_T_multi."""
    rowT = rows.T  # (16, cap)
    p0 = rowT[0:4][:, None, :]
    p1 = rowT[4:8][:, None, :]
    p2 = rowT[8:12][:, None, :]
    cnt = rowT[12:16].astype(jnp.int32)  # (4, cap)
    w = jnp.arange(4, dtype=jnp.int32)[:, None, None]
    oT = o.T[None, :, :]  # (1, k, cap)
    take = jnp.clip(oT - w * 32, 0, 32)
    sh = jnp.minimum(take, 31).astype(jnp.uint32)
    mask = jnp.where(take == 32, jnp.uint32(0xFFFFFFFF),
                     (jnp.uint32(1) << sh) - jnp.uint32(1))
    np2m = ~p2 & mask
    t0 = p0 & np2m
    tt1 = p1 & np2m
    t2 = p0 & tt1
    pc = jax.lax.population_count
    S = pc(np2m).sum(axis=0, dtype=jnp.int32)  # (k, cap)
    x = pc(t0).sum(axis=0, dtype=jnp.int32)
    y = pc(tt1).sum(axis=0, dtype=jnp.int32)
    z = pc(t2).sum(axis=0, dtype=jnp.int32)
    out = jnp.stack(
        [cnt[0][None] + (S - x - y + z), cnt[1][None] + (x - z),
         cnt[2][None] + (y - z), cnt[3][None] + z], axis=-1)  # (k, cap, 4)
    return jnp.swapaxes(out, 0, 1)  # (cap, k, 4)


def local_parallel_rank_sorted(blocks_l, rows_per_shard, coords,
                               budget: int):
    """Per-shard contribution to the narrow 2-anchor sorted rank inside a
    shard_map region (the mesh twin of ops.rank.parallel_rank_sorted;
    combine with a psum). coords: int32 (C, k), rows non-decreasing.

    Owned-ANCHOR compaction: each node contributes 2 anchor queries (the
    blocks of coords[:,0] and coords[:,k-1]); a shard compacts the anchors
    whose rows it owns (2x-slack buffer as local_parallel_rank), gathers
    one row per owned anchor, and decodes all k offsets of the node
    against it — per-shard gather work is O(2C/n_dev) rows instead of
    O(kC/n_dev) queries. Coordinates select their own anchor (lo-anchor
    entries answer ~use_hi coordinates, hi-anchor entries use_hi ones), so
    the psum-add never double-counts. Rows straddling >= 3 blocks are
    fixed exactly by a budget-sliced side loop over the replicated wide
    mask (deterministic lockstep across shards: bv_select indices are
    computed identically everywhere; only the dense rank is sharded, with
    the psum inside the loop body)."""
    from ..ops import bits as bits_ops

    sid = jax.lax.axis_index(AXIS)
    n_dev = jax.lax.axis_size(AXIS)
    base = sid * rows_per_shard
    C, k = coords.shape
    b = jax.lax.shift_right_logical(coords, 7)
    o = coords & jnp.int32(127)
    use_hi = b == b[:, k - 1][:, None]  # replicated
    lo_cov = ~use_hi & (b == b[:, :1])

    anchors = jnp.stack([b[:, 0], b[:, k - 1]], axis=1).reshape(-1)  # (2C,)
    local = anchors - base
    mine = (local >= 0) & (local < rows_per_shard)
    cap = max(128, -(-4 * C // n_dev))
    slot = jnp.cumsum(mine.astype(jnp.int32)) - 1
    count = slot[-1] + 1
    tgt = jnp.where(mine, slot, cap)

    def anchor_path(_):
        ids = jnp.full(cap, 2 * C, jnp.int32).at[tgt].set(
            jnp.arange(2 * C, dtype=jnp.int32), mode="drop"
        )
        nbuf = jnp.minimum(jax.lax.shift_right_logical(ids, 1), C - 1)
        abuf = anchors[jnp.minimum(ids, 2 * C - 1)]
        rows = blocks_l[jnp.clip(abuf - base, 0, rows_per_shard - 1)]
        dec = _local_decode_multi(rows, o[nbuf])  # (cap, k, 4)
        is_hi = (ids & 1) == 1
        sel = jnp.where(is_hi[:, None], use_hi[nbuf], lo_cov[nbuf])
        sel = sel & (ids < 2 * C)[:, None]
        dec = jnp.where(sel[:, :, None], dec, 0)
        return jnp.zeros((C, k, 4), jnp.int32).at[
            jnp.where(ids < 2 * C, nbuf, C)
        ].add(dec, mode="drop")

    def dense_path(_):
        out = local_parallel_rank(blocks_l, rows_per_shard, coords)
        return jnp.where((use_hi | lo_cov)[:, :, None], out, 0)

    dec = jax.lax.cond(count <= cap, anchor_path, dense_path, None)

    # wide rows: replicated mask, budget-sliced side loop; only the dense
    # rank inside is sharded (psum'd by the caller via the final psum? no —
    # contributions stay local; each shard zeroes non-owned answers just
    # like local_parallel_rank, and the caller's single psum combines
    # everything at once)
    wide = ~jnp.all(use_hi | (b == b[:, :1]), axis=1)
    n_wide = jnp.sum(wide.astype(jnp.int32))
    words, counts = bits_ops.bv_build(wide.astype(jnp.uint8))
    ar = jnp.arange(budget, dtype=jnp.int32)

    def wcond(state):
        return state[0] * budget < n_wide

    def wstep(state):
        it, dec = state
        r = it * budget + ar
        ok = r < n_wide
        sel = rank.bv_select(words, counts, jnp.where(ok, r, 0))
        sel = jnp.clip(sel, 0, C - 1)
        wdec = local_parallel_rank(blocks_l, rows_per_shard, coords[sel])
        dec = dec.at[jnp.where(ok, sel, C)].set(wdec, mode="drop")
        return it + 1, dec

    _, dec = jax.lax.while_loop(wcond, wstep, (jnp.int32(0), dec))
    return dec


def local_select(blocks_l, counts_l, bounds, rows_per_shard, r, c):
    """Per-shard contribution to batched select inside a shard_map region:
    the shard owning the (r+1)-th occurrence of char c (by the replicated
    per-shard count boundaries) runs the block binary search on its local
    absolute counters plus the in-block descent; others contribute 0 —
    combine with a psum. Padding counters hold totals, so the search can
    never resolve to a padding row for a valid r < total."""
    from ..ops.coords import uclip, uge, ult, umax

    sid = jax.lax.axis_index(AXIS)
    base = sid * rows_per_shard
    cc = jnp.clip(c, 0, 3)
    lo_b = bounds[sid][cc]
    hi_b = bounds[sid + 1][cc]
    # ranks/boundaries are uint32 bit patterns (ops.coords): compare and
    # clamp the unsigned view so counts past 2^31 route correctly
    mine = uge(r, lo_b) & ult(r, hi_b)
    r_safe = uclip(r, lo_b, umax(hi_b - 1, lo_b))
    lb = rank.select_block(counts_l, r_safe, cc)
    pos = (base + lb) * rank.BLOCK + rank.select_in_block(
        blocks_l[lb], r_safe, cc
    )
    return jnp.where(mine, pos, 0)


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
        return jax.lax.psum(
            local_parallel_rank(blocks_local, rows_per_shard, i), AXIS
        )

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
