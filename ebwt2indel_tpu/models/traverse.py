"""Level-synchronous wavefront traversal of the implicit suffix tree.

TPU-first re-architecture of the reference's two stack-DFS loops
(reference: ebwt2InDel.cpp:555-676 for one BWT, 679-831 for the lockstep
two-BWT merge). The key observation (SURVEY.md §2.5): every write performed
during the traversal — LCP_threshold bits, LCP_minima bits, document-array
bits — targets a position determined solely by the visited node, independent
of visit order. The traversal is therefore order-free and can proceed as
breadth-first *waves*: a frontier of thousands of suffix-tree leaves/nodes is
extended per device dispatch through batched rank queries.

Range fills (leaf-interior LCP flags, ebwt2InDel.cpp:344-355; DA intervals,
ebwt2InDel.cpp:394-449) use a scatter of +/-1 boundary deltas plus one final
cumsum instead of per-position writes — O(#leaves) scatter + O(n) scan,
instead of the reference's O(n) sequential bit writes.

Per-wave host work is one scalar readback (the next frontier size); frontier
buffers are padded to power-of-two buckets so the number of distinct compiled
shapes stays logarithmic.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from . import fm_index as fm_ops
from .fm_index import FMIndex

MIN_BUCKET = 512
MAX_BUCKET = 1 << 17  # frontier chunk cap: bounds the set of compiled shapes
# to log2(MAX_BUCKET/MIN_BUCKET)+1 buckets per wave function — first-compile
# cost matters on TPU where compiles go through a remote service


def _bucket(n: int) -> int:
    b = MIN_BUCKET
    while b < n:
        b *= 2
    return b


def _drive(wave, frontier_np: np.ndarray, width: int, on_stats):
    """Chunked frontier driver: process the pending frontier in power-of-two
    buckets capped at MAX_BUCKET; children append to the pending queue.

    Visit order interleaves depths once chunking kicks in — legal because all
    traversal writes are position-disjoint and order-free (SURVEY.md §2.5).
    ``wave`` maps (chunk, count) -> (children_buf, n_children, *stat_scalars);
    per-chunk host work is one scalar readback.
    """
    frontier = jnp.asarray(frontier_np.astype(np.int32))
    while frontier.shape[0] > 0:
        take = min(frontier.shape[0], MAX_BUCKET)
        cap = _bucket(take)
        chunk = frontier[:take]
        rest = frontier[take:]
        if chunk.shape[0] != cap:
            pad = jnp.zeros((cap - chunk.shape[0], width), dtype=jnp.int32)
            chunk = jnp.concatenate([chunk, pad])
        out, n_out, *stats = wave(chunk, jnp.int32(take))
        n_out = int(n_out)
        on_stats(take, stats)
        children = out[:n_out]
        if rest.shape[0] == 0:
            frontier = children
        elif n_out == 0:
            frontier = rest
        else:
            frontier = jnp.concatenate([rest, children])


def _compact(flat, keep, out_rows):
    """Scatter rows of ``flat`` where ``keep`` into a dense prefix.

    flat: (M, w) int32; keep: (M,) bool. Returns ((M, w) buffer with the kept
    rows in order as a prefix, count). Order within a wave follows the flat
    enumeration — irrelevant for correctness (writes are order-free) but kept
    deterministic.
    """
    idx = jnp.cumsum(keep.astype(jnp.int32)) - 1
    safe = jnp.where(keep, idx, flat.shape[0])
    out = jnp.zeros((flat.shape[0], flat.shape[1]), dtype=jnp.int32)
    out = out.at[safe].set(flat, mode="drop")
    return out, keep.sum(dtype=jnp.int32)


@dataclasses.dataclass
class TraversalResult:
    """Device flag vectors + diagnostics (the reference's globals
    LCP_threshold / LCP_minima / DA, ebwt2InDel.cpp:56-58)."""

    thr_K: jax.Array  # (n,) uint8 — LCP_threshold[2i]   (LCP[i] >= K)
    thr_R: jax.Array  # (n,) uint8 — LCP_threshold[2i+1] (LCP[i] >= k_right)
    minima: jax.Array  # (n,) uint8
    da: jax.Array | None  # (n,) uint8 (modes 2/3)
    stats: dict


# ---------------------------------------------------------------------------
# single-BWT traversal (reference: navigate_one_bwt, ebwt2InDel.cpp:555-676)
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("K", "k_right"), donate_argnums=(3, 4))
def _leaf_wave(fm: FMIndex, leaves, count, diff_K, diff_R, *, K, k_right):
    """One wave over suffix-tree leaves (phase 2).

    leaves: (N, 3) [first, second, depth]; lanes >= count are padding.
    Writes leaf-interior LCP-threshold fills as boundary deltas
    (reference: update_LCP_leaf, ebwt2InDel.cpp:344-355).
    """
    N = leaves.shape[0]
    valid = jnp.arange(N, dtype=jnp.int32) < count
    first, second, depth = leaves[:, 0], leaves[:, 1], leaves[:, 2]
    dummy = jnp.int32(diff_K.shape[0])  # out of bounds -> dropped

    for thr, diff in ((K, 0), (k_right, 1)):
        cond = valid & (depth >= thr)
        lo = jnp.where(cond, first + 1, dummy)
        hi = jnp.where(cond, second, dummy)
        if diff == 0:
            diff_K = diff_K.at[lo].add(1, mode="drop").at[hi].add(-1, mode="drop")
        else:
            diff_R = diff_R.at[lo].add(1, mode="drop").at[hi].add(-1, mode="drop")

    lcp_values = jnp.sum(jnp.where(valid, second - first - 1, 0))

    lo4, hi4 = fm_ops.lf_range(fm, first, second)  # (N, 4) each
    child_depth = jnp.broadcast_to((depth + 1)[:, None], lo4.shape)
    children = jnp.stack([lo4, hi4, child_depth], axis=-1).reshape(N * 4, 3)
    keep = (valid[:, None] & ((hi4 - lo4) >= 2)).reshape(N * 4)
    out, n_out = _compact(children, keep, N * 4)
    return out, n_out, diff_K, diff_R, lcp_values


@partial(jax.jit, static_argnames=("K", "k_right"), donate_argnums=(3, 4, 5))
def _node_wave(fm: FMIndex, nodes, count, thr_K, thr_R, minima, *, K, k_right):
    """One wave over internal suffix-tree nodes following Weiner links
    (phase 3; reference: ebwt2InDel.cpp:631-668).

    nodes: (N, 7) [first_TERM, first_A, first_C, first_G, first_T, last, depth].
    Border writes: update_lcp_threshold (include.hpp:826-860) and
    update_lcp_minima (ebwt2InDel.cpp:357-391).
    """
    N = nodes.shape[0]
    valid = jnp.arange(N, dtype=jnp.int32) < count
    depth = nodes[:, 6]
    last = nodes[:, 5]
    dummy = jnp.int32(thr_K.shape[0])
    lcp_values = jnp.int32(0)
    n_min = jnp.int32(0)

    for j in range(1, 5):
        border = nodes[:, j]
        has_prev = border > nodes[:, j - 1]
        cond = valid & has_prev & (border != last)
        lcp_values = lcp_values + jnp.sum(cond.astype(jnp.int32))
        thr_K = thr_K.at[jnp.where(cond & (depth >= K), border, dummy)].set(
            1, mode="drop"
        )
        thr_R = thr_R.at[jnp.where(cond & (depth >= k_right), border, dummy)].set(
            1, mode="drop"
        )
        if j >= 2:
            # a minimum after each non-TERM child of size >= 2, unless the
            # candidate position is the last or beyond (ebwt2InDel.cpp:357-391)
            prev_size = border - nodes[:, j - 1]
            cond_m = valid & (prev_size >= 2) & (border < last - 1)
            n_min = n_min + jnp.sum(cond_m.astype(jnp.int32))
            minima = minima.at[jnp.where(cond_m, border, dummy)].set(
                1, mode="drop"
            )

    ext = fm_ops.extend_node(fm, nodes)  # (N, 4, 7)
    nch = fm_ops.node_num_children(ext)  # (N, 4)
    keep = (valid[:, None] & (nch >= 2)).reshape(N * 4)
    out, n_out = _compact(ext.reshape(N * 4, 7), keep, N * 4)
    return out, n_out, thr_K, thr_R, minima, lcp_values, n_min


def navigate_one_bwt(fm: FMIndex, K: int, k_right: int,
                     progress=None) -> TraversalResult:
    """Full single-BWT navigation: leaf waves then node waves
    (reference: navigate_one_bwt, ebwt2InDel.cpp:555-676)."""
    n = fm.n
    diff_K = jnp.zeros(n + 1, dtype=jnp.int32)
    diff_R = jnp.zeros(n + 1, dtype=jnp.int32)
    thr_K = jnp.zeros(n, dtype=jnp.uint8)
    thr_R = jnp.zeros(n, dtype=jnp.uint8)
    minima = jnp.zeros(n, dtype=jnp.uint8)

    stats = {"leaves": 0, "nodes": 0, "lcp_values": 1, "n_min": 0,
             "max_wave": 0, "waves": 0}
    state = {"diff_K": diff_K, "diff_R": diff_R, "thr_K": thr_K,
             "thr_R": thr_R, "minima": minima}

    def leaf_wave(chunk, count):
        out, n_out, dk, dr, lcp = _leaf_wave(
            fm, chunk, count, state["diff_K"], state["diff_R"],
            K=K, k_right=k_right
        )
        state["diff_K"], state["diff_R"] = dk, dr
        return out, n_out, lcp

    def on_leaf(take, s):
        stats["leaves"] += take
        stats["max_wave"] = max(stats["max_wave"], take)
        stats["waves"] += 1
        stats["lcp_values"] += int(s[0])
        if progress:
            progress("leaves", stats)

    _drive(leaf_wave, fm.first_leaf()[None, :], 3, on_leaf)

    def node_wave(chunk, count):
        out, n_out, tk, tr, mn, lcp, nm = _node_wave(
            fm, chunk, count, state["thr_K"], state["thr_R"], state["minima"],
            K=K, k_right=k_right
        )
        state["thr_K"], state["thr_R"], state["minima"] = tk, tr, mn
        return out, n_out, lcp, nm

    def on_node(take, s):
        stats["nodes"] += take
        stats["max_wave"] = max(stats["max_wave"], take)
        stats["waves"] += 1
        stats["lcp_values"] += int(s[0])
        stats["n_min"] += int(s[1])
        if progress:
            progress("nodes", stats)

    _drive(node_wave, fm.root()[None, :], 7, on_node)
    diff_K, diff_R = state["diff_K"], state["diff_R"]
    thr_K, thr_R, minima = state["thr_K"], state["thr_R"], state["minima"]

    thr_K = thr_K | (jnp.cumsum(diff_K[:n]) > 0).astype(jnp.uint8)
    thr_R = thr_R | (jnp.cumsum(diff_R[:n]) > 0).astype(jnp.uint8)
    return TraversalResult(thr_K=thr_K, thr_R=thr_R, minima=minima, da=None,
                           stats=stats)


# ---------------------------------------------------------------------------
# two-BWT lockstep traversal (reference: navigate_two_bwts,
# ebwt2InDel.cpp:679-831) — frontier of node *pairs*; merged coordinates are
# per-BWT coordinate sums (include.hpp:476-490).
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("K", "k_right"), donate_argnums=(4, 5, 6))
def _leaf_pair_wave(fm1: FMIndex, fm2: FMIndex, leaves, count,
                    diff_K, diff_R, diff_DA, *, K, k_right):
    """One wave over leaf pairs. leaves: (N, 5) [f1, s1, f2, s2, depth].

    Writes the document array and merged-coordinate LCP fills
    (reference: update_DA, ebwt2InDel.cpp:394-425). Children kept iff
    combined size >= 2 (ebwt2InDel.cpp:452-472); size-1 leaves are recovered
    during the node waves (find_leaves, ebwt2InDel.cpp:474-527).
    """
    N = leaves.shape[0]
    valid = jnp.arange(N, dtype=jnp.int32) < count
    f1, s1, f2, s2, depth = (leaves[:, i] for i in range(5))
    start1 = f1 + f2
    start2 = f2 + s1
    end = s1 + s2
    dummy = jnp.int32(diff_K.shape[0])

    # DA: fill [start2, end) with ones
    cond = valid
    diff_DA = (
        diff_DA.at[jnp.where(cond, start2, dummy)].add(1, mode="drop")
        .at[jnp.where(cond, end, dummy)].add(-1, mode="drop")
    )
    da_values = jnp.sum(jnp.where(valid, end - start1, 0))

    # merged LCP fill [start1+1, end)
    for thr_i, thr in enumerate((K, k_right)):
        c = valid & (depth >= thr)
        lo = jnp.where(c, start1 + 1, dummy)
        hi = jnp.where(c, end, dummy)
        if thr_i == 0:
            diff_K = diff_K.at[lo].add(1, mode="drop").at[hi].add(-1, mode="drop")
        else:
            diff_R = diff_R.at[lo].add(1, mode="drop").at[hi].add(-1, mode="drop")
    lcp_values = jnp.sum(jnp.where(valid, end - start1 - 1, 0))

    lo1, hi1 = fm_ops.lf_range(fm1, f1, s1)
    lo2, hi2 = fm_ops.lf_range(fm2, f2, s2)
    child_depth = jnp.broadcast_to((depth + 1)[:, None], lo1.shape)
    children = jnp.stack([lo1, hi1, lo2, hi2, child_depth], axis=-1)
    combined = (hi1 - lo1) + (hi2 - lo2)
    keep = (valid[:, None] & (combined >= 2)).reshape(N * 4)
    out, n_out = _compact(children.reshape(N * 4, 5), keep, N * 4)
    return out, n_out, diff_K, diff_R, diff_DA, lcp_values, da_values


@partial(jax.jit, static_argnames=("K", "k_right"),
         donate_argnums=(4, 5, 6, 7))
def _node_pair_wave(fm1: FMIndex, fm2: FMIndex, nodes, count,
                    thr_K, thr_R, minima, da_set, *, K, k_right):
    """One wave over node pairs. nodes: (N, 13) [c1(6) | c2(6) | depth].

    Recovers combined-size-1 leaves (find_leaves, ebwt2InDel.cpp:474-527),
    updates LCP flags on the *merged* node (ebwt2InDel.cpp:792-802), and
    follows Weiner links keeping pairs whose union has >= 2 children
    (ebwt2InDel.cpp:529-553).
    """
    N = nodes.shape[0]
    valid = jnp.arange(N, dtype=jnp.int32) < count
    c1 = nodes[:, 0:6]
    c2 = nodes[:, 6:12]
    depth = nodes[:, 12]
    merged = c1 + c2
    last = merged[:, 5]
    dummy = jnp.int32(thr_K.shape[0])

    # find_leaves: children with combined size exactly 1 -> one DA value
    da_values = jnp.int32(0)
    for j in range(5):
        l1 = c1[:, j + 1] - c1[:, j]
        l2 = c2[:, j + 1] - c2[:, j]
        cond = valid & ((l1 + l2) == 1)
        pos = c1[:, j] + c2[:, j]  # merged start of the single element
        da_values = da_values + jnp.sum(cond.astype(jnp.int32))
        da_set = da_set.at[jnp.where(cond & (l2 == 1), pos, dummy)].set(
            1, mode="drop"
        )

    lcp_values = jnp.int32(0)
    n_min = jnp.int32(0)
    for j in range(1, 5):
        border = merged[:, j]
        has_prev = border > merged[:, j - 1]
        cond = valid & has_prev & (border != last)
        lcp_values = lcp_values + jnp.sum(cond.astype(jnp.int32))
        thr_K = thr_K.at[jnp.where(cond & (depth >= K), border, dummy)].set(
            1, mode="drop"
        )
        thr_R = thr_R.at[jnp.where(cond & (depth >= k_right), border, dummy)].set(
            1, mode="drop"
        )
        if j >= 2:
            prev_size = border - merged[:, j - 1]
            cond_m = valid & (prev_size >= 2) & (border < last - 1)
            n_min = n_min + jnp.sum(cond_m.astype(jnp.int32))
            minima = minima.at[jnp.where(cond_m, border, dummy)].set(
                1, mode="drop"
            )

    ext1 = fm_ops.extend_node(fm1, nodes[:, [0, 1, 2, 3, 4, 5, 12]])
    ext2 = fm_ops.extend_node(fm2, nodes[:, [6, 7, 8, 9, 10, 11, 12]])
    # union children count (include.hpp:784-792)
    u1 = ext1[..., 1:6] > ext1[..., 0:5]
    u2 = ext2[..., 1:6] > ext2[..., 0:5]
    n_union = jnp.sum((u1 | u2).astype(jnp.int32), axis=-1)  # (N, 4)
    children = jnp.concatenate([ext1[..., :6], ext2[..., :6],
                                ext1[..., 6:7]], axis=-1)  # (N, 4, 13)
    keep = (valid[:, None] & (n_union >= 2)).reshape(N * 4)
    out, n_out = _compact(children.reshape(N * 4, 13), keep, N * 4)
    return (out, n_out, thr_K, thr_R, minima, da_set, lcp_values, da_values,
            n_min)


def navigate_two_bwts(fm1: FMIndex, fm2: FMIndex, K: int, k_right: int,
                      progress=None) -> TraversalResult:
    """Lockstep navigation of two suffix trees simulating the merged
    collection (reference: navigate_two_bwts, ebwt2InDel.cpp:679-831)."""
    n = fm1.n + fm2.n
    diff_K = jnp.zeros(n + 1, dtype=jnp.int32)
    diff_R = jnp.zeros(n + 1, dtype=jnp.int32)
    diff_DA = jnp.zeros(n + 1, dtype=jnp.int32)
    thr_K = jnp.zeros(n, dtype=jnp.uint8)
    thr_R = jnp.zeros(n, dtype=jnp.uint8)
    minima = jnp.zeros(n, dtype=jnp.uint8)
    da_set = jnp.zeros(n, dtype=jnp.uint8)

    stats = {"leaves": 0, "nodes": 0, "lcp_values": 1, "da_values": 0,
             "n_min": 0, "max_wave": 0, "waves": 0}
    state = {"diff_K": diff_K, "diff_R": diff_R, "diff_DA": diff_DA,
             "thr_K": thr_K, "thr_R": thr_R, "minima": minima,
             "da_set": da_set}

    def leaf_wave(chunk, count):
        out, n_out, dk, dr, dd, lcp, dav = _leaf_pair_wave(
            fm1, fm2, chunk, count, state["diff_K"], state["diff_R"],
            state["diff_DA"], K=K, k_right=k_right
        )
        state["diff_K"], state["diff_R"], state["diff_DA"] = dk, dr, dd
        return out, n_out, lcp, dav

    def on_leaf(take, s):
        stats["leaves"] += take
        stats["max_wave"] = max(stats["max_wave"], take)
        stats["waves"] += 1
        stats["lcp_values"] += int(s[0])
        stats["da_values"] += int(s[1])
        if progress:
            progress("leaves", stats)

    l1 = fm1.first_leaf()
    l2 = fm2.first_leaf()
    start = np.array([[l1[0], l1[1], l2[0], l2[1], 0]], dtype=np.int32)
    _drive(leaf_wave, start, 5, on_leaf)

    def node_wave(chunk, count):
        out, n_out, tk, tr, mn, ds, lcp, dav, nm = _node_pair_wave(
            fm1, fm2, chunk, count, state["thr_K"], state["thr_R"],
            state["minima"], state["da_set"], K=K, k_right=k_right
        )
        state["thr_K"], state["thr_R"] = tk, tr
        state["minima"], state["da_set"] = mn, ds
        return out, n_out, lcp, dav, nm

    def on_node(take, s):
        stats["nodes"] += take
        stats["max_wave"] = max(stats["max_wave"], take)
        stats["waves"] += 1
        stats["lcp_values"] += int(s[0])
        stats["da_values"] += int(s[1])
        stats["n_min"] += int(s[2])
        if progress:
            progress("nodes", stats)

    r1 = fm1.root()
    r2 = fm2.root()
    start = np.concatenate([r1[:6], r2[:6], [0]]).astype(np.int32)[None, :]
    _drive(node_wave, start, 13, on_node)
    diff_K, diff_R, diff_DA = (state["diff_K"], state["diff_R"],
                               state["diff_DA"])
    thr_K, thr_R = state["thr_K"], state["thr_R"]
    minima, da_set = state["minima"], state["da_set"]

    thr_K = thr_K | (jnp.cumsum(diff_K[:n]) > 0).astype(jnp.uint8)
    thr_R = thr_R | (jnp.cumsum(diff_R[:n]) > 0).astype(jnp.uint8)
    da = da_set | (jnp.cumsum(diff_DA[:n]) > 0).astype(jnp.uint8)
    return TraversalResult(thr_K=thr_K, thr_R=thr_R, minima=minima, da=da,
                           stats=stats)
