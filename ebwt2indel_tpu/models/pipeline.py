"""End-to-end calling pipelines — the three run modes of the reference
(run_one_dataset / run_two_datasets / run_two_datasets_da,
ebwt2InDel.cpp:1584-1674 / 1344-1465 / 1471-1579).

Phases: index build (device arrays), wavefront traversal (traverse.py),
vectorized cluster detection (cluster.py), batched per-cluster device calling
(call.py), and host-side ordered emission (emit.py).
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import bits, packing, rank
from ..utils import compile_cache, dna
from ..utils.config import Config
from . import call, cluster, emit, emit_vec, traverse
from .fm_index import FMIndex

MAX_CLUST_LEN = cluster.MAX_CLUST_LEN


def _log(msg: str, file=None):
    print(msg, file=file or sys.stdout, flush=True)


def _maybe_profile():
    """jax.profiler trace capture for a whole run when EBWT_PROFILE=<dir> is
    set (SURVEY.md §5 observability plan; view with TensorBoard or Perfetto).
    """
    import contextlib
    import os

    trace_dir = os.environ.get("EBWT_PROFILE")
    if not trace_dir:
        return contextlib.nullcontext()
    return jax.profiler.trace(trace_dir)


def _profiled(fn):
    import functools

    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        with _maybe_profile():
            return fn(*args, **kwargs)

    return wrapped


def _timing_marker():
    """Sub-phase timing printed when EBWT_TIMING=1 (diagnostics only)."""
    import os

    if not os.environ.get("EBWT_TIMING"):
        return lambda name: None
    state = {"t": time.perf_counter()}

    def mark(name):
        now = time.perf_counter()
        print(f"[timing] {name}: {now - state['t']:.3f}s", file=sys.stderr,
              flush=True)
        state["t"] = now

    return mark


def histogram_str(hist: np.ndarray) -> str:
    """ASCII cluster-size histogram (ebwt2InDel.cpp:1454-1462)."""
    scale = max(int(hist.max()), 1)
    lines = []
    for i in range(MAX_CLUST_LEN + 1):
        pad = "   " if i < 10 else ("  " if i < 100 else " ")
        bars = "-" * ((100 * int(hist[i])) // scale)
        lines.append(f"{i}{pad}{bars} {int(hist[i])}")
    return "\n".join(lines)


def print_histogram(hist: np.ndarray, log=_log):
    log(histogram_str(hist))


def _decode_rows(codes: np.ndarray, term: int):
    """(..., L) int8 codes -> flat ASCII bytes for lazy per-row slicing."""
    return dna.decode_table(term)[codes.astype(np.uint8)]


def _ctx_str(ascii_arr: np.ndarray) -> str:
    return ascii_arr.tobytes().decode("ascii")


# ---------------------------------------------------------------------------
# mode 1 — genotyping of a single collection
# ---------------------------------------------------------------------------


@_profiled
def run_one_dataset(cfg: Config, log=_log) -> dict:
    compile_cache.enable()
    cfg = cfg.resolved()
    t0 = time.perf_counter()
    log("Phase 1/4: loading and indexing eBWT ... ")
    tmark_idx = _timing_marker()
    fm = FMIndex.from_file(cfg.input1, cfg.term)
    jax.block_until_ready(fm.blocks)
    t1 = time.perf_counter()
    tmark_idx("index pack+upload")
    log(f"done. [{t1 - t0:.2f}s]")

    log("\nPhase 2-3/4: suffix-tree wavefront navigation.")
    res = traverse.navigate_one_bwt(fm, cfg.K, cfg.k_right)
    jax.block_until_ready(res.thr_K)
    t2 = time.perf_counter()
    st = res.stats
    log(f"Computed {st['lcp_values']}/{fm.n} LCP values.")
    log(f"Found {st['n_min']} LCP minima.")
    log(f"Max pending frontier = {st['max_pending']}")
    log(f"Processed {st['leaves']} suffix-tree leaves and {st['nodes']} "
        f"nodes. [{t2 - t1:.2f}s]\n")

    log("Phase 4/4: detecting SNPs and indels.")
    log(f"Output events will be stored in {cfg.output}")

    # cluster detection and the right-context anchor table stay on device —
    # no O(n) flag transfer at all in mode 1
    tmark0 = _timing_marker()
    if res.packed:
        # huge-n path: flags are bit-packed words end-to-end
        next_thr = call.right_anchor_table_packed(res.thr_R, n=fm.n)
        res.thr_R = None
        cl = cluster.find_clusters_device_packed(
            res.thr_K, res.minima, n=fm.n, mcov_out=cfg.mcov_out)
    else:
        next_thr = call.right_anchor_table(res.thr_R)
        res.thr_R = None  # the anchor structure replaces it (free ~n bytes)
        cl = cluster.find_clusters_device(res.thr_K, res.minima,
                                          cfg.mcov_out)
    res.thr_K = res.minima = None  # donated into cluster detection
    t4 = time.perf_counter()
    tmark0("cluster detect (device)")
    log(f"[timing] cluster detect (device) {t4 - t2:.2f}s")

    stats = _call_and_emit_single(fm, cl, next_thr, cfg)
    log(f"[timing] call+emit {time.perf_counter() - t4:.2f}s")
    stats.update(st)
    stats["n_clusters"] = cl.n_clusters

    avg = cl.clust_size_sum / cl.n_clusters if cl.n_clusters else float("nan")
    log(f"\nDone.\nAnalyzed {cl.n_clusters} clusters.")
    log(f"Average cluster length: {avg}.\n")
    log(
        f"Stored to file {stats['events']} events clustered in "
        f"{stats['cluster_nr'] - 1} clusters.\n"
    )
    log(
        "Distribution of bases inside clusters "
        "(cluster length / number of bases inside clusters of that length): "
    )
    print_histogram(cl.hist, log)
    return stats


def _call_and_emit_single(fm: FMIndex, cl: cluster.Clusters,
                          next_thr, cfg: Config) -> dict:
    B = len(cl.begins)
    with open(cfg.output, "w") as out_f:
        writer = emit.SnpWriter(
            out_f, complexity=cfg.complexity, max_snvs=cfg.max_snvs,
            mcov_out=cfg.mcov_out, max_gap=cfg.max_gap,
        )
        if B == 0:
            return {"events": 0, "cluster_nr": writer.cluster_nr}

        tmark = _timing_marker()
        begins = jnp.asarray(cl.begins, dtype=jnp.int32)
        ends = jnp.asarray(cl.ends, dtype=jnp.int32)

        # cheap filter FIRST, entirely on device; only a bitmask of
        # survivors is downloaded — the reference likewise rejects clusters
        # on base counts before any context extraction (find_variants,
        # ebwt2InDel.cpp:947-966); >99% of analyzed clusters fail the
        # >=2-frequent-chars test
        quirk_d, _pure = call.range_counts(fm, begins, ends)
        freq_d = quirk_d >= cfg.mcov_out  # TERM->A quirk included
        nfreq_d = freq_d.sum(axis=1)
        passes_d = nfreq_d >= 2
        if cfg.max_variants_per_position > 0:
            passes_d &= nfreq_d <= cfg.max_variants_per_position
        passes = bits.host_unpackbits(
            np.asarray(bits.device_packbits(passes_d)), B
        ).astype(bool)
        sel = np.flatnonzero(passes)
        tmark("filter")
        if len(sel) == 0:
            return {"events": 0, "cluster_nr": 1}

        sel_d = jnp.asarray(sel, dtype=jnp.int32)
        sb = begins[sel_d]
        se = ends[sel_d]
        freq = np.asarray(freq_d[sel_d])
        ctx, support, full = call.extract_consensus_batch(
            fm, sb, se, k_left=cfg.k_left
        )
        pos_d, found_d = call.first_thr_position_device(next_thr, sb, se)
        seq, seqlen = call.extract_dna_batch(
            fm, pos_d, found_d, k_right=cfg.k_right,
        )
        tmark("walks")

        found = np.asarray(found_d)
        support = np.asarray(support)
        full = np.asarray(full)
        ctx_ascii = _decode_rows(np.asarray(ctx), cfg.term)
        seq_ascii = _decode_rows(np.asarray(seq), cfg.term)
        seqlen = np.asarray(seqlen)
        tmark("download")

        out = emit_vec.emit_single(
            out_f, cfg, found, passes[sel], freq, full, support,
            ctx_ascii, seq_ascii, seqlen,
        )
        tmark("emit")
        return out


# ---------------------------------------------------------------------------
# mode 2 — two collections, implicit merge
# ---------------------------------------------------------------------------


@_profiled
def run_two_datasets(cfg: Config, log=_log) -> dict:
    compile_cache.enable()
    cfg = cfg.resolved()
    log("Phase 1/4: loading and indexing eBWTs ... ")
    tmark_idx = _timing_marker()
    # the two index builds overlap: the native pack of one rides the
    # host->device upload of the other (packer and device dispatch are
    # thread-safe; error precedence matches the reference — a bad input1
    # raises in the main thread first, cpp:1750-1758)
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(2) as ex:
        f2 = ex.submit(FMIndex.from_file, cfg.input2, cfg.term)
        fm1 = FMIndex.from_file(cfg.input1, cfg.term)
        fm2 = f2.result()
    jax.block_until_ready(fm2.blocks)
    tmark_idx("index pack+upload")
    log("done.")

    log("\nPhase 2-3/4: merged suffix-tree wavefront navigation.")
    res = traverse.navigate_two_bwts(fm1, fm2, cfg.K, cfg.k_right)
    st = res.stats
    n = fm1.n + fm2.n
    log(f"Computed {st['da_values']}/{n} DA values.")
    log(f"Computed {st['lcp_values']}/{n} LCP values.")
    log(f"Found {st['n_min']} LCP minima.")
    log(f"Processed {st['leaves']} suffix-tree leaves and {st['nodes']} nodes.\n")

    log("Phase 4/4: detecting SNPs and indels.")
    log(f"Output events will be stored in {cfg.output}")

    tmark4 = _timing_marker()
    nn = fm1.n + fm2.n
    if res.packed:
        next_thr = call.right_anchor_table_packed(res.thr_R, n=nn)
        res.thr_R = None
        cl = cluster.find_clusters_device_packed(
            res.thr_K, res.minima, n=nn, mcov_out=cfg.mcov_out)
        res.thr_K = res.minima = None
        # DA already arrives as rank-layout words; just add the counts
        da_bv = (res.da, bits.bv_counts(res.da))
        res.da = None
    else:
        next_thr = call.right_anchor_table(res.thr_R)
        res.thr_R = None  # the anchor structure replaces it (free ~n bytes)
        cl = cluster.find_clusters_device(res.thr_K, res.minima,
                                          cfg.mcov_out)
        res.thr_K = res.minima = None  # donated into cluster detection
        # DA stays on device as a rank-ready packed bitvector — no O(n)
        # host transfer (the reference scans its vector<bool> DA,
        # cpp:1431-1432)
        da_bv = bits.bv_build(res.da)
        res.da = None

    tmark4("cluster detect (device)")
    stats = _call_and_emit_pair_mode2(fm1, fm2, cl, next_thr, da_bv, cfg)
    tmark4("call+emit")
    stats.update(st)
    stats["n_clusters"] = cl.n_clusters

    avg = cl.clust_size_sum / cl.n_clusters if cl.n_clusters else float("nan")
    log(f"\nDone.\nAnalyzed {cl.n_clusters} clusters.")
    log(f"Average cluster length: {avg}.\n")
    log(
        "Distribution of bases inside clusters "
        "(cluster length / number of bases inside clusters of that length): \n"
    )
    print_histogram(cl.hist, log)
    return stats


def _call_and_emit_pair_mode2(fm1, fm2, cl, next_thr, da_bv, cfg) -> dict:
    B = len(cl.begins)
    with open(cfg.output, "w") as out_f:
        writer = emit.SnpWriter(
            out_f, complexity=cfg.complexity, max_snvs=cfg.max_snvs,
            mcov_out=cfg.mcov_out, max_gap=cfg.max_gap,
        )
        if B == 0:
            return {"events": writer.events, "cluster_nr": writer.cluster_nr}

        da_words, da_counts = da_bv
        begins = jnp.asarray(cl.begins, jnp.int32)
        ends = jnp.asarray(cl.ends, jnp.int32)
        # per-BWT sub-ranges via device DA rank (the reference advances
        # i0/i1 sequentially per position, cpp:1431-1432)
        b1 = rank.bv_rank1(da_words, da_counts, begins)
        e1 = rank.bv_rank1(da_words, da_counts, ends)
        b0 = begins - b1
        e0 = ends - e1

        # cheap per-individual counts first; walks only for clusters passing
        # the both-covered filter (ebwt2InDel.cpp:870-880); only a bitmask
        # of survivors is downloaded
        quirk0_d, _ = call.range_counts(fm1, b0, e0)
        quirk1_d, _ = call.range_counts(fm2, b1, e1)
        passes_d = _pair_passes(quirk0_d, quirk1_d, cfg)
        passes = bits.host_unpackbits(
            np.asarray(bits.device_packbits(passes_d)), B
        ).astype(bool)
        sel = np.flatnonzero(passes)
        if len(sel) == 0:
            return {"events": writer.events, "cluster_nr": writer.cluster_nr}

        sel_d = jnp.asarray(sel, jnp.int32)
        ctx0, support0, full0 = call.extract_consensus_batch(
            fm1, b0[sel_d], e0[sel_d], k_left=cfg.k_left
        )
        ctx1, support1, full1 = call.extract_consensus_batch(
            fm2, b1[sel_d], e1[sel_d], k_left=cfg.k_left
        )

        pos_d, found_d = call.first_thr_position_device(
            next_thr, begins[sel_d], ends[sel_d]
        )
        hit1 = rank.bv_rank1(da_words, da_counts, pos_d)
        hit0 = pos_d - hit1
        da_at_d = rank.bv_get(da_words, pos_d) != 0
        seq_a, len_a = call.extract_dna_batch(
            fm1, hit0, found_d & ~da_at_d, k_right=cfg.k_right,
        )
        seq_b, len_b = call.extract_dna_batch(
            fm2, hit1, found_d & da_at_d, k_right=cfg.k_right,
        )
        da_at = np.asarray(da_at_d)
        found = np.asarray(found_d)
        seq = np.where(da_at[:, None], np.asarray(seq_b), np.asarray(seq_a))
        seqlen = np.where(da_at, np.asarray(len_b), np.asarray(len_a))

        _emit_pair_clusters(
            writer, cfg, len(sel), found,
            np.asarray(quirk0_d[sel_d]), np.asarray(quirk1_d[sel_d]),
            np.asarray(support0), np.asarray(support1),
            np.asarray(full0), np.asarray(full1),
            _decode_rows(np.asarray(ctx0), cfg.term),
            _decode_rows(np.asarray(ctx1), cfg.term),
            _decode_rows(seq, cfg.term), seqlen,
        )
        return {"events": writer.events, "cluster_nr": writer.cluster_nr}


def _pair_passes(quirk0, quirk1, cfg):
    freq0 = quirk0 >= cfg.mcov_out
    freq1 = quirk1 >= cfg.mcov_out
    n0 = freq0.sum(axis=1)
    n1 = freq1.sum(axis=1)
    passes = (n0 > 0) & (n1 > 0)
    if cfg.max_variants_per_position > 0:
        q = cfg.max_variants_per_position
        passes &= (n0 <= q) & (n1 <= q)
    # a cluster can only emit pairs whose final characters differ (cpp:921);
    # when both samples' frequent sets are the same singleton no such pair
    # exists, the reference writes nothing and cluster_nr stays put — skip
    # the context walks entirely (this is the overwhelmingly common case:
    # non-variant positions covered by both samples)
    same_single = (n0 == 1) & (n1 == 1) & ((freq0 & freq1).sum(axis=1) == 1)
    return passes & ~same_single


def _emit_pair_clusters(writer, cfg, B, found, quirk0, quirk1,
                        support0, support1, full0, full1,
                        ctx0_ascii, ctx1_ascii, seq_ascii, seqlen):
    """Shared two-sample emission: cross-product of frequent chars whose
    final characters differ (ebwt2InDel.cpp:915-928, 1077-1091); vectorized
    in emit_vec.emit_pair. Note the c0 != c1 "final characters differ" test
    (cpp:921) is exactly the candidate-pair enumeration there (contexts end
    with their frequent character)."""
    freq0 = quirk0 >= cfg.mcov_out
    freq1 = quirk1 >= cfg.mcov_out
    n0 = freq0.sum(axis=1)
    n1 = freq1.sum(axis=1)
    passes = (n0 > 0) & (n1 > 0)
    if cfg.max_variants_per_position > 0:
        q = cfg.max_variants_per_position
        passes &= (n0 <= q) & (n1 <= q)

    out = emit_vec.emit_pair(
        writer.out, cfg, found & passes, freq0, full0, freq1, full1,
        support0, support1, ctx0_ascii, ctx1_ascii, seq_ascii, seqlen,
    )
    writer.events += out["events"]
    writer.cluster_nr = out["cluster_nr"]


# ---------------------------------------------------------------------------
# mode 3 — merged BWT + document array
# ---------------------------------------------------------------------------


@_profiled
def run_two_datasets_da(cfg: Config, log=_log) -> dict:
    compile_cache.enable()
    cfg = cfg.resolved()
    log("Phase 1/4: loading and indexing eBWT ... ")
    tmark_idx = _timing_marker()
    raw = np.fromfile(cfg.input1, dtype=np.uint8)
    # the DA-side work (DA read, TERM-masked second index pack+upload,
    # rank-1 bitvector) is independent of navigation — build it in a
    # worker thread so it hides entirely behind phases 2-3
    from concurrent.futures import ThreadPoolExecutor

    def _da_side():
        da = packing.read_da_file(cfg.input_da, raw.size)
        # rank structure over the DA=1 side: replace DA=0 characters with
        # TERM so per-individual counts come from two rank diffs
        # (SURVEY.md §7 layer 5); masking happens in ASCII space so the
        # native packer handles both indexes
        raw_da1 = np.where(da != 0, raw, np.uint8(cfg.term))
        fm_da1 = FMIndex.from_packed(packing.pack_bytes(raw_da1, cfg.term))
        # upload the DA as the packed rank-1 structure (n/8 + n/32 bytes)
        # instead of n raw bytes — no O(n) transfer, no host cumsum
        w_h, c_h = packing.pack_bitvector(da)
        return fm_da1, (jnp.asarray(w_h), jnp.asarray(c_h))

    ex = ThreadPoolExecutor(1)
    da_fut = ex.submit(_da_side)
    fm = FMIndex.from_packed(packing.pack_bytes(raw, cfg.term))
    jax.block_until_ready(fm.blocks)
    tmark_idx("index pack+upload")
    log("done.")

    log("\nPhase 2-3/4: suffix-tree wavefront navigation.")
    res = traverse.navigate_one_bwt(fm, cfg.K, cfg.k_right)
    st = res.stats
    log(f"Computed {st['lcp_values']}/{fm.n} LCP values.")
    log(f"Found {st['n_min']} LCP minima.\n")

    log("Phase 4/4: detecting SNPs and indels.")
    log(f"Output events will be stored in {cfg.output}")

    tmark_idx2 = _timing_marker()
    fm_da1, da_bv = da_fut.result()
    ex.shutdown()
    tmark_idx2("DA-side index (overlapped with navigation) wait")

    if res.packed:
        next_thr = call.right_anchor_table_packed(res.thr_R, n=fm.n)
        res.thr_R = None
        cl = cluster.find_clusters_device_packed(
            res.thr_K, res.minima, n=fm.n, mcov_out=cfg.mcov_out)
    else:
        next_thr = call.right_anchor_table(res.thr_R)
        res.thr_R = None  # the anchor structure replaces it (free ~n bytes)
        cl = cluster.find_clusters_device(res.thr_K, res.minima,
                                          cfg.mcov_out)
    res.thr_K = res.minima = None  # donated into cluster detection

    stats = _call_and_emit_pair_mode3(fm, fm_da1, cl, next_thr, da_bv, cfg)
    stats.update(st)
    stats["n_clusters"] = cl.n_clusters

    avg = cl.clust_size_sum / cl.n_clusters if cl.n_clusters else float("nan")
    log(f"\nDone.\nAnalyzed {cl.n_clusters} clusters.")
    log(f"Average cluster length: {avg}.\n")
    log(
        "Distribution of bases inside clusters "
        "(cluster length / number of bases inside clusters of that length): \n"
    )
    print_histogram(cl.hist, log)
    # mode-3 quirk: the reference prints the (never-incremented) `events`
    # counter here — always 0 (ebwt2InDel.cpp:1577)
    log(
        f"\nStored to file 0 sequences clustered in "
        f"{stats['cluster_nr'] - 1} clusters."
    )
    return stats


def _call_and_emit_pair_mode3(fm, fm_da1, cl, next_thr, da_bv, cfg) -> dict:
    B = len(cl.begins)
    with open(cfg.output, "w") as out_f:
        writer = emit.SnpWriter(
            out_f, complexity=cfg.complexity, max_snvs=cfg.max_snvs,
            mcov_out=cfg.mcov_out, max_gap=cfg.max_gap,
        )
        if B == 0:
            return {"events": writer.events, "cluster_nr": writer.cluster_nr}

        da_words, da_counts = da_bv
        begins = jnp.asarray(cl.begins, jnp.int32)
        ends = jnp.asarray(cl.ends, jnp.int32)

        # per-individual counts with the TERM->A quirk applied per side
        # (find_variants DA overload, ebwt2InDel.cpp:1013-1030) — all on
        # device; only the survivor bitmask is downloaded
        _, pure_all = call.range_counts(fm, begins, ends)
        _, pure_1 = call.range_counts(fm_da1, begins, ends)
        len1 = (rank.bv_rank1(da_words, da_counts, ends)
                - rank.bv_rank1(da_words, da_counts, begins))
        len_all = ends - begins
        pure_0 = pure_all - pure_1
        quirk1_d = pure_1.at[:, 0].add(len1 - pure_1.sum(axis=1))
        quirk0_d = pure_0.at[:, 0].add((len_all - len1) - pure_0.sum(axis=1))

        passes_d = _pair_passes(quirk0_d, quirk1_d, cfg)
        passes = bits.host_unpackbits(
            np.asarray(bits.device_packbits(passes_d)), B
        ).astype(bool)
        sel = np.flatnonzero(passes)
        if len(sel) == 0:
            return {"events": writer.events, "cluster_nr": writer.cluster_nr}

        # both individuals' left contexts come from the merged BWT
        # (cpp:1057-1058) — supports are merged counts
        sel_d = jnp.asarray(sel, jnp.int32)
        sb = begins[sel_d]
        se = ends[sel_d]
        ctx, support, full = call.extract_consensus_batch(
            fm, sb, se, k_left=cfg.k_left
        )
        pos_d, found_d = call.first_thr_position_device(next_thr, sb, se)
        found = np.asarray(found_d)
        seq, seqlen = call.extract_dna_batch(
            fm, pos_d, found_d, k_right=cfg.k_right,
        )

        ctx_ascii = _decode_rows(np.asarray(ctx), cfg.term)
        _emit_pair_clusters(
            writer, cfg, len(sel), found,
            np.asarray(quirk0_d[sel_d]), np.asarray(quirk1_d[sel_d]),
            np.asarray(support), np.asarray(support),
            np.asarray(full), np.asarray(full),
            ctx_ascii, ctx_ascii,
            _decode_rows(np.asarray(seq), cfg.term), np.asarray(seqlen),
        )
        return {"events": writer.events, "cluster_nr": writer.cluster_nr}
