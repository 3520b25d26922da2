"""End-to-end SHARDED mode-1 pipeline: every O(n) structure — packed index
rows, LCP flag vectors, the right-context anchor table — lives sharded over
the 'pos' mesh axis; cluster lists and per-cluster walk state are replicated
O(#clusters); emission is host-side and byte-identical to the reference
(run_one_dataset, ebwt2InDel.cpp:1584-1674).

Select with EBWT_MESH=<n_devices> on the CLI, or call directly with a Mesh.
Collectives per queue chunk / walk step: one psum over ICI (rank/select
answers), plus O(n_dev)-scalar all_gathers in the scan-style phases.
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from ..models import call as mcall
from ..models import emit, emit_vec
from ..models import pipeline as mpipe
from ..ops import bits, packing
from ..utils.config import Config
from . import calling, shard
from . import traverse as ptraverse


def _log(msg: str, file=None):
    print(msg, file=file or sys.stdout, flush=True)


def run_one_dataset_sharded(cfg: Config, mesh, log=_log) -> dict:
    cfg = cfg.resolved()
    t0 = time.perf_counter()
    log("Phase 1/4: loading and indexing eBWT ... ")
    pb = packing.pack_file(cfg.input1, cfg.term)
    sfm = shard.shard_fm(pb, mesh)
    jax.block_until_ready(sfm.blocks)
    t1 = time.perf_counter()
    log(f"done. [{t1 - t0:.2f}s]")

    log(f"\nPhase 2-3/4: suffix-tree wavefront navigation "
        f"({mesh.devices.size}-device mesh).")
    thr_K, thr_R, minima, (local_n, (st_l, st_n)) = \
        ptraverse.navigate_one_bwt_sharded_device(sfm, cfg.K, cfg.k_right)
    jax.block_until_ready(thr_K)
    t2 = time.perf_counter()
    st_l = np.asarray(st_l)
    st_n = np.asarray(st_n)
    lcp_values = int(st_l[1]) + int(st_n[1])
    log(f"Computed {lcp_values}/{pb.n} LCP values.")
    log(f"Found {int(st_n[2])} LCP minima.")
    log(f"Processed {int(st_l[0])} suffix-tree leaves and {int(st_n[0])} "
        f"nodes. [{t2 - t1:.2f}s]\n")

    log("Phase 4/4: detecting SNPs and indels.")
    log(f"Output events will be stored in {cfg.output}")

    next_thr = calling.next_set_table_sharded(
        mesh, thr_R, local_n=local_n, n=pb.n
    )
    cl = calling.find_clusters_sharded(
        mesh, thr_K, minima, local_n=local_n, n=pb.n, mcov_out=cfg.mcov_out
    )
    t4 = time.perf_counter()
    log(f"[timing] cluster detect (sharded) {t4 - t2:.2f}s")

    stats = _call_and_emit_single_sharded(sfm, cl, next_thr, local_n, cfg)
    log(f"[timing] call+emit {time.perf_counter() - t4:.2f}s")
    stats["lcp_values"] = lcp_values
    stats["n_min"] = int(st_n[2])
    stats["leaves"] = int(st_l[0])
    stats["nodes"] = int(st_n[0])
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
    mpipe.print_histogram(cl.hist, log)
    return stats


def _call_and_emit_single_sharded(sfm: shard.ShardedFM, cl, next_thr,
                                  local_n: int, cfg: Config) -> dict:
    mesh = sfm.mesh
    B = len(cl.begins)
    with open(cfg.output, "w") as out_f:
        writer = emit.SnpWriter(
            out_f, complexity=cfg.complexity, max_snvs=cfg.max_snvs,
            mcov_out=cfg.mcov_out, max_gap=cfg.max_gap,
        )
        if B == 0:
            return {"events": 0, "cluster_nr": writer.cluster_nr}

        begins = jnp.asarray(cl.begins, dtype=jnp.int32)
        ends = jnp.asarray(cl.ends, dtype=jnp.int32)

        # device-side frequent-chars filter first (find_variants,
        # ebwt2InDel.cpp:947-966) — survivors only get the walks
        quirk_d, _pure = calling.range_counts_sharded(
            mesh, sfm.blocks, sfm.F, begins, ends, rows=sfm.rows
        )
        freq_d = quirk_d >= cfg.mcov_out
        nfreq_d = freq_d.sum(axis=1)
        passes_d = nfreq_d >= 2
        if cfg.max_variants_per_position > 0:
            passes_d &= nfreq_d <= cfg.max_variants_per_position
        passes = bits.host_unpackbits(
            np.asarray(bits.device_packbits(passes_d)), B
        ).astype(bool)
        sel = np.flatnonzero(passes)
        if len(sel) == 0:
            return {"events": 0, "cluster_nr": 1}

        sel_d = jnp.asarray(sel, dtype=jnp.int32)
        sb = begins[sel_d]
        se = ends[sel_d]
        freq = np.asarray(freq_d[sel_d])
        ctx, support, full = calling.extract_consensus_sharded(
            mesh, sfm.blocks, sfm.F, sb, se,
            rows=sfm.rows, k_left=cfg.k_left,
        )
        pos_d, found_d = calling.first_thr_position_sharded(
            mesh, next_thr, sb, se, local_n=local_n
        )
        seq, seqlen = calling.extract_dna_sharded(
            mesh, sfm.blocks, sfm.block_counts, sfm.F, sfm.bounds,
            pos_d, found_d, rows=sfm.rows, k_right=cfg.k_right,
        )

        found = np.asarray(found_d)
        support = np.asarray(support)
        full = np.asarray(full)
        ctx_ascii = mpipe._decode_rows(np.asarray(ctx), cfg.term)
        seq_ascii = mpipe._decode_rows(np.asarray(seq), cfg.term)
        seqlen = np.asarray(seqlen)

        return emit_vec.emit_single(
            out_f, cfg, found, passes[sel], freq, full, support,
            ctx_ascii, seq_ascii, seqlen,
        )
