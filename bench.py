"""Benchmark: end-to-end mode-1 calling throughput (BWT positions/sec) vs the
compiled reference, with byte-parity verification.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Runs on whatever JAX backend the environment provides (real TPU under the
driver; CPU as fallback). The first pipeline run warms the compilation cache;
the reported value is the steady-state second run. vs_baseline is the speedup
over the reference binary's wall time on the same input (reference is
single-threaded CPU — its only parallel story is process sharding,
pebwt2InDel.sh).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))
DATA = os.path.join(REPO, "data", "bench")
REF_BIN = os.path.join(REPO, ".ref_build", "ebwt2InDel")

# E. coli scale by default — BASELINE.json config 1 (simulated 25x reads)
GENOME_LEN = int(os.environ.get("BENCH_GENOME_LEN", 4_600_000))
COVERAGE = float(os.environ.get("BENCH_COVERAGE", 25))
READ_LEN = int(os.environ.get("BENCH_READ_LEN", 100))


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def ensure_dataset() -> str:
    os.makedirs(DATA, exist_ok=True)
    tag = f"g{GENOME_LEN}_c{COVERAGE:g}_l{READ_LEN}"
    path = os.path.join(DATA, f"reads_{tag}.ebwt")
    if os.path.isfile(path):
        return path
    log(f"[bench] building dataset {tag} ...")
    from ebwt2indel_tpu.tools import ebwt, simulate

    rng = np.random.default_rng(0xBE7C)
    genome = simulate.random_genome(rng, GENOME_LEN)
    hap2, _ = simulate.plant_variants(rng, genome, snp_rate=0.001,
                                      indel_rate=0.0002)
    reads = simulate.sample_reads(rng, genome, COVERAGE / 2, READ_LEN) + \
        simulate.sample_reads(rng, hap2, COVERAGE / 2, READ_LEN)
    bwt = ebwt.ebwt_of_reads(reads)
    with open(path, "w") as f:
        f.write(bwt)
    log(f"[bench] dataset ready: {len(bwt)} positions")
    return path


def ensure_reference() -> str | None:
    if os.path.isfile(REF_BIN):
        return REF_BIN
    build = os.path.join(REPO, ".ref_build")
    os.makedirs(build, exist_ok=True)
    try:
        subprocess.run(["cmake", "/root/reference"], cwd=build, check=True,
                       capture_output=True)
        subprocess.run(["make", "-j4", "ebwt2InDel"], cwd=build, check=True,
                       capture_output=True)
        return REF_BIN
    except Exception as e:  # pragma: no cover
        log(f"[bench] could not build reference: {e}")
        return None


def run_ours(bwt_path: str, out_path: str) -> float:
    from ebwt2indel_tpu.models import pipeline
    from ebwt2indel_tpu.utils.config import Config

    cfg = Config(input1=bwt_path, output=out_path)
    t0 = time.perf_counter()
    pipeline.run_one_dataset(cfg, log=lambda *a, **k: None)
    return time.perf_counter() - t0


def main() -> int:
    bwt_path = ensure_dataset()
    n = os.path.getsize(bwt_path)

    import jax

    log(f"[bench] jax backend: {jax.default_backend()} "
        f"devices: {jax.devices()}")

    ours_out = os.path.join(DATA, "ours.snp")
    log("[bench] warmup run (compilation) ...")
    t_warm = run_ours(bwt_path, ours_out)
    log(f"[bench] warmup: {t_warm:.2f}s")
    log("[bench] timed run ...")
    t_ours = run_ours(bwt_path, ours_out)
    log(f"[bench] ours: {t_ours:.2f}s  ({n / t_ours / 1e6:.2f} Mpos/s)")

    vs_baseline = None
    ref = ensure_reference()
    if ref:
        ref_out = os.path.join(DATA, "ref.snp")
        t0 = time.perf_counter()
        subprocess.run([ref, "-1", bwt_path, "-o", ref_out], check=True,
                       capture_output=True)
        t_ref = time.perf_counter() - t0
        log(f"[bench] reference: {t_ref:.2f}s "
            f"({n / t_ref / 1e6:.2f} Mpos/s)")
        parity = open(ours_out, "rb").read() == open(ref_out, "rb").read()
        log(f"[bench] parity: {'BYTE-IDENTICAL' if parity else 'MISMATCH'}")
        if not parity:
            # a benchmark on wrong output is meaningless
            print(json.dumps({
                "metric": "mode1 positions/sec (PARITY FAILURE)",
                "value": 0.0, "unit": "pos/s", "vs_baseline": 0.0,
            }))
            return 1
        vs_baseline = t_ref / t_ours

    print(json.dumps({
        "metric": "mode1 end-to-end BWT positions/sec/chip",
        "value": round(n / t_ours, 1),
        "unit": "pos/s",
        "vs_baseline": round(vs_baseline, 3) if vs_baseline else None,
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
