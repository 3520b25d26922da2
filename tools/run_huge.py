#!/usr/bin/env python3
"""Mode-1 run at multi-billion positions (BASELINE config-5 scale) with a
cold + warm in-process measurement, for the REPORT_2G5 capture.

Usage: python tools/run_huge.py IN.ebwt OUT.snp [REPORT.json]

Runs the full mode-1 pipeline twice in one process: run 1 absorbs every
compile (the cold wall is reported separately), run 2 is the steady-state
number. vs_baseline is filled in afterwards by the caller from the
reference binary's wall time on the same input (tools/run_huge_ref.sh).
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    inp, out = sys.argv[1], sys.argv[2]
    report = sys.argv[3] if len(sys.argv) > 3 else None

    from ebwt2indel_tpu.models import pipeline
    from ebwt2indel_tpu.utils.config import Config

    n = os.path.getsize(inp)
    cfg = Config(input1=inp, output=out)

    def emit(cold, warm):
        if not report:
            return
        best = warm if warm is not None else cold
        with open(report, "w") as f:
            json.dump({
                "metric": "mode1 end-to-end BWT positions/sec/chip",
                "value": round(n / best, 1),
                "unit": "pos/s",
                "positions": n,
                "warm_seconds": None if warm is None else round(warm, 1),
                "cold_seconds": round(cold, 1),
                "vs_baseline": None,
            }, f)
            f.write("\n")

    t0 = time.perf_counter()
    pipeline.run_one_dataset(cfg)
    cold = time.perf_counter() - t0
    print(f"[run_huge] cold end-to-end {cold:.1f}s "
          f"({n / cold / 1e6:.2f} Mpos/s)", flush=True)
    emit(cold, None)

    t0 = time.perf_counter()
    pipeline.run_one_dataset(cfg)
    warm = time.perf_counter() - t0
    print(f"[run_huge] warm end-to-end {warm:.1f}s "
          f"({n / warm / 1e6:.2f} Mpos/s)", flush=True)
    emit(cold, warm)


if __name__ == "__main__":
    main()
