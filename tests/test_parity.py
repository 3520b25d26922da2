"""Golden byte-parity tests: our pipeline vs the compiled reference binary on
simulated datasets (SURVEY.md §4 implication (c); BASELINE.json configs).

The reference is built into .ref_build/ (gitignored) by `cmake && make`; tests
skip gracefully if the binary is missing.
"""

import os
import subprocess

import numpy as np
import pytest

from ebwt2indel_tpu.models import pipeline
from ebwt2indel_tpu.tools import ebwt, simulate
from ebwt2indel_tpu.utils.config import Config

REF_BIN = os.path.join(os.path.dirname(__file__), "..", ".ref_build",
                       "ebwt2InDel")

needs_ref = pytest.mark.skipif(
    not os.path.isfile(REF_BIN), reason="reference binary not built"
)


def make_dataset(tmp, rng, genome_len=6000, coverage=12, read_len=80):
    genome = simulate.random_genome(rng, genome_len)
    hap2, truth = simulate.plant_variants(rng, genome, snp_rate=0.004,
                                          indel_rate=0.001)
    reads = simulate.sample_reads(rng, genome, coverage / 2, read_len) + \
        simulate.sample_reads(rng, hap2, coverage / 2, read_len)
    bwt = ebwt.ebwt_of_reads(reads)
    path = os.path.join(tmp, "reads.ebwt")
    with open(path, "w") as f:
        f.write(bwt)
    return path, truth


def run_reference(args):
    subprocess.run([REF_BIN] + args, check=True, capture_output=True)


@needs_ref
@pytest.mark.parametrize("extra", [
    [],                      # defaults
    ["-m", "2", "-k", "12"],  # lower coverage/LCP thresholds
    ["-g", "3", "-v", "1"],   # smaller gap, stricter SNV filter
])
def test_mode1_byte_parity(tmp_path, rng, extra):
    path, _ = make_dataset(str(tmp_path), rng)
    ref_out = str(tmp_path / "ref.snp")
    got_out = str(tmp_path / "got.snp")
    run_reference(["-1", path, "-o", ref_out] + extra)

    cfg = Config(input1=path, output=got_out)
    it = iter(extra)
    for flag, val in zip(it, it):
        { "-m": lambda v: setattr(cfg, "mcov_out", int(v)),
          "-k": lambda v: setattr(cfg, "K", int(v)),
          "-g": lambda v: setattr(cfg, "max_gap", int(v)),
          "-v": lambda v: setattr(cfg, "max_snvs", int(v)),
        }[flag](val)
    pipeline.run_one_dataset(cfg, log=lambda *a, **k: None)

    ref_bytes = open(ref_out, "rb").read()
    got_bytes = open(got_out, "rb").read()
    assert got_bytes == ref_bytes
    assert len(ref_bytes) > 0  # dataset must actually produce events


@needs_ref
def test_mode2_byte_parity(tmp_path, rng):
    genome = simulate.random_genome(rng, 5000)
    hap2, _ = simulate.plant_variants(rng, genome, snp_rate=0.004,
                                      indel_rate=0.001)
    reads1 = simulate.sample_reads(rng, genome, 8, 80)
    reads2 = simulate.sample_reads(rng, hap2, 8, 80)
    p1 = str(tmp_path / "a.ebwt")
    p2 = str(tmp_path / "b.ebwt")
    open(p1, "w").write(ebwt.ebwt_of_reads(reads1))
    open(p2, "w").write(ebwt.ebwt_of_reads(reads2))

    ref_out = str(tmp_path / "ref.snp")
    got_out = str(tmp_path / "got.snp")
    run_reference(["-1", p1, "-2", p2, "-o", ref_out])
    cfg = Config(input1=p1, input2=p2, output=got_out)
    pipeline.run_two_datasets(cfg, log=lambda *a, **k: None)

    assert open(got_out, "rb").read() == open(ref_out, "rb").read()
    assert os.path.getsize(ref_out) > 0


@needs_ref
def test_mode3_byte_parity(tmp_path, rng):
    genome = simulate.random_genome(rng, 5000)
    hap2, _ = simulate.plant_variants(rng, genome, snp_rate=0.004,
                                      indel_rate=0.001)
    reads1 = simulate.sample_reads(rng, genome, 8, 80)
    reads2 = simulate.sample_reads(rng, hap2, 8, 80)
    bwt, da = ebwt.ebwt_and_da_of_two(reads1, reads2)
    p = str(tmp_path / "merged.ebwt")
    pda = str(tmp_path / "merged.da")
    open(p, "w").write(bwt)
    open(pda, "w").write(da)

    ref_out = str(tmp_path / "ref.snp")
    got_out = str(tmp_path / "got.snp")
    run_reference(["-1", p, "-d", pda, "-o", ref_out])
    cfg = Config(input1=p, input_da=pda, output=got_out)
    pipeline.run_two_datasets_da(cfg, log=lambda *a, **k: None)

    assert open(got_out, "rb").read() == open(ref_out, "rb").read()
    assert os.path.getsize(ref_out) > 0


@needs_ref
def test_mode1_fifty_x_with_rc_and_filter(tmp_path, rng):
    """BASELINE config 2: mode 1 on 50x reads incl. reverse complements,
    then filter_snp m=5 — both stages byte-identical to the reference."""
    import io

    from ebwt2indel_tpu.tools import filter_snp

    genome = simulate.random_genome(rng, 4000)
    hap2, _ = simulate.plant_variants(rng, genome, snp_rate=0.004,
                                      indel_rate=0.001)
    reads = simulate.sample_reads(rng, genome, 25, 80, revcomp=True) + \
        simulate.sample_reads(rng, hap2, 25, 80, revcomp=True)
    path = str(tmp_path / "reads50.ebwt")
    open(path, "w").write(ebwt.ebwt_of_reads(reads))

    ref_out = str(tmp_path / "ref.snp")
    got_out = str(tmp_path / "got.snp")
    run_reference(["-1", path, "-o", ref_out, "-m", "5"])
    cfg = Config(input1=path, output=got_out, mcov_out=5)
    pipeline.run_one_dataset(cfg, log=lambda *a, **k: None)
    assert open(got_out, "rb").read() == open(ref_out, "rb").read()
    assert os.path.getsize(ref_out) > 0

    # filter stage parity
    ref_filtered = subprocess.run(
        [os.path.join(os.path.dirname(REF_BIN), "filter_snp"), ref_out, "5"],
        capture_output=True, text=True,
    ).stdout
    buf = io.StringIO()
    with open(got_out) as f:
        filter_snp.filter_stream(f, 5, 0, buf)
    assert buf.getvalue() == ref_filtered
