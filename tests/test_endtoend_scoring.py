"""Full validation loop: simulate -> call -> place contexts -> score vs
truth VCF (the reference's documented evaluation workflow, SURVEY.md §4,
with exact-match placement replacing BWA)."""

import numpy as np

from ebwt2indel_tpu.models import pipeline
from ebwt2indel_tpu.tools import context2vcf, ebwt, simulate, vcf_vs_vcf
from ebwt2indel_tpu.utils.config import Config


def test_simulate_call_score(tmp_path, rng):
    genome = simulate.random_genome(rng, 30000)
    hap2, truth = simulate.plant_variants(rng, genome, snp_rate=0.003,
                                          indel_rate=0.0005)
    reads = simulate.sample_reads(rng, genome, 10, 100) + \
        simulate.sample_reads(rng, hap2, 10, 100)
    bwt_path = str(tmp_path / "r.ebwt")
    open(bwt_path, "w").write(ebwt.ebwt_of_reads(reads))

    snp_path = str(tmp_path / "calls.snp")
    cfg = Config(input1=bwt_path, output=snp_path)
    pipeline.run_one_dataset(cfg, log=lambda *a, **k: None)

    fasta = str(tmp_path / "ref.fasta")
    open(fasta, "w").write(">chr1\n" + genome + "\n")
    vcf_truth = str(tmp_path / "truth.vcf")
    simulate.write_vcf(vcf_truth, truth, chrom="chr1")

    vcf_out = str(tmp_path / "calls.vcf")
    stats = context2vcf.convert(snp_path, fasta, vcf_out,
                                log=lambda *a: None)
    assert stats["placed"] > 0

    s = vcf_vs_vcf.score(
        vcf_vs_vcf.read_vcf(vcf_out), vcf_vs_vcf.read_vcf(vcf_truth), 10
    )
    tp, fn, fp = s["TP_s"], s["FN_s"], s["FP_s"]
    sens = tp / max(tp + fn, 1)
    prec = tp / max(tp + fp, 1)
    # at 20x with isolated planted SNPs the caller should find most of them
    # with high precision (generous thresholds to avoid flakiness)
    assert sens >= 0.5, (tp, fn, fp)
    assert prec >= 0.7, (tp, fn, fp)
