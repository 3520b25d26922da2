"""context2vcf — place .snp call contexts on a reference genome by exact
matching and emit VCF rows.

The reference pipeline scores calls by aligning them with BWA and converting
the SAM (snp2vcf.sh → sam2vcf). This tool provides an aligner-free
alternative for the common case: each record's right context (an
error-corrected consensus) is located in the reference by exact substring
search; the variant is the final character of the left context, anchored
immediately before the right context's match position. SNP records yield one
VCF row; INDEL records yield an anchored indel row derived from the header's
event string (models/emit.py::event_type format).

Intended for validation loops (simulate -> call -> context2vcf ->
vcf_vs_vcf) and environments without bwa; for real data with repeats an
aligner remains the more sensitive choice.
"""

from __future__ import annotations

import sys

from ..utils.dna import revcomp
from .sam2vcf import load_fasta


def _parse_header(header: str):
    """'>cluster:..._type:_SNP_event:A/C' -> (kind, event)."""
    t = header.split("_type:_", 1)
    if len(t) < 2:
        return None, None
    rest = t[1]
    kind, _, ev = rest.partition("_event:")
    return kind, ev


def _right_len(header: str) -> int:
    for tok in header.split("_"):
        if tok.startswith("right:"):
            try:
                return int(tok.split(":")[1])
            except ValueError:
                return 0
    return 0


def convert(snp_path: str, ref_path: str, out_path: str, log=print) -> dict:
    ref, contigs = load_fasta(ref_path)
    genomes = [(c, ref[c]) for c in contigs]

    placed = 0
    dropped = 0
    rows: list[tuple[str, int, str, str, str]] = []

    def place(dna: str, rlen: int, kind: str, ev: str) -> bool:
        nonlocal placed
        if rlen <= 0 or rlen >= len(dna):
            return False
        right = dna[-rlen:]
        left = dna[:-rlen]
        for chrom, g in genomes:
            p = g.find(right)
            if p < 0:
                continue
            if kind == "SNP":
                if p == 0 or not left:
                    return False
                refb = g[p - 1]
                altb = left[-1]
                if refb == altb:
                    return False
                rows.append((chrom, p, refb, altb, "SNP"))  # 1-based = p
                placed += 1
                return True
            if kind == "INDEL" and "/" in ev:
                ins0, _, ins1 = ev.partition("/")
                ins = ins0 or ins1
                if not ins:
                    return False
                ln = len(ins)
                if p - ln >= 1 and g[p - ln: p] == ins:
                    # genome carries the sequence -> deletion in the sample:
                    # anchor at g[p-ln-1]; REF = anchor+ins, ALT = anchor
                    a = g[p - ln - 1]
                    rows.append((chrom, p - ln, a + ins, a, "INDEL"))
                elif p >= 1:
                    # insertion in the sample between g[p-1] and g[p]
                    a = g[p - 1]
                    rows.append((chrom, p, a, a + ins, "INDEL"))
                else:
                    return False
                placed += 1
                return True
            return False
        return False

    def place_rc(dna: str, rlen: int, kind: str, ev: str) -> bool:
        """Reverse-complement placement: RC(dna) = RC(R) + RC(L), so the
        genome-anchored context precedes the variant."""
        nonlocal placed
        if rlen <= 0 or rlen >= len(dna):
            return False
        rcd = revcomp(dna)
        ctx = rcd[:rlen]  # RC of the right context
        for chrom, g in genomes:
            q = g.find(ctx)
            if q < 0:
                continue
            vpos = q + rlen  # 0-based genome position of the variant base
            if kind == "SNP":
                if vpos >= len(g):
                    return False
                refb = g[vpos]
                altb = rcd[rlen]
                if refb == altb:
                    return False
                rows.append((chrom, vpos + 1, refb, altb, "SNP"))
                placed += 1
                return True
            if kind == "INDEL" and "/" in ev:
                ins0, _, ins1 = ev.partition("/")
                ins = revcomp(ins0 or ins1)
                if not ins or vpos < 1:
                    return False
                ln = len(ins)
                a = g[vpos - 1]
                if g[vpos: vpos + ln] == ins:
                    rows.append((chrom, vpos, a + ins, a, "INDEL"))
                else:
                    rows.append((chrom, vpos, a, a + ins, "INDEL"))
                placed += 1
                return True
            return False
        return False

    with open(snp_path) as f:
        header = None
        for line in f:
            line = line.rstrip("\n")
            if line.startswith(">"):
                header = line
            elif header is not None:
                kind, ev = _parse_header(header)
                rlen = _right_len(header)
                ok = False
                if kind:
                    ok = place(line, rlen, kind, ev) or \
                        place_rc(line, rlen, kind, ev)
                if not ok:
                    dropped += 1
                header = None

    # dedupe identical rows (pairs of records describe the same event twice)
    uniq = sorted(set(rows), key=lambda r: (r[0], r[1], r[2], r[3]))
    with open(out_path, "w") as out:
        out.write("##fileformat=VCFv4.1\n")
        for c in contigs:
            out.write(f"##contig=<ID={c}>\n")
        out.write("#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\t"
                  "SAMPLE\n")
        for chrom, pos, refb, altb, vt in uniq:
            out.write(f"{chrom}\t{pos}\t.\t{refb}\t{altb}\t100\tPASS\t"
                      f"VT={vt}\tGT\t1|1\n")
    log(f"placed {placed} records ({len(uniq)} unique variants), "
        f"dropped {dropped}")
    return {"placed": placed, "unique": len(uniq), "dropped": dropped}


def main(argv=None) -> int:
    argv = sys.argv[1:] if argv is None else argv
    if len(argv) != 3:
        print("usage: ebwt2indel-context2vcf calls.snp ref.fasta out.vcf")
        return 1
    convert(argv[0], argv[1], argv[2])
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
