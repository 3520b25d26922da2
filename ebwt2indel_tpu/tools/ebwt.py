"""eBWT construction for read collections.

The reference depends on external builders (BCR_LCP_GSA / eGSA / egap,
README.md:38) and consumes their ASCII .ebwt output; BWT construction is out
of its scope. We nevertheless ship a builder so the framework is usable
end-to-end without third-party tools: the multi-string BWT of a read set is
computed via a numpy prefix-doubling suffix array over the terminator-joined
concatenation (terminators sort smallest; ties resolve by the following text,
which yields a valid eBWT — the main tool never applies LF to terminators, so
the terminator permutation is immaterial).

Host-side O(n log n); suitable for pipeline use at tens of millions of
characters. Also used to generate golden-parity fixtures for the test suite.
"""

from __future__ import annotations

import numpy as np

from ..utils import dna


def suffix_array(codes: np.ndarray) -> np.ndarray:
    """Prefix-doubling suffix array; codes must be small non-negative ints."""
    n = len(codes)
    rank = codes.astype(np.int64)
    k = 1
    idx = np.arange(n, dtype=np.int64)
    while True:
        shifted = idx + k
        key2 = np.where(shifted < n, rank[np.minimum(shifted, n - 1)], -1)
        order = np.lexsort((key2, rank))
        neq = (rank[order[1:]] != rank[order[:-1]]) | (
            key2[order[1:]] != key2[order[:-1]]
        )
        new_rank = np.empty(n, dtype=np.int64)
        new_rank[order] = np.concatenate([[0], np.cumsum(neq)])
        rank = new_rank
        if rank[order[-1]] == n - 1:
            return order
        k *= 2


def ebwt_of_reads(reads: list[str], term: str = "#") -> str:
    """ASCII eBWT of a read multiset (each read terminator-suffixed).

    The terminator compares smaller than A<C<G<T (matching the reference's
    F-column convention, dna_bwt.hpp:47-61).
    """
    text = term.join(reads) + term
    n = len(text)
    raw = np.frombuffer(text.encode("ascii"), dtype=np.uint8)
    codes = np.zeros(n, dtype=np.int64)
    for b, c in ((ord("A"), 1), (ord("C"), 2), (ord("G"), 3), (ord("T"), 4)):
        codes[raw == b] = c
    sa = suffix_array(codes)
    prev = (sa - 1) % n
    return raw[prev].tobytes().decode("ascii")


def ebwt_and_da_of_two(reads1: list[str], reads2: list[str],
                       term: str = "#") -> tuple[str, str]:
    """Merged eBWT of two collections plus the document array ('0'/'1' per
    position), with collection-1 suffixes preceding collection-2 suffixes on
    equal strings (the merge convention of update_DA, ebwt2InDel.cpp:394-449).
    """
    t1 = term.join(reads1) + term
    t2 = term.join(reads2) + term
    text = t1 + t2
    n = len(text)
    raw = np.frombuffer(text.encode("ascii"), dtype=np.uint8)
    is_term = raw == ord(term)
    n_term = int(is_term.sum())
    # give each terminator a distinct code ordered by position — all smaller
    # than the bases — so equal truncated suffixes sort by terminator
    # position, putting collection-1 suffixes first (t1 precedes t2)
    codes = np.zeros(n, dtype=np.int64)
    codes[is_term] = np.arange(n_term)
    base_code = {ord("A"): 0, ord("C"): 1, ord("G"): 2, ord("T"): 3}
    for b, c in base_code.items():
        codes[raw == b] = n_term + c
    sa = suffix_array(codes)
    prev = (sa - 1) % n
    bwt = raw[prev].tobytes().decode("ascii")
    da = "".join("1" if p >= len(t1) else "0" for p in sa)
    return bwt, da


def write_fasta_reads(path: str, reads: list[str]) -> None:
    with open(path, "w") as f:
        for i, r in enumerate(reads):
            f.write(f">read_{i}\n{r}\n")


def read_fasta(path: str) -> list[str]:
    reads: list[str] = []
    cur: list[str] = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            if line.startswith(">"):
                if cur:
                    reads.append("".join(cur))
                    cur = []
            else:
                cur.append(line.upper())
    if cur:
        reads.append("".join(cur))
    return reads
