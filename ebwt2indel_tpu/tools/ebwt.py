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


def _native_sais():
    import ctypes
    import os
    import subprocess

    d = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "..",
                     "native")
    lib_path = os.path.join(d, "libsaca.so")
    if not os.path.isfile(lib_path):
        subprocess.run(["make", "-C", d, "libsaca.so"], check=True,
                       capture_output=True)
    lib = ctypes.CDLL(lib_path)
    lib.sais_int32.restype = ctypes.c_int64
    lib.sais_int32.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                               ctypes.c_int64, ctypes.c_int64]
    lib.sais_int64.restype = ctypes.c_int64
    lib.sais_int64.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                               ctypes.c_int64, ctypes.c_int64]
    return lib


def suffix_array_sentinel(codes: np.ndarray) -> np.ndarray:
    """Suffix array of an int sequence whose last element is the unique
    smallest (0). Uses the native linear-time SA-IS (native/saca.cpp) when
    available — the int64-index variant past 2^31 positions (BASELINE
    config 5 scale) — falling back to numpy prefix doubling."""
    codes = np.ascontiguousarray(codes, dtype=np.int32)
    n = len(codes)
    try:
        lib = _native_sais()
        K = int(codes.max()) + 1
        if n >= 2**31:
            sa = np.empty(n, dtype=np.int64)
            rc = lib.sais_int64(codes.ctypes.data, sa.ctypes.data, n, K)
            if rc == 0:
                return sa
        else:
            sa = np.empty(n, dtype=np.int32)
            rc = lib.sais_int32(codes.ctypes.data, sa.ctypes.data, n, K)
            if rc == 0:
                return sa.astype(np.int64)
    except Exception:
        pass
    return suffix_array(codes.astype(np.int64))


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
    raw = np.frombuffer(text.encode("ascii"), dtype=np.uint8)
    sa = _ebwt_sa(raw, ord(term))
    prev = (sa - 1) % len(raw)
    return raw[prev].tobytes().decode("ascii")


def _ebwt_sa(raw: np.ndarray, term: int) -> np.ndarray:
    """Suffix array of the terminator-joined text with terminators distinct
    (ordered by position) and smaller than the bases — ties between equal
    truncated suffixes resolve by terminator position, so collection-1
    suffixes precede collection-2 suffixes in a two-collection concatenation
    (the merge convention of update_DA, ebwt2InDel.cpp:394-449)."""
    n = len(raw)
    is_term = raw == term
    n_term = int(is_term.sum())
    codes = np.zeros(n + 1, dtype=np.int32)
    codes[:n][is_term] = np.arange(1, n_term + 1, dtype=np.int32)
    base_off = n_term
    for b, c in ((ord("A"), 1), (ord("C"), 2), (ord("G"), 3), (ord("T"), 4)):
        codes[:n][raw == b] = base_off + c
    # codes[n] = 0: unique smallest sentinel for SA-IS
    sa = suffix_array_sentinel(codes)
    assert sa[0] == n
    return sa[1:]


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
    sa = _ebwt_sa(raw, ord(term))
    prev = (sa - 1) % n
    bwt = raw[prev].tobytes().decode("ascii")
    da_bits = (sa >= len(t1)).astype(np.uint8)
    da = (da_bits + ord("0")).astype(np.uint8).tobytes().decode("ascii")
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
