"""Phase 4 — positional clustering over the LCP flag vectors.

The reference scans positions sequentially, opening a cluster while
``LCP_threshold[2i] and not LCP_minima[i]`` holds and closing it at the first
position where it fails (reference: run_one_dataset, ebwt2InDel.cpp:1609-1655;
run_two_datasets, 1395-1429; run_two_datasets_da, 1510-1560). We compute the
mask on device and extract maximal runs vectorized.

Parity notes (quirks preserved):
* a run still open at the last position i = n-1 is never closed, hence never
  analyzed nor histogrammed (the loop ends without a close, cpp:1609-1655);
* the histogram records clusters of *any* closed length (CLUST_SIZES[len] +=
  len for len <= 200), while only clusters with len >= 2*mcov_out are analyzed.
"""

from __future__ import annotations

import dataclasses

import numpy as np

MAX_CLUST_LEN = 200  # histogram cap (ebwt2InDel.cpp:1388)


@dataclasses.dataclass
class Clusters:
    begins: np.ndarray  # (B,) int64 — cluster start (inclusive)
    ends: np.ndarray  # (B,) int64 — cluster end (exclusive) == close position
    n_clusters: int  # number of analyzed clusters (len >= 2*mcov_out)
    clust_size_sum: int  # cumulative length over *all closed* clusters
    n_closed: int  # number of closed clusters (for average length: ref divides
    # clust_size by n_clusters — see pipeline)
    hist: np.ndarray  # (201,) int64 — CLUST_SIZES


def cluster_mask(thr_K: np.ndarray, minima: np.ndarray) -> np.ndarray:
    return (thr_K != 0) & (minima == 0)


def find_clusters(thr_K: np.ndarray, minima: np.ndarray, mcov_out: int) -> Clusters:
    return find_clusters_from_mask(cluster_mask(thr_K, minima), mcov_out)


def find_clusters_from_mask(mask: np.ndarray, mcov_out: int) -> Clusters:
    n = mask.shape[0]
    if n == 0:
        return Clusters(
            begins=np.zeros(0, np.int64), ends=np.zeros(0, np.int64),
            n_clusters=0, clust_size_sum=0, n_closed=0,
            hist=np.zeros(MAX_CLUST_LEN + 1, np.int64),
        )
    m = mask.astype(bool)
    edges = np.flatnonzero(m[1:] != m[:-1]) + 1
    if m[0]:
        starts = np.concatenate([[0], edges[1::2]])
        stops = edges[0::2]
    else:
        starts = edges[0::2]
        stops = edges[1::2]
    # a run reaching the end is never closed by the reference scan — drop it
    starts = starts[: len(stops)]
    lens = stops - starts

    small = lens[lens <= MAX_CLUST_LEN]
    hist = np.bincount(small, weights=small,
                       minlength=MAX_CLUST_LEN + 1).astype(np.int64)
    hist = hist[: MAX_CLUST_LEN + 1]

    analyzed = lens >= 2 * mcov_out
    return Clusters(
        begins=starts[analyzed].astype(np.int64),
        ends=stops[analyzed].astype(np.int64),
        n_clusters=int(analyzed.sum()),
        clust_size_sum=int(lens.sum()),
        n_closed=int(len(lens)),
        hist=hist,
    )
