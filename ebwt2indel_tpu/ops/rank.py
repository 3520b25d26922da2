"""Batched rank / access / select over the packed block layout (device, jnp).

These are the TPU equivalents of the reference's per-query primitives:

* ``parallel_rank``  <- dna_string.hpp:140-152 (superblock+block counter + in-block
  popcount; here: one row gather + masked ``lax.population_count`` per plane)
* ``access``         <- dna_string.hpp:113-135
* ``select``         <- dna_string.hpp:182-272. The reference does a global binary
  search with O(log n) rank calls per query; we do a hierarchical counter descent:
  searchsorted over per-block counters, then an in-block word/bit descent —
  O(log n_blocks) cheap int32 gathers + O(1) popcounts per query, fully batched.
  select is the hot primitive of right-context extraction (FL, dna_bwt.hpp:115-133).

All functions are batched: position/rank arguments are int32 arrays of any shape.
Everything is jittable with static shapes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

BLOCK = 128
WPB = 4

import numpy as _np

# numpy scalars, NOT jnp: a module-level jnp constant would initialize the
# XLA backend at import time, which breaks jax.distributed.initialize
# (must run before any backend touch — parallel/launch.py)
_U1 = _np.uint32(1)
_ALL1 = _np.uint32(0xFFFFFFFF)


def _prefix_masks(o):
    """Per-word uint32 masks selecting the first ``o`` bits of a 128-bit block.

    o: int32 [...]; returns uint32 [..., 4].
    """
    w = jnp.arange(WPB, dtype=jnp.int32)
    take = jnp.clip(o[..., None] - w * 32, 0, 32)  # [..., 4]
    sh = jnp.minimum(take, 31).astype(jnp.uint32)
    partial = (_U1 << sh) - _U1
    return jnp.where(take == 32, _ALL1, partial)


def _char_plane_words(row):
    """row: uint32 [..., 16] -> uint32 [..., 4(char), 4(word)] with the bit set
    where the character at that offset equals the char (A,C,G,T)."""
    p0 = row[..., 0:4]
    p1 = row[..., 4:8]
    p2 = row[..., 8:12]
    np2 = ~p2
    a = np2 & ~p1 & ~p0
    c = np2 & ~p1 & p0
    g = np2 & p1 & ~p0
    t = np2 & p1 & p0
    return jnp.stack([a, c, g, t], axis=-2)


def parallel_rank(blocks, i):
    """Counts of (A,C,G,T) in the prefix of length ``i``.

    blocks: uint32 (n_blocks, 16); i: int32 [...]; returns int32 [..., 4].
    Mirrors dna_string.hpp:140-152.

    The element-wise work runs in a transposed (words, B) layout so the
    batch occupies the dense minor (lane) dimension — a (B, 16) layout
    wastes 7/8 of the VPU lanes. Per-word counts use 4 popcounts and the
    linear combination A = S-x-y+z, C = x-z, G = y-z, T = z where
    S = #non-TERM, x = #bit0, y = #bit1, z = #(bit0&bit1).
    """
    shape = i.shape
    i = i.reshape(-1)
    b = jax.lax.shift_right_logical(i, 7)
    o = i & jnp.int32(BLOCK - 1)
    rowT = blocks[b].T  # (16, B)
    p0 = rowT[0:4]
    p1 = rowT[4:8]
    p2 = rowT[8:12]
    cnt = rowT[12:16].astype(jnp.int32)  # (4, B) counters A,C,G,T

    w = jnp.arange(WPB, dtype=jnp.int32)[:, None]
    take = jnp.clip(o[None, :] - w * 32, 0, 32)  # (4, B)
    sh = jnp.minimum(take, 31).astype(jnp.uint32)
    mask = jnp.where(take == 32, _ALL1, (_U1 << sh) - _U1)

    np2m = ~p2 & mask
    t0 = p0 & np2m
    t1 = p1 & np2m
    t2 = p0 & t1
    pc = jax.lax.population_count
    S = pc(np2m).sum(axis=0, dtype=jnp.int32)
    x = pc(t0).sum(axis=0, dtype=jnp.int32)
    y = pc(t1).sum(axis=0, dtype=jnp.int32)
    z = pc(t2).sum(axis=0, dtype=jnp.int32)
    out = jnp.stack(
        [cnt[0] + (S - x - y + z), cnt[1] + (x - z), cnt[2] + (y - z),
         cnt[3] + z],
        axis=-1,
    )
    return out.reshape(shape + (4,))


def parallel_rank_dedup(blocks, i, budget: int):
    """parallel_rank over a 1-D query vector whose adjacent entries are
    frequently equal — rank once per *distinct* coordinate.

    The reference skips rank calls at equal node boundaries
    (dna_bwt.hpp:334-347: ``if(N.first_A == N.first_TERM) before_A =
    before_TERM``). The batched equivalent: compact the run-heads of ``i``
    into a ``budget``-sized buffer (index scatter), rank the buffer, and
    gather each query's governing result back via the inclusive prefix
    count of run-heads. Equal coordinates have equal ranks, so this is
    exact; adjacent *cross-node* duplicates (sibling intervals sharing a
    boundary after char-major queue compaction) dedup for free too.

    Falls back to the dense rank when the distinct count exceeds
    ``budget`` (lax.cond — one branch executes). budget must be static.

    i: int32 (B,); returns int32 (B, 4).
    """
    head = jnp.concatenate(
        [jnp.ones(1, dtype=bool), i[1:] != i[:-1]]
    )
    gov = jnp.cumsum(head.astype(jnp.int32)) - 1  # governing slot per query
    count = gov[-1] + 1

    def dedup_path(_):
        pos = jnp.where(head, gov, jnp.int32(budget))
        buf = jnp.zeros(budget, jnp.int32).at[pos].set(i, mode="drop")
        rc = parallel_rank(blocks, buf)  # (budget, 4)
        return rc[jnp.minimum(gov, budget - 1)]

    def dense_path(_):
        return parallel_rank(blocks, i)

    return jax.lax.cond(count <= budget, dedup_path, dense_path, None)


def rank_non_dna(blocks, i):
    """Number of TERM characters before position i (dna_string.hpp:194-203)."""
    return i - parallel_rank(blocks, i).sum(axis=-1, dtype=jnp.int32)


def rank_char(blocks, i, c):
    """rank of character code c (0..3) at i; TERM handled by rank_non_dna
    (dna_string.hpp:157-174)."""
    pr = parallel_rank(blocks, i)
    dna_r = jnp.take_along_axis(
        pr, jnp.clip(c, 0, 3)[..., None].astype(jnp.int32), axis=-1
    )[..., 0]
    return jnp.where(c == 4, rank_non_dna(blocks, i), dna_r)


def access(blocks, i):
    """Character code (0..4) at position i (dna_string.hpp:113-135)."""
    b = jax.lax.shift_right_logical(i, 7)
    o = i & jnp.int32(BLOCK - 1)
    row = blocks[b]
    widx = jax.lax.shift_right_logical(o, 5)
    bit = (o & 31).astype(jnp.uint32)
    code = jnp.zeros(i.shape, dtype=jnp.int32)
    for p in range(3):
        word = jnp.take_along_axis(row[..., p * WPB : (p + 1) * WPB],
                                   widx[..., None], axis=-1)[..., 0]
        code = code | (((word >> bit) & _U1).astype(jnp.int32) << p)
    return code


def _select_in_word(word, t):
    """Position (0..31) of the (t+1)-th set bit of ``word`` (uint32), batched.

    5-step binary descent on prefix popcounts.
    """
    lo = jnp.zeros(t.shape, dtype=jnp.int32)
    for k in (16, 8, 4, 2, 1):
        m = jnp.minimum(lo + k, 31).astype(jnp.uint32)
        pref = (_U1 << m) - _U1
        pref = jnp.where(lo + k >= 32, _ALL1, pref)
        cnt = jax.lax.population_count(word & pref).astype(jnp.int32)
        lo = jnp.where(cnt <= t, lo + k, lo)
    return lo


def select_block(block_counts, r, c):
    """Phase A of select: the block containing the (r+1)-th occurrence of
    char c — binary search over the absolute per-block counters."""
    nb = block_counts.shape[0]
    lo = jnp.zeros(r.shape, dtype=jnp.int32)
    hi = jnp.full(r.shape, nb, dtype=jnp.int32)  # exclusive
    # invariant: counts[lo] <= r < counts[hi] (counts[nb] == total > r)
    steps = max(1, (nb - 1).bit_length())
    for _ in range(steps):
        mid = (lo + hi) >> 1
        use = mid > lo
        cm = jnp.take_along_axis(block_counts[mid], c[..., None], axis=-1)[..., 0]
        gt = cm > r
        lo = jnp.where(use & ~gt, mid, lo)
        hi = jnp.where(use & gt, mid, hi)
    return lo


def select_in_block(row, r, c):
    """Phase B of select: offset (0..127) of the (t+1)-th occurrence of char
    c inside a gathered block row, t = r minus the block's counter."""
    t = r - jnp.take_along_axis(row[..., 12:16].astype(jnp.int32),
                                c[..., None], axis=-1)[..., 0]
    chars = _char_plane_words(row)  # [..., 4, 4]
    words = jnp.take_along_axis(
        chars, c[..., None, None].astype(jnp.int32), axis=-2
    )[..., 0, :]  # [..., 4]
    wc = jax.lax.population_count(words).astype(jnp.int32)
    cum = jnp.cumsum(wc, axis=-1)
    prev = cum - wc
    widx = jnp.sum((cum <= t[..., None]).astype(jnp.int32), axis=-1)
    widx = jnp.clip(widx, 0, WPB - 1)
    t2 = t - jnp.take_along_axis(prev, widx[..., None], axis=-1)[..., 0]
    word = jnp.take_along_axis(words, widx[..., None], axis=-1)[..., 0]
    bit = _select_in_word(word, t2)
    return widx * 32 + bit


def select(blocks, block_counts, r, c):
    """Position of the (r+1)-th occurrence of char code c (0..3), batched.

    blocks: uint32 (n_blocks, 16); block_counts: int32 (n_blocks, 4);
    r, c: int32 [...]. Assumes r < total count of c (dna_string.hpp:182-188).
    """
    b = select_block(block_counts, r, c)
    return b * BLOCK + select_in_block(blocks[b], r, c)


# ---------------------------------------------------------------------------
# rank-1 over a packed bitvector (document array / LCP flag vectors)
# ---------------------------------------------------------------------------


def bv_rank1(words, counts, i):
    """Number of 1-bits before position i.

    words: uint32 (n_blocks, 4); counts: int32 (n_blocks,); i: int32 [...].
    TPU-side rank over the document array (the reference keeps DA as
    vector<bool> and scans it sequentially, ebwt2InDel.cpp:1431-1432).
    """
    b = jax.lax.shift_right_logical(i, 7)
    o = i & jnp.int32(BLOCK - 1)
    row = words[b]  # [..., 4]
    masks = _prefix_masks(o)
    inblock = jax.lax.population_count(row & masks).sum(axis=-1, dtype=jnp.int32)
    return counts[b] + inblock


def bv_get(words, i):
    """Bit at position i."""
    b = jax.lax.shift_right_logical(i, 7)
    o = i & jnp.int32(BLOCK - 1)
    row = words[b]
    widx = jax.lax.shift_right_logical(o, 5)
    bit = (o & 31).astype(jnp.uint32)
    word = jnp.take_along_axis(row, widx[..., None], axis=-1)[..., 0]
    return ((word >> bit) & _U1).astype(jnp.int32)
