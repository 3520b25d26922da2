"""Pallas TPU kernel for the in-block rank decode.

The batched `parallel_rank` splits into (1) a row gather of 64-byte block
rows from HBM and (2) per-query mask/popcount decode. Measurement on TPU v5e
showed XLA's hardware gather path is the right tool for (1) — per-row DMA
from a Pallas kernel is an order of magnitude slower — so the kernel covers
(2): it consumes the gathered rows in a dense 128-lane layout (8 queries x 16
words per vector row), computing all four base counts with four popcounts per
word via in-lane rolls, with no padded-(B,16) intermediates or layout copies.

Lanes within each 16-word group: words 0-3 = bitplane 0, 4-7 = plane 1,
8-11 = plane 2 (TERM), 12-15 = absolute A,C,G,T counters
(see ops/packing.py; reference layout: internal/dna_string.hpp:19-41).

Status: compiles and is bit-exact on TPU v5e, but measured *slower* than the
dense-lane jnp formulation in ops/rank.py (37 vs 50 Mq/s at B=786k on a 116M
index) — the per-lane offset expansion it requires costs more HBM traffic
than the layout copies it saves. The jnp path is the production default.

Fusion question resolved (round 2): folding the downstream child-filter /
node-extension into this decode cannot recover the gap — the decode INPUT
(6 gathered 64-B rows = 384 B/node) dominates node-phase traffic, while the
(C,4,7)-int32 extension intermediate a fused kernel would eliminate is only
28 B/node (<10%), and XLA already fuses the extension arithmetic into the
decode. Measured confirmations that the gather, not the decode, is the
wall: per-row DMA from Pallas is ~10x slower than XLA's hardware gather,
and both 2-anchor narrow-rank variants (which cut gather rows 3x but add
per-element routing) lose to the dense gather (docs/PERF.md). The kernel
is retained as the regression-tested record of that measurement, not as
pending future work.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

TILE = 1024  # queries per grid step

_U1 = jnp.uint32(1)
_ALL1 = jnp.uint32(0xFFFFFFFF)


def _roll_lanes(x, shift):
    """Roll along the lane (minor) axis."""
    return jnp.roll(x, shift, axis=1)


def _rank_decode_kernel(rows_ref, off_ref, out_ref):
    t8 = TILE // 8
    v = rows_ref[:].reshape(t8, 128)  # dense: 8 queries x 16 words per row
    ob = off_ref[:].reshape(t8, 128)  # offsets pre-expanded 16x per query

    lane = jax.lax.broadcasted_iota(jnp.int32, (t8, 128), 1)
    w16 = lane & 15
    plane = w16 >> 2
    widx = w16 & 3

    u1 = jnp.uint32(1)
    take = jnp.clip(ob - widx * 32, 0, 32)
    sh = jnp.minimum(take, 31).astype(jnp.uint32)
    mask = jnp.where(take == 32, jnp.uint32(0xFFFFFFFF), (u1 << sh) - u1)
    mask = jnp.where(plane < 3, mask, jnp.uint32(0))

    pm = v & mask  # masked plane words; zero at counter lanes
    p1 = _roll_lanes(pm, -4)  # plane-1 word aligned onto plane-0 lanes
    p2 = _roll_lanes(pm, -8)
    np2m = (~p2) & mask
    t0 = pm & np2m
    t1 = p1 & np2m
    t2 = t0 & t1

    pc = jax.lax.population_count
    S = pc(np2m).astype(jnp.int32)
    x = pc(t0).astype(jnp.int32)
    y = pc(t1).astype(jnp.int32)
    z = pc(t2).astype(jnp.int32)

    # sum each query's 4 plane-0 lanes into lane 0 of its 16-lane group
    def red4(a):
        a = a + _roll_lanes(a, -1)
        return a + _roll_lanes(a, -2)

    S, x, y, z = red4(S), red4(x), red4(y), red4(z)
    cA = S - x - y + z
    cC = x - z
    cG = y - z
    cT = z

    cnt = v.astype(jnp.int32)  # counters live at lanes 12..15, unmasked
    out = (
        cnt
        + jnp.where(w16 == 12, _roll_lanes(cA, 12), 0)
        + jnp.where(w16 == 13, _roll_lanes(cC, 13), 0)
        + jnp.where(w16 == 14, _roll_lanes(cG, 14), 0)
        + jnp.where(w16 == 15, _roll_lanes(cT, 15), 0)
    )
    out_ref[:] = out.reshape(TILE * 16)


@functools.partial(jax.jit, static_argnames=("interpret",))
def rank_decode(rows_flat, off, *, interpret=False):
    """rows_flat: (B*16,) uint32 gathered block rows; off: (B,) int32 offsets
    within block. Returns (B, 4) int32 counts (counter + in-block)."""
    B = off.shape[0]
    pad = (-B) % TILE
    if pad:
        rows_flat = jnp.concatenate(
            [rows_flat, jnp.zeros(pad * 16, jnp.uint32)]
        )
        off = jnp.concatenate([off, jnp.zeros(pad, jnp.int32)])
    Bp = B + pad
    off16 = jnp.repeat(off, 16)  # per-lane offsets (XLA-side expand)
    out = pl.pallas_call(
        _rank_decode_kernel,
        grid=(Bp // TILE,),
        in_specs=[
            pl.BlockSpec((TILE * 16,), lambda i: (i,)),
            pl.BlockSpec((TILE * 16,), lambda i: (i,)),
        ],
        out_specs=pl.BlockSpec((TILE * 16,), lambda i: (i,)),
        out_shape=jax.ShapeDtypeStruct((Bp * 16,), jnp.int32),
        interpret=interpret,
    )(rows_flat, off16)
    return out.reshape(Bp, 16)[:B, 12:16]


def parallel_rank_pallas(blocks, i, *, interpret=False):
    """Drop-in parallel_rank using the Pallas decode kernel."""
    shape = i.shape
    i = i.reshape(-1)
    b = jax.lax.shift_right_logical(i, 7)
    o = (i & jnp.int32(127)).astype(jnp.int32)
    rows = blocks[b]  # XLA hardware gather
    out = rank_decode(rows.reshape(-1), o, interpret=interpret)
    return out.reshape(shape + (4,))
