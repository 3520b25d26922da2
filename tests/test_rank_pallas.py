"""Pallas rank-decode kernel vs the jnp path and the numpy oracle."""

import numpy as np
import pytest

import jax.numpy as jnp

from ebwt2indel_tpu.ops import packing, rank, rank_pallas
from tests import oracle
from tests.test_rank import random_codes


@pytest.mark.parametrize("n,q", [(5000, 512), (100000, 4096), (3000, 100)])
def test_pallas_decode_matches_jnp(rng, n, q):
    codes = random_codes(rng, n, p_term=0.05)
    pb = packing.pack_codes(codes)
    blocks = jnp.asarray(pb.blocks)
    qs = jnp.asarray(rng.integers(0, n + 1, q).astype(np.int32))
    ref = np.asarray(rank.parallel_rank(blocks, qs))
    got = np.asarray(
        rank_pallas.parallel_rank_pallas(blocks, qs, interpret=True)
    )
    np.testing.assert_array_equal(got, ref)


def test_pallas_decode_oracle(rng):
    codes = random_codes(rng, 2000, p_term=0.1)
    pb = packing.pack_codes(codes)
    blocks = jnp.asarray(pb.blocks)
    qs = np.array([0, 1, 127, 128, 129, 1000, 1999, 2000], dtype=np.int32)
    got = np.asarray(
        rank_pallas.parallel_rank_pallas(blocks, jnp.asarray(qs),
                                         interpret=True)
    )
    for k, i in enumerate(qs):
        np.testing.assert_array_equal(got[k], oracle.rank_oracle(codes, int(i)))
