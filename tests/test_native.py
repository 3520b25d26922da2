"""Native C++ packer must agree exactly with the numpy packer."""

import numpy as np
import pytest

from ebwt2indel_tpu.ops import packing
from ebwt2indel_tpu.utils import dna
from tests.test_rank import random_codes

native = pytest.importorskip("ebwt2indel_tpu.ops.native")


def test_native_pack_matches_numpy(rng):
    codes = random_codes(rng, 100000, p_term=0.03)
    ascii_data = dna.decode_table()[codes]
    pb_np = packing.pack_codes(codes)
    pb_nat = native.pack_bytes(ascii_data)
    np.testing.assert_array_equal(pb_nat.blocks, pb_np.blocks)
    np.testing.assert_array_equal(pb_nat.block_counts, pb_np.block_counts)
    np.testing.assert_array_equal(pb_nat.F, pb_np.F)
    np.testing.assert_array_equal(pb_nat.counts, pb_np.counts)
    assert pb_nat.n == pb_np.n


def test_native_rejects_forbidden(rng):
    data = np.frombuffer(b"ACGTX#", dtype=np.uint8)
    with pytest.raises(ValueError, match="forbidden character 'X'"):
        native.pack_bytes(data)


def test_native_pack_da(tmp_path, rng):
    n = 33000
    bits = (rng.random(n) < 0.4).astype(np.uint8)
    path = tmp_path / "da.txt"
    path.write_bytes(bytes((b"01"[b] for b in bits)))
    got_bits, words, counts = native.pack_da_file(str(path), n)
    np.testing.assert_array_equal(got_bits, bits)
    exp_words, exp_counts = packing.pack_bitvector(bits)
    np.testing.assert_array_equal(words, exp_words)
    np.testing.assert_array_equal(counts, exp_counts)
