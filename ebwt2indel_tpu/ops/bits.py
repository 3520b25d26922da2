"""Device-side bit packing for host transfers.

Flag vectors live as uint8 on device; downloading them raw over a remote
device link costs 8x the necessary bytes. Pack to bits on device, unpack
with numpy on host.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def device_packbits(arr) -> jnp.ndarray:
    """(n,) bool/uint8 -> (ceil(n/8),) uint8, little-endian bit order."""
    n = arr.shape[0]
    pad = (-n) % 8
    a = arr.astype(jnp.uint8)
    if pad:
        a = jnp.concatenate([a, jnp.zeros(pad, jnp.uint8)])
    weights = (jnp.uint8(1) << jnp.arange(8, dtype=jnp.uint8))[None, :]
    return (a.reshape(-1, 8) * weights).sum(axis=1, dtype=jnp.uint8)


def host_unpackbits(packed: np.ndarray, n: int) -> np.ndarray:
    """Inverse of device_packbits; returns (n,) uint8 in {0,1}."""
    return np.unpackbits(np.asarray(packed), bitorder="little")[:n]
