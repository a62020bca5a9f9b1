"""Bit pack/unpack as vectorized device ops.

The reference chains shuffle bits with byte-serial C loops (e.g. GNU Radio's
``packed_to_unpacked_bb`` instantiated at /root/reference/qam-blade.py:51).
Here bytes↔bits are pure reshape/shift ops that XLA fuses into neighbors.
Convention everywhere: MSB-first, matching broadcast-standard serialization.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

_SHIFTS8 = jnp.arange(7, -1, -1, dtype=jnp.uint8)


def bytes_to_bits(x: jnp.ndarray) -> jnp.ndarray:
    """uint8 [..., n] → uint8 bits [..., n*8], MSB first."""
    b = (x[..., :, None].astype(jnp.uint8) >> _SHIFTS8) & 1
    return b.reshape(*x.shape[:-1], x.shape[-1] * 8)


def bits_to_bytes(b: jnp.ndarray) -> jnp.ndarray:
    """uint8 bits [..., n*8] → uint8 [..., n], MSB first."""
    n = b.shape[-1] // 8
    g = b.reshape(*b.shape[:-1], n, 8).astype(jnp.uint8)
    return jnp.sum(g << _SHIFTS8, axis=-1, dtype=jnp.uint8)


def bits_to_words(b: jnp.ndarray, width: int) -> jnp.ndarray:
    """bits [..., n*width] → int32 words [..., n], MSB first per word."""
    n = b.shape[-1] // width
    g = b.reshape(*b.shape[:-1], n, width).astype(jnp.int32)
    shifts = jnp.arange(width - 1, -1, -1, dtype=jnp.int32)
    return jnp.sum(g << shifts, axis=-1)


def words_to_bits(w: jnp.ndarray, width: int) -> jnp.ndarray:
    """int words [..., n] → uint8 bits [..., n*width], MSB first per word."""
    shifts = jnp.arange(width - 1, -1, -1, dtype=jnp.int32)
    b = (w[..., :, None] >> shifts) & 1
    return b.reshape(*w.shape[:-1], w.shape[-1] * width).astype(jnp.uint8)


def np_bytes_to_bits(x: np.ndarray) -> np.ndarray:
    return np.unpackbits(np.asarray(x, dtype=np.uint8), axis=-1)


def np_bits_to_bytes(b: np.ndarray) -> np.ndarray:
    return np.packbits(np.asarray(b, dtype=np.uint8), axis=-1)
