"""K=7 convolutional mother code + DVB puncturing, fully vectorized.

The reference's inner coder (GNU Radio block at /root/reference/
dvbt-blade.py:182) shifts bits through a 6-bit register one at a time.  A
convolutional code is a linear filter over GF(2): with the whole block in a
bit array, each output stream is just the XOR of a few *shifted copies* of
the input — O(taps) vectorized XORs for the entire block, no scan.  The only
sequential dependency is the 6 bits of encoder memory at a block boundary,
and those are simply the last 6 *input* bits of the previous block — a pure
function of the input stream, so sequence shards can compute their
neighbour's carry locally (see parallel/stream.py).

Mother code (EN 300 744 §4.3.3): K=7, G1=171oct (X), G2=133oct (Y).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

# Tap positions j (output = XOR of d[i-j]) for the two generators.
G1_TAPS = (0, 1, 2, 3, 6)   # 171 octal = 1111001b
G2_TAPS = (0, 2, 3, 5, 6)   # 133 octal = 1011011b

# EN 300 744 table 3 puncturing patterns: (X pattern, Y pattern) per period.
# Serial output order per step i: X_i (if kept) then Y_i (if kept).
PUNCTURE_PATTERNS: dict[tuple[int, int], tuple[tuple[int, ...], tuple[int, ...]]] = {
    (1, 2): ((1,), (1,)),
    (2, 3): ((1, 0), (1, 1)),
    (3, 4): ((1, 0, 1), (1, 1, 0)),
    (5, 6): ((1, 0, 1, 0, 1), (1, 1, 0, 1, 0)),
    (7, 8): ((1, 0, 0, 0, 1, 0, 1), (1, 1, 1, 1, 0, 1, 0)),
}


def conv_encode(data_bits: jnp.ndarray, state_bits: jnp.ndarray) -> jnp.ndarray:
    """Encode a bit block given the 6 bits of preceding stream history.

    data_bits: uint8 [n] in {0,1}; state_bits: uint8 [6], state_bits[j] is the
    input bit at stream position -1-j (most recent first).  Returns uint8
    [n, 2] with columns (X, Y) per input bit.
    """
    n = data_bits.shape[0]
    # d_ext[6 + i] == d[i]; d_ext[6 - j] == input at position i-j for i=0
    d_ext = jnp.concatenate([state_bits[::-1].astype(jnp.uint8),
                             data_bits.astype(jnp.uint8)])
    x = jnp.zeros(n, dtype=jnp.uint8)
    y = jnp.zeros(n, dtype=jnp.uint8)
    for j in G1_TAPS:
        x = x ^ jax_slice(d_ext, 6 - j, n)
    for j in G2_TAPS:
        y = y ^ jax_slice(d_ext, 6 - j, n)
    return jnp.stack([x, y], axis=-1)


def jax_slice(a: jnp.ndarray, start: int, length: int) -> jnp.ndarray:
    return a[start:start + length]


def puncture_indices(code_rate: tuple[int, int], n_pairs: int) -> np.ndarray:
    """Static gather indices selecting kept bits from the flattened [n_pairs*2]
    serial (X0,Y0,X1,Y1,...) stream.  ``n_pairs`` must be a multiple of the
    puncture period so block boundaries are phase-aligned (guaranteed per
    superframe by the DVB-T frame budget — see DvbtConfig)."""
    xp, yp = PUNCTURE_PATTERNS[code_rate]
    period = len(xp)
    assert n_pairs % period == 0, (n_pairs, period)
    keep = []
    for i in range(period):
        if xp[i]:
            keep.append(2 * i)
        if yp[i]:
            keep.append(2 * i + 1)
    base = np.asarray(keep, dtype=np.int64)
    reps = n_pairs // period
    return (np.arange(reps, dtype=np.int64)[:, None] * (2 * period)
            + base[None, :]).reshape(-1)
