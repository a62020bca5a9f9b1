"""Block-parallel Viterbi decoder for the K=7 DVB mother code, TPU-native.

The reference ecosystem decodes this code bit-serially (a receiver-side
counterpart of the inner coder the reference instantiates at
/root/reference/dvbt-blade.py:182).  A serial 64-state trellis walk is the
worst possible shape for a TPU, so this module uses the standard high-rate
receiver architecture instead: *block-parallel Viterbi with overlap
truncation*.  The coded stream is split into B overlapping blocks; every
block runs its own 64-state add-compare-select recursion with an
all-equal-metric start, and after ~5K constraint lengths the survivor paths
of adjacent blocks provably merge, so each block's central region decodes
exactly as a whole-stream Viterbi would.  On device that is:

  * one ``lax.scan`` over time, carrying metrics of shape [B, 64] — the ACS
    step is pure vector math (two static gathers + max), fully parallel over
    blocks and states;
  * survivor decisions bit-packed to uint8 [T, B, 8] on the fly (64 bits a
    step), keeping the traceback memory at 8 bytes/step/block;
  * a reverse ``lax.scan`` traceback, also vectorized over blocks.

Depuncturing is an erasure scatter: punctured positions contribute zero
branch metric, exactly the soft-decision convention.  Inputs are soft LLRs
(positive = bit 0), so the same decoder serves hard-decision loopback tests
(LLR = ±1) and noisy-channel decoding.

State convention matches ops/convcode.py: the encoder register holds the
last 6 input bits, state s = (d[i-1]..d[i-6]) with d[i-1] at bit 5; the
7-bit tap window for input b is w = (b << 6) | s, X = parity(w & 0o171),
Y = parity(w & 0o133), next state = w >> 1.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from dtv_utils_tpu.ops.convcode import PUNCTURE_PATTERNS

_G1_MASK = 0o171
_G2_MASK = 0o133
N_STATES = 64

# Traceback/merge depth: 5 constraint lengths is the textbook rule; 96 gives
# a comfortable margin for punctured rates (weaker code → slower merge).
OVERLAP = 96


def _parity(x: np.ndarray) -> np.ndarray:
    out = np.zeros_like(x)
    while np.any(x):
        out ^= x & 1
        x >>= 1
    return out


@functools.cache
def _trellis() -> dict[str, np.ndarray]:
    """Static transition tables indexed by (next_state ns, a) where a is the
    bit shifted out of the register (the oldest input bit, d[i-6] of the
    predecessor)."""
    ns = np.arange(N_STATES)[:, None]          # [64, 1]
    a = np.arange(2)[None, :]                  # [1, 2]
    prev = ((ns & 31) << 1) | a                # predecessor state [64, 2]
    b = ns >> 5                                # input bit of the transition
    w = (b << 6) | prev                        # 7-bit tap window
    out_x = 1.0 - 2.0 * _parity(w & _G1_MASK)  # ±1, +1 for coded bit 0
    out_y = 1.0 - 2.0 * _parity(w & _G2_MASK)
    return dict(prev=prev.astype(np.int32),
                out_x=out_x.astype(np.float32),
                out_y=out_y.astype(np.float32),
                bit=(ns >> 5).astype(np.uint8).repeat(2, 1))


def depuncture(llr: jnp.ndarray, code_rate: tuple[int, int]) -> jnp.ndarray:
    """Punctured serial LLR stream [n_kept] -> (x, y) LLR pairs [n_steps, 2]
    with zeros (erasures) at punctured positions.

    n_kept must be a whole number of puncture periods (the DVB-T superframe
    budget guarantees this; see ops/convcode.puncture_indices).
    """
    xp, yp = PUNCTURE_PATTERNS[code_rate]
    period = len(xp)
    kept_per = int(sum(xp) + sum(yp))
    assert llr.shape[0] % kept_per == 0, (llr.shape, kept_per)
    reps = llr.shape[0] // kept_per
    cols = []
    for i in range(period):
        if xp[i]:
            cols.append(2 * i)
        if yp[i]:
            cols.append(2 * i + 1)
    full = jnp.zeros((reps, 2 * period), dtype=llr.dtype)
    full = full.at[:, jnp.asarray(cols)].set(llr.reshape(reps, kept_per))
    return full.reshape(reps * period, 2)


def _acs_scan(pairs: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """pairs [T, B, 2] -> (decisions uint8 [T, B, 8] bit-packed, final
    metrics [B, 64])."""
    tr = _trellis()
    prev = jnp.asarray(tr["prev"])            # [64, 2]
    out_x = jnp.asarray(tr["out_x"])          # [64, 2]
    out_y = jnp.asarray(tr["out_y"])
    pack_w = jnp.asarray((1 << np.arange(8)).astype(np.uint8))
    B = pairs.shape[1]

    def step(metrics, xy):
        # metrics [B, 64]; xy [B, 2]
        bm = (xy[:, 0:1, None] * out_x[None] +
              xy[:, 1:2, None] * out_y[None])        # [B, 64, 2]
        cand = metrics[:, prev] + bm                 # [B, 64, 2]
        dec = (cand[..., 1] > cand[..., 0])          # [B, 64] bool
        new = jnp.max(cand, axis=-1)
        # bound metric growth (LLR magnitudes are bounded; subtracting the
        # per-block max keeps float32 exact over arbitrarily long streams)
        new = new - jnp.max(new, axis=-1, keepdims=True)
        packed = jnp.sum(dec.reshape(B, 8, 8).astype(jnp.uint8)
                         * pack_w[None, None, :], axis=-1, dtype=jnp.uint8)
        return new, packed

    metrics0 = jnp.zeros((B, N_STATES), dtype=jnp.float32)
    final, decs = jax.lax.scan(step, metrics0, pairs)
    return decs, final


def _traceback(decs: jnp.ndarray, final: jnp.ndarray) -> jnp.ndarray:
    """decisions [T, B, 8], final metrics [B, 64] -> decoded bits uint8
    [T, B] (bit at step t is the encoder *input* of step t)."""
    B = final.shape[0]
    start = jnp.argmax(final, axis=-1).astype(jnp.int32)   # [B]
    barange = jnp.arange(B)

    def step(state, packed):
        # state [B] int32 = survivor state AFTER this step
        bit = (state >> 5).astype(jnp.uint8)
        byte = packed[barange, state >> 3]
        a = (byte >> (state & 7).astype(jnp.uint8)) & 1
        prev = ((state & 31) << 1) | a.astype(jnp.int32)
        return prev, bit

    _, bits = jax.lax.scan(step, start, decs, reverse=True)
    return bits


def viterbi_decode(llr_pairs: jnp.ndarray, block: int = 4096,
                   overlap: int = OVERLAP) -> jnp.ndarray:
    """Decode (X, Y) LLR pairs [n, 2] -> input bits uint8 [n].

    Assumes the encoder started from the all-zero state at stream position 0
    (DVB-T superframe streams satisfy this via the explicit carry state).
    Block-parallel: exact equality with whole-stream Viterbi holds for every
    bit whose distance to a block seam exceeds the merge depth; with
    ``overlap`` = 96 >> 5K that is every bit, for any decodable SNR.
    """
    n = llr_pairs.shape[0]
    block = min(block, max(n, 1))
    nb = -(-n // block)
    total = nb * block
    # Head pad: strong zero-bit evidence — consistent with the encoder's
    # all-zero start state (pre-stream steps from state 0 with zero inputs
    # emit X=Y=0).  Tail pad: ERASURES — the final encoder state is the last
    # 6 data bits, so any non-erasure tail evidence would contradict it and
    # bias the last few decoded bits.
    head = jnp.full((overlap, 2), 4.0, dtype=jnp.float32)
    tail = jnp.zeros((total - n + overlap, 2), dtype=jnp.float32)
    ext = jnp.concatenate([head, llr_pairs.astype(jnp.float32), tail])
    # block b covers stream positions [b*block - overlap, (b+1)*block + overlap)
    starts = np.arange(nb) * block
    idx = starts[:, None] + np.arange(block + 2 * overlap)[None, :]
    blocks = ext[jnp.asarray(idx)]                    # [B, L, 2]
    pairs = jnp.transpose(blocks, (1, 0, 2))          # [L, B, 2]
    decs, final = _acs_scan(pairs)
    bits = _traceback(decs, final)                    # [L, B]
    core = bits[overlap:overlap + block].T.reshape(-1)  # drop seams
    return core[:n]


def viterbi_decode_punctured(llr: jnp.ndarray, code_rate: tuple[int, int],
                             block: int = 4096) -> jnp.ndarray:
    """Punctured serial LLR stream -> decoded input bits uint8."""
    return viterbi_decode(depuncture(llr, code_rate), block=block)
