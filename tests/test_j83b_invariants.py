"""Structural invariant tests for the J.83B PARITY-RISK constants.

The serial oracle (j83b_serial_ref.py) shares constant tables with the
device path, so it proves vectorization only.  Each test here checks a
constant against a property the SCTE 07 standard *forces*, independent of
any shared table — so a wrong recalled constant fails even though both
paths agree with each other.  One test per PARITY.md J83B row.
"""

from __future__ import annotations

import numpy as np
import pytest

from dtv_utils_tpu.core.galois import GF128
from dtv_utils_tpu.tx import j83b as J


# ---------------------------------------------------------------------------
# FSYNC trailer (§5.4): control-word field placement + sync autocorrelation
# ---------------------------------------------------------------------------

def test_fsync_control_word_extractable():
    """The interleaver control word (6 ⇒ I=128, J=4 per README:88-104) must
    occupy the trailing 4-bit field of the 42-bit trailer so a receiver can
    read the interleaver mode."""
    bits = J._fsync_bits()
    assert bits.shape == (42,)
    cw = int("".join(map(str, bits[-4:])), 2)
    assert cw == J.CONTROL_WORD == 6


def test_fsync_autocorrelation_peaky():
    """A frame-sync pattern must be detectable by correlation: every
    off-peak aperiodic autocorrelation magnitude stays below half the
    42-chip peak."""
    bits = J._fsync_bits()
    s = 1.0 - 2.0 * bits.astype(np.float64)
    for k in range(1, 42):
        assert abs(np.sum(s[: 42 - k] * s[k:])) < 21


# ---------------------------------------------------------------------------
# Randomizer LFSR (§5.6): the feedback polynomial must be primitive
# ---------------------------------------------------------------------------

def _lfsr_gf2_matrix() -> np.ndarray:
    """The degree-3 LFSR over GF(128) (x³ + x + α³) as a 21×21 GF(2) matrix
    acting on the 3×7-bit state — GF(128) multiplication is GF(2)-linear."""
    gf = GF128
    alpha3 = gf.pow_alpha(3)
    M = np.zeros((21, 21), dtype=np.uint8)
    # state = [s0, s1, s2] -> [mul(s2, a3) ^ s1, s0, s1]  (j83b.py:_randomizer_frame)
    for bit in range(7):
        basis = 1 << bit
        prod = int(gf.mul(basis, alpha3))
        for ob in range(7):
            if (prod >> ob) & 1:
                M[ob, 14 + bit] = 1          # s2 -> s0 via ·α³
        M[7 + bit, bit] = 1                  # s0 -> s1
        M[14 + bit, 7 + bit] = 1             # s1 -> s2
        M[bit, 7 + bit] ^= 1                 # s1 XOR into new s0
    return M


def _matpow_gf2(M: np.ndarray, e: int) -> np.ndarray:
    R = np.eye(M.shape[0], dtype=np.uint8)
    B = M.copy()
    while e:
        if e & 1:
            R = (R @ B) & 1
        B = (B @ B) & 1
        e >>= 1
    return R


def test_randomizer_polynomial_primitive():
    """SCTE 07's randomizer runs a maximal-length sequence: the state map
    must have multiplicative order 2²¹−1 = 7²·127·337 (full period), i.e.
    M^(2²¹−1) = I and M^((2²¹−1)/p) ≠ I for each prime factor p."""
    M = _lfsr_gf2_matrix()
    order = (1 << 21) - 1
    eye = np.eye(21, dtype=np.uint8)
    assert np.array_equal(_matpow_gf2(M, order), eye)
    for p in (7, 127, 337):
        assert not np.array_equal(_matpow_gf2(M, order // p), eye)


def test_randomizer_first_frame_matches_lfsr():
    """The cached per-frame sequence is the LFSR output from the all-ones
    seed (reseeded each FSYNC ⇒ identical every frame)."""
    seq = J._randomizer_frame()
    assert seq.shape == (J.FRAME_SYMBOLS,)
    assert seq[0] == 1                       # output = s2 of seed [1,1,1]
    assert np.all((seq >= 0) & (seq < 128))
    # not the all-zero trap state anywhere
    assert np.count_nonzero(seq) > J.FRAME_SYMBOLS * 0.9


# ---------------------------------------------------------------------------
# RS(128,122) (§5.3): roots + extended-symbol rule
# ---------------------------------------------------------------------------

def test_rs_codeword_roots_and_extension():
    """The (127,122) part must evaluate to 0 at α¹..α⁵ (t=3 with one
    extension), and the 128th symbol must be the GF-sum of the first 127 —
    both checked by direct polynomial evaluation over GF(128), no shared
    encoder machinery."""
    import jax.numpy as jnp
    gf = GF128
    rng = np.random.default_rng(7)
    msg = rng.integers(0, 128, size=(4, J.RS_K), dtype=np.int64)
    cw = np.asarray(J.rs_encode(jnp.asarray(msg)))
    assert cw.shape == (4, 128)
    assert np.array_equal(cw[:, : J.RS_K], msg)
    for row in cw:
        body = row[:127]                     # c(x), degree 126, c[0] = x^126
        for j in range(1, 6):
            acc = 0
            for c in body:                   # Horner at α^j
                acc = int(gf.mul(acc, gf.pow_alpha(j))) ^ int(c)
            assert acc == 0, f"not a root: alpha^{j}"
        ext = 0
        for c in body:
            ext ^= int(c)
        assert ext == row[127]


# ---------------------------------------------------------------------------
# TCM (§5.5): rate closure + generator taps + puncture pattern
# ---------------------------------------------------------------------------

def test_tcm_rate_closure_28_to_30():
    """28 TS bits must become exactly 5 six-bit symbols (30 bits): the
    14/15 TCM rate that closes the 26.970352 Mbps identity."""
    import jax.numpy as jnp
    bits = jnp.asarray(np.random.default_rng(1).integers(
        0, 2, size=28 * 12, dtype=np.uint8))
    st = J.init_state()
    words, *_ = J.trellis_encode(bits, st.conv_a, st.conv_b, st.diff_state)
    assert words.shape == (12 * 5,)
    assert int(np.asarray(words).max()) < 64
    # puncture arithmetic: 4 input steps -> 8 coded -> 5 kept
    assert sum(J.PUNCT_X) + sum(J.PUNCT_Y) == 5
    assert len(J.PUNCT_X) == len(J.PUNCT_Y) == 4


def test_conv45_impulse_response_is_25_37_octal():
    """Drive the unpunctured generators with an impulse via a bit-serial
    reference and compare conv_encode_45 against it — verifies both the
    (25, 37) octal taps and the X:1001/Y:1110 puncture independent of the
    vectorized formulation."""
    import jax.numpy as jnp
    rng = np.random.default_rng(3)
    bits = rng.integers(0, 2, size=64, dtype=np.uint8)

    # bit-serial reference: 4-bit shift register, taps straight from octal
    g1, g2 = 0o25, 0o37
    reg = 0
    xy = []
    for b in bits:
        reg = ((reg << 1) | int(b)) & 0x1F   # K=5: current bit + 4 memory
        x = bin(reg & g1).count("1") & 1
        y = bin(reg & g2).count("1") & 1
        xy.extend([x, y])
    keep = []
    for i in range(len(bits) // 4):
        for j in range(4):
            if J.PUNCT_X[j]:
                keep.append(xy[8 * i + 2 * j])
            if J.PUNCT_Y[j]:
                keep.append(xy[8 * i + 2 * j + 1])

    st = J.init_state()
    out, _ = J.conv_encode_45(jnp.asarray(bits), st.conv_a)
    assert np.array_equal(np.asarray(out), np.asarray(keep, dtype=np.uint8))


# ---------------------------------------------------------------------------
# Differential precoder + constellation: 90° rotational invariance
# ---------------------------------------------------------------------------

def _quadrant_advance_map() -> dict[int, int] | None:
    """If the reference constellation (the qam-blade.py:57 literal — exact,
    no recall risk) is 90°-rotation symmetric under the (W,Z) quadrant
    bits, return the word mapping rot(word) with C[rot(w)] = j·C[w]."""
    C = J.CONSTELLATION_64
    mapping = {}
    for w in range(64):
        target = 1j * C[w]
        hits = np.flatnonzero(np.isclose(C, target))
        if hits.size != 1:
            return None
        mapping[w] = int(hits[0])
    return mapping


def test_constellation_is_90deg_symmetric():
    """Every point rotated by 90° must land exactly on another point
    (precondition for rotationally-invariant TCM)."""
    assert _quadrant_advance_map() is not None


def test_precoder_90deg_invariance():
    """System-level invariance: encoding the same bits from a precoder
    state advanced by one quadrant must emit the SAME cells rotated by
    exactly 90° — i.e. a receiver locked 90° off still sees valid
    differential data.  Checked through the real trellis_encode +
    constellation map."""
    import jax.numpy as jnp
    rng = np.random.default_rng(11)
    bits = jnp.asarray(rng.integers(0, 2, size=28 * 40, dtype=np.uint8))
    st = J.init_state()

    def run(diff_state):
        words, *_ = J.trellis_encode(bits, st.conv_a, st.conv_b, diff_state)
        return J.CONSTELLATION_64[np.asarray(words)]

    base = run(st.diff_state)                # q0 = 0  (W,Z)=(0,0)
    # advance the initial quadrant by one: gray q=1 -> (W,Z)=(0,1).
    # Multiplying a constellation point by j advances the Gray pair
    # (b3, b0) by -1 in this q convention, so a +1 quadrant offset in the
    # precoder state must rotate every emitted cell by exactly -90°.
    rot = run(jnp.asarray(np.array([0, 1], dtype=np.uint8)))
    assert np.allclose(rot, -1j * base)
    # and four quarter turns come home
    rot4 = run(jnp.asarray(np.array([0, 0], dtype=np.uint8)))
    assert np.allclose(rot4, base)


# ---------------------------------------------------------------------------
# Transport framing checksum (§5.2): structural properties
# ---------------------------------------------------------------------------

def test_framing_checksum_covers_every_payload_bit():
    """The sync-byte-replacing checksum must depend on every one of the
    187 payload bytes (a receiver regenerates it to frame-align): no
    all-zero row in the GF(2) checksum matrix, and flipping any sampled
    bit changes the emitted checksum."""
    import jax.numpy as jnp
    M = J._framing_crc_matrix()
    assert M.shape == (187 * 8, 8)
    assert np.all(M.sum(axis=1) > 0)

    pkt = np.zeros((1, 188), dtype=np.uint8)
    pkt[0, 0] = 0x47
    base = np.asarray(J.transport_framing(jnp.asarray(pkt)))[0, 0]
    for byte in (1, 94, 187):
        flipped = pkt.copy()
        flipped[0, byte] ^= 0x01
        out = np.asarray(J.transport_framing(jnp.asarray(flipped)))[0, 0]
        assert out != base, f"checksum blind to byte {byte}"
