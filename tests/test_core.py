"""Core primitives: Galois tables, GF(2) matmul RS encoding, PRBS, bit ops."""

import numpy as np
import jax.numpy as jnp
import pytest

from dtv_utils_tpu.core import bits, config, prbs
from dtv_utils_tpu.core.galois import (
    GF, GF128, GF256, gf2_matmul, gf2_poly_mod_matrix, rs_parity_bitmatrix)


class TestGF:
    def test_gf256_tables(self):
        # alpha^(q-1) == 1, log/exp are inverse
        assert GF256.exp[0] == 1
        assert GF256.exp[255 - 1] != 1  # order is exactly 255
        vals = np.arange(1, 256)
        assert np.array_equal(GF256.exp[GF256.log[vals]], vals)

    def test_mul_matches_schoolbook(self):
        rng = np.random.default_rng(0)
        a = rng.integers(0, 256, 100)
        b = rng.integers(0, 256, 100)

        def slow_mul(a, b, poly=0x11D):
            r = 0
            while b:
                if b & 1:
                    r ^= a
                b >>= 1
                a <<= 1
                if a & 0x100:
                    a ^= poly
            return r

        expect = [slow_mul(int(x), int(y)) for x, y in zip(a, b)]
        assert np.array_equal(GF256.mul(a, b), expect)

    def test_gf128_primitive(self):
        assert GF128.q == 128
        assert len(set(GF128.exp[:127].tolist())) == 127

    def test_nonprimitive_rejected(self):
        with pytest.raises(ValueError):
            GF(0x11B, 8)  # AES poly x^8+x^4+x^3+x+1 is irreducible, not primitive


class TestRS:
    def test_generator_poly_dvb(self):
        # g(x) = prod_{i=0..15} (x + alpha^i) for RS(255,239) (EN 300 744)
        g = GF256.rs_generator_poly(16)
        assert g[16] == 1 and len(g) == 17
        # every alpha^i (i<16) must be a root
        for i in range(16):
            root = GF256.pow_alpha(i)
            acc, p = 0, 1
            for c in g:
                acc ^= GF256.mul(c, p)
                p = GF256.mul(p, root)
            assert acc == 0

    def test_lfsr_encode_roots(self):
        # systematic codeword c(x) = msg(x)*x^16 + parity(x) must have the
        # generator roots as roots
        g = GF256.rs_generator_poly(16)
        rng = np.random.default_rng(1)
        msg = rng.integers(0, 256, 239)
        par = GF256.rs_encode_ref(msg, g)
        cw = np.concatenate([msg, par])  # 255 symbols, highest degree first
        for i in range(16):
            root = GF256.pow_alpha(i)
            acc = 0
            for c in cw:
                acc = GF256.mul(acc, root) ^ int(c)
            assert acc == 0

    def test_bitmatrix_matches_lfsr(self):
        # shortened RS(204,188): encode 188 bytes with 51 virtual zeros --
        # shortening just drops leading zero message symbols, so the
        # bit-matrix is built directly for k=188
        g = GF256.rs_generator_poly(16)
        M = rs_parity_bitmatrix(GF256, 188, g)
        assert M.shape == (1504, 128)
        rng = np.random.default_rng(2)
        pkts = rng.integers(0, 256, (4, 188))
        expect = GF256.rs_encode_ref(pkts, g)
        msg_bits = bits.np_bytes_to_bits(pkts)
        par_bits = np.asarray(gf2_matmul(jnp.asarray(msg_bits), jnp.asarray(M)))
        par = bits.np_bits_to_bytes(par_bits)
        assert np.array_equal(par, expect)

    def test_shortening_equivalence(self):
        # parity(0^51 || msg) with k=239 matrix == parity(msg) with k=188
        g = GF256.rs_generator_poly(16)
        rng = np.random.default_rng(3)
        msg = rng.integers(0, 256, 188)
        full = np.concatenate([np.zeros(51, dtype=np.int64), msg])
        assert np.array_equal(GF256.rs_encode_ref(full, g),
                              GF256.rs_encode_ref(msg, g))


class TestPolyMod:
    def test_crc8_matrix(self):
        # x^8+x^2+x+1 (ATM HEC) vs direct bitwise division
        g = np.array([1, 1, 1, 0, 0, 0, 0, 0, 1], dtype=np.uint8)
        M = gf2_poly_mod_matrix(g, 32)
        rng = np.random.default_rng(4)
        data = rng.integers(0, 2, 32).astype(np.uint8)

        def crc_ref(d):
            reg = list(d) + [0] * 8
            for i in range(len(d)):
                if reg[i]:
                    for j, c in enumerate(g[::-1]):  # g desc: x^8..x^0
                        reg[i + j] ^= c
            return np.array(reg[-8:], dtype=np.uint8)

        expect = crc_ref(data)
        got = (data @ M) % 2
        assert np.array_equal(got, expect)


class TestPrbs:
    def test_dispersal_first_bits(self):
        # EN 300 744 §4.3.1: the first output bits of the dispersal PRBS
        # are 0000 0011 ... (first byte 0x03)
        b = prbs.dvb_dispersal_prbs_bytes(4)
        assert b[0] == 0x03

    def test_dispersal_mask_layout(self):
        mask, is_sync = prbs.dvbt_dispersal_mask()
        assert mask.shape == (1504,)
        assert mask[0] == 0xFF            # inverted sync
        assert (0x47 ^ mask[0]) == 0xB8
        for p in range(1, 8):
            assert mask[p * 188] == 0     # sync bytes untouched
        assert mask[1] == 0x03            # PRBS starts right after sync

    def test_pilot_prbs(self):
        # w starts all-ones-register → first outputs are 1s; known property:
        # first 11 outputs are 1 (register drains), then structure kicks in
        w = prbs.dvbt_pilot_prbs(8192)
        assert w[:11].tolist() == [1] * 11
        assert set(np.unique(w).tolist()) <= {0, 1}
        # period of x^11 lfsr is 2047
        assert np.array_equal(w[:2047], w[2047:2 * 2047])


class TestBits:
    def test_roundtrip(self):
        rng = np.random.default_rng(5)
        x = rng.integers(0, 256, (3, 17), dtype=np.uint8)
        b = bits.bytes_to_bits(jnp.asarray(x))
        assert np.array_equal(bits.np_bytes_to_bits(x), np.asarray(b))
        back = bits.bits_to_bytes(b)
        assert np.array_equal(np.asarray(back), x)

    def test_words(self):
        b = jnp.asarray(np.array([1, 0, 1, 1, 0, 1], dtype=np.uint8))
        w = bits.bits_to_words(b, 3)
        assert w.tolist() == [0b101, 0b101]
        assert np.array_equal(np.asarray(bits.words_to_bits(w, 3)),
                              np.asarray(b))


class TestConfig:
    def test_dvbt_oracle_rates(self):
        # exact rational TS rates must reproduce README:233-281 oracles
        c = config.DvbtConfig(config.TransmissionMode.M8K, 8,
                              config.Constellation.QAM64,
                              config.CodeRate.R7_8,
                              config.GuardInterval.G1_32)
        assert abs(float(c.useful_bitrate) - 31668449.197861) < 1e-4
        c2 = config.DvbtConfig(config.TransmissionMode.M2K, 6,
                               config.Constellation.QPSK,
                               config.CodeRate.R1_2,
                               config.GuardInterval.G1_4)
        assert abs(float(c2.useful_bitrate) - 6 * 4976470.588235 / 8) < 1e-3

    def test_superframe_budgets_integral(self):
        # every (mode, constellation, rate) combo must give integral packets
        for mode in config.TransmissionMode:
            for cons in config.Constellation:
                for cr in config.CodeRate:
                    c = config.DvbtConfig(mode, 8, cons, cr,
                                          config.GuardInterval.G1_4)
                    assert c.ts_bytes_per_superframe % 188 == 0
