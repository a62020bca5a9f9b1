"""Min-sum LDPC decoder tests (ops/ldpc_decode.py) against the tx encoder.

Encoder and decoder share the accumulator tables (tx/dvbt2_tables), so
these tests hold for the structure-exact stand-in AND for real annex data
dropped into dtv_utils_tpu/data/t2/.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from dtv_utils_tpu.core.config import Dvbt2Config, T2CodeRate, T2FrameSize
from dtv_utils_tpu.ops import ldpc_decode as LD
from dtv_utils_tpu.tx import dvbt2 as TX


def _codewords(cfg, n, seed=0):
    rng = np.random.default_rng(seed)
    bb = rng.integers(0, 2, (n, cfg.kbch)).astype(np.uint8)
    return np.asarray(TX.fec_encode(cfg, jnp.asarray(bb)))


def test_syndrome_zero_on_codewords():
    for kw in (dict(), dict(code_rate=T2CodeRate.R3_4),
               dict(frame_size=T2FrameSize.SHORT)):
        cfg = Dvbt2Config(fec_blocks=2, ti_blocks=1, **kw)
        fec = _codewords(cfg, 2)
        syn = np.asarray(LD.syndrome(cfg, jnp.asarray(fec)))
        assert (syn == 0).all()


def test_syndrome_flags_bit_errors():
    cfg = Dvbt2Config(fec_blocks=2, ti_blocks=1)
    fec = _codewords(cfg, 1).copy()
    fec[0, 1234] ^= 1
    syn = np.asarray(LD.syndrome(cfg, jnp.asarray(fec)))
    assert syn.sum() > 0


def test_minsum_corrects_awgn():
    """Rate 2/3 64800 at 2.5 dB Es/N0 (~3% raw BER) must decode exactly."""
    cfg = Dvbt2Config(fec_blocks=4, ti_blocks=1)
    fec = _codewords(cfg, 4, seed=1)
    rng = np.random.default_rng(2)
    x = 1.0 - 2.0 * fec.astype(np.float32)
    sigma = np.sqrt(1 / (2 * 10 ** (2.5 / 10)))
    y = x + rng.normal(0, sigma, x.shape).astype(np.float32)
    assert ((y < 0) != (fec == 1)).mean() > 0.02     # channel genuinely bad
    hard, ok = LD.jit_decode(cfg, 30)(jnp.asarray(2 * y / sigma ** 2))
    assert np.asarray(ok).all()
    np.testing.assert_array_equal(np.asarray(hard), fec)


def test_minsum_flags_undecodable():
    cfg = Dvbt2Config(fec_blocks=2, ti_blocks=1)
    rng = np.random.default_rng(3)
    llr = rng.normal(0, 1, (2, cfg.nldpc)).astype(np.float32)  # pure noise
    _, ok = LD.jit_decode(cfg, 10)(jnp.asarray(llr))
    assert not np.asarray(ok).any()
