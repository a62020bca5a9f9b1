"""DVB-T modulator tests: vectorized JAX chain vs. independent serial oracle.

The oracle (dvbt_serial_ref.SerialDvbt) re-implements every stage the way the
reference's C/GNU Radio blocks do — LFSRs, delay-line deques, per-bit loops —
so a match means the static-gather / bit-matmul formulation reproduces the
stream semantics exactly, including carry-state across superframe boundaries.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dtv_utils_tpu.core import cplx
from dtv_utils_tpu.core.config import (Constellation, CodeRate, DvbtConfig,
                                       GuardInterval, TransmissionMode)
from dtv_utils_tpu.ops.rs import DVBT_RS
from dtv_utils_tpu.ops.interleave import (forney_carry_len,
                                          forney_gather_indices)
from dtv_utils_tpu.tx import dvbt as txd
from dtv_utils_tpu.tx import dvbt_tables as T

from tests.dvbt_serial_ref import SerialDvbt

CFG_MIN = DvbtConfig(mode=TransmissionMode.M2K, bandwidth_mhz=6,
                     constellation=Constellation.QPSK,
                     code_rate=CodeRate.R1_2, guard=GuardInterval.G1_4)


def test_rs_matmul_matches_lfsr():
    rng = np.random.default_rng(0)
    msgs = rng.integers(0, 256, size=(32, 188), dtype=np.uint8)
    enc = DVBT_RS()
    got = np.asarray(enc.encode_bytes(jnp.asarray(msgs)))
    want = enc.encode_bytes_ref(msgs)
    np.testing.assert_array_equal(got, want)


def test_forney_matches_deque():
    from collections import deque
    I, M = 12, 17
    rng = np.random.default_rng(1)
    stream = rng.integers(0, 256, size=(3, 24 * 204), dtype=np.uint8)
    idx = jnp.asarray(forney_gather_indices(I, M, stream.shape[1]))
    # serial
    branches = [deque([0] * (b * M)) for b in range(I)]
    want = np.empty_like(stream)
    cnt = 0
    for blk in range(3):
        for i, byte in enumerate(stream[blk]):
            b = cnt % I
            if b == 0:
                want[blk, i] = byte
            else:
                branches[b].append(int(byte))
                want[blk, i] = branches[b].popleft()
            cnt += 1
    # vectorized with carry
    carry = jnp.zeros(forney_carry_len(I, M), jnp.uint8)
    for blk in range(3):
        ext = jnp.concatenate([carry, jnp.asarray(stream[blk])])
        got = ext[idx]
        carry = ext[-forney_carry_len(I, M):]
        np.testing.assert_array_equal(np.asarray(got), want[blk])


@pytest.mark.parametrize("mode", [TransmissionMode.M2K, TransmissionMode.M8K])
def test_tables_build_and_selfcheck(mode):
    # carrier_plan asserts data-cell budget == 1512/6048 for all 4 phases,
    # cross-validating continual-pilot & TPS carrier lists
    for cons in Constellation:
        cfg = DvbtConfig(mode=mode, constellation=cons)
        plan = T.carrier_plan(cfg)
        assert plan.n_data == mode.data_carriers
    h = T.symbol_interleaver_perm(mode)
    assert len(np.unique(h)) == mode.data_carriers


def test_constellation_power():
    for cons, norm in [(Constellation.QPSK, 2.0), (Constellation.QAM16, 10.0),
                       (Constellation.QAM64, 42.0)]:
        lut = T.constellation_lut(cons)
        assert len(lut) == 1 << cons.bits_per_symbol
        np.testing.assert_allclose(np.mean(np.abs(lut) ** 2), 1.0, rtol=1e-6)
        assert len(np.unique(lut)) == len(lut)


def test_chain_matches_serial_reference_two_superframes():
    cfg = CFG_MIN
    rng = np.random.default_rng(42)
    blk = cfg.ts_bytes_per_superframe
    ts = rng.integers(0, 256, size=2 * blk, dtype=np.uint8)
    ts[::188] = 0x47  # sync bytes

    serial = SerialDvbt(cfg)
    state = txd.init_state(cfg)
    enc = jax.jit(txd.encode_to_carriers, static_argnums=0)
    for i in range(2):
        want = serial.encode_to_carriers(ts[i * blk:(i + 1) * blk])
        got, state = enc(cfg, jnp.asarray(ts[i * blk:(i + 1) * blk]), state)
        np.testing.assert_array_equal(cplx.to_np(got), want,
                                      err_msg=f"superframe {i}")


def test_iq_output_properties():
    cfg = CFG_MIN
    rng = np.random.default_rng(7)
    ts = rng.integers(0, 256, size=cfg.ts_bytes_per_superframe,
                      dtype=np.uint8)
    ts[::188] = 0x47
    iq, state = txd.modulate_stream(cfg, ts)
    assert iq.shape == (cfg.samples_per_superframe,)
    assert iq.dtype == np.complex64
    # cyclic prefix property: first gi samples == last gi samples of symbol
    gi, fft = cfg.guard_samples, cfg.fft_size
    sym = iq[:gi + fft]
    np.testing.assert_allclose(sym[:gi], sym[-gi:], rtol=0, atol=1e-6)
    # OFDM signal statistics: PAPR in the plausible broadcast window.
    # Skip the startup transient (zero-filled interleaver delay lines make
    # the first symbols' spectra nearly constant → impulse-like, exactly as
    # a cold GNU Radio chain behaves).
    p = np.abs(iq[16 * cfg.symbol_samples:]) ** 2
    papr_db = 10 * np.log10(p.max() / p.mean())
    assert 8.0 < papr_db < 14.0, papr_db
    # state advanced: 2k QPSK 1/2 superframe = 252 packets → phase 4
    assert int(state.packet_phase) == 252 % 8


def test_iq_matches_serial_reference():
    cfg = CFG_MIN
    rng = np.random.default_rng(3)
    ts = rng.integers(0, 256, size=cfg.ts_bytes_per_superframe,
                      dtype=np.uint8)
    ts[::188] = 0x47
    want = SerialDvbt(cfg).modulate(ts)
    got, _ = txd.modulate_stream(cfg, ts)
    # FFT implementations differ (single vs double precision path);
    # require agreement far below any receiver-visible level.
    err = np.abs(got - want)
    scale = np.sqrt(np.mean(np.abs(want) ** 2))
    assert err.max() / scale < 1e-3
