"""DVB-T2 and J.83B receiver integration tests: modulate → demodulate →
exact TS recovery, with every receiver validation instrument green.

These are the software form of the reference's over-the-air receiver
validation (/root/reference/README:26-28).
"""

import numpy as np
import pytest

from dtv_utils_tpu.core.config import Dvbt2Config, J83bConfig, T2FrameSize
from dtv_utils_tpu.tx import dvbt2 as tx2
from dtv_utils_tpu.tx import j83b as txq
from dtv_utils_tpu.rx import dvbt2 as rx2
from dtv_utils_tpu.rx import j83b as rxq


def _t2_ts(cfg, n_frames, seed=3):
    rng = np.random.default_rng(seed)
    ts = rng.integers(0, 256, cfg.payload_bytes_per_frame * n_frames
                      ).astype(np.uint8)
    ts[0::188] = 0x47
    return ts


def test_dvbt2_roundtrip():
    cfg = Dvbt2Config(fec_blocks=3, ti_blocks=2)
    ts = _t2_ts(cfg, 2)
    iq, _ = tx2.modulate_stream(cfg, ts)
    res = rx2.demodulate_stream(cfg, iq)
    np.testing.assert_array_equal(res.ts, ts[:len(res.ts)])
    assert res.p1_detected
    # S2 field 1 encodes the FFT size (4K -> code 2), mixed bit 0
    assert (res.s1, res.s2) == (0, 2 << 1)
    assert res.ldpc_ok.all() and res.bch_ok.all() and res.bb_crc_ok.all()
    assert res.sync_crc_ok
    # L1 receiver parse matches the transmit config
    assert res.l1_pre["crc_ok"] and res.l1_post["crc_ok"]
    assert res.l1_pre["pilot_pattern"] == cfg.pilot_pattern.number
    assert res.l1_pre["num_data_symbols"] == cfg.data_symbols
    assert res.l1_post["plp_mod"] == 2          # 64QAM
    assert res.l1_post["plp_cod"] == 2          # rate 2/3
    assert res.l1_post["plp_rotation"] == 1
    assert res.l1_post["plp_num_blocks_max"] == cfg.fec_blocks


def test_dvbt2_roundtrip_papr_tr():
    """Tone-reservation PAPR correction must be receiver-invisible: the
    correction energy lands only on reserved carriers the receiver skips."""
    cfg = Dvbt2Config(fec_blocks=3, ti_blocks=2, papr_tr=True)
    ts = _t2_ts(cfg, 1, seed=4)
    iq, _ = tx2.modulate_stream(cfg, ts)
    res = rx2.demodulate_stream(cfg, iq)
    np.testing.assert_array_equal(res.ts, ts[:len(res.ts)])
    assert res.ldpc_ok.all() and res.bch_ok.all() and res.sync_crc_ok


def test_dvbt2_roundtrip_short_frames():
    cfg = Dvbt2Config(frame_size=T2FrameSize.SHORT, fec_blocks=2,
                      ti_blocks=1)
    ts = _t2_ts(cfg, 1, seed=5)
    iq, _ = tx2.modulate_stream(cfg, ts)
    res = rx2.demodulate_stream(cfg, iq)
    np.testing.assert_array_equal(res.ts, ts[:len(res.ts)])
    assert res.ldpc_ok.all() and res.bch_ok.all() and res.sync_crc_ok


def test_dvbt2_soft_decode_awgn():
    """64QAM rotated rate-2/3 at 14.5 dB SNR (the T2 operating region for
    this mode): max-log soft demap + min-sum LDPC must deliver an exact
    TS; the hard path cannot operate here."""
    cfg = Dvbt2Config(fec_blocks=3, ti_blocks=2)
    ts = _t2_ts(cfg, 1, seed=6)
    iq, _ = tx2.modulate_stream(cfg, ts)
    rng = np.random.default_rng(7)
    sig = np.mean(np.abs(iq) ** 2)
    npow = sig / 10 ** (14.5 / 10)
    noise = (rng.normal(0, np.sqrt(npow / 2), len(iq))
             + 1j * rng.normal(0, np.sqrt(npow / 2), len(iq))
             ).astype(np.complex64)
    res = rx2.demodulate_stream(cfg, iq + noise, soft=True)
    np.testing.assert_array_equal(res.ts, ts[:len(res.ts)])
    assert res.ldpc_ok.all() and res.bch_ok.all() and res.sync_crc_ok


def test_p1_s1s2_decode_all_fft_codes():
    from dtv_utils_tpu.tx import t2_p1
    for s1, s2 in [(0, 0), (0, 2), (0, 10), (1, 5), (7, 15)]:
        p1 = t2_p1.p1_time(s1, s2)
        got = rx2.decode_s1_s2(p1)
        assert got == (s1, s2), (s1, s2, got)


@pytest.fixture(scope="module")
def j83b_loop():
    cfg = J83bConfig()
    rng = np.random.default_rng(5)
    ts = rng.integers(0, 256, txq.PACKETS_PER_SUPERBLOCK * 188
                      ).astype(np.uint8)
    ts.reshape(-1, 188)[:, 0] = 0x47
    iq, _ = txq.modulate_stream(cfg, ts)
    return cfg, ts, iq


def test_j83b_roundtrip(j83b_loop):
    cfg, ts, iq = j83b_loop
    res = rxq.demodulate_stream(cfg, iq)
    n = len(res.ts)
    assert n > 0 and n % 188 == 0
    np.testing.assert_array_equal(res.ts, ts[:n])
    assert res.fsync_ok
    assert res.control_word == txq.CONTROL_WORD   # (I=128, J=4) signalled
    assert res.rs_ok.all() and res.rs_errors.sum() == 0
    assert res.ext_ok.all()
    assert res.checksum_ok.all()


def test_j83b_roundtrip_awgn(j83b_loop):
    """64-QAM cable at 27 dB SNR (the J.83B operating region): the TCM +
    RS layers must deliver an exact TS."""
    cfg, ts, iq = j83b_loop
    rng = np.random.default_rng(9)
    sig = np.mean(np.abs(iq) ** 2)
    npow = sig / 10 ** (27.0 / 10)
    noise = (rng.normal(0, np.sqrt(npow / 2), len(iq))
             + 1j * rng.normal(0, np.sqrt(npow / 2), len(iq))
             ).astype(np.complex64)
    res = rxq.demodulate_stream(cfg, iq + noise)
    n = len(res.ts)
    np.testing.assert_array_equal(res.ts, ts[:n])
    assert res.rs_ok.all() and res.checksum_ok.all()


def test_j83b_matched_filter_isi():
    """The combined TX-interpolator + matched-filter response must be
    Nyquist to well under half a decision distance."""
    from dtv_utils_tpu.rx.j83b import _mf_plan
    mp = _mf_plan(J83bConfig())
    assert mp["off"] == 0
    assert mp["isi"] < 0.02        # worst-case ISI sum, relative to peak
