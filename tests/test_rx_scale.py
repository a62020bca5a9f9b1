"""Receiver validation at the flagship operating points (VERDICT r3 #5):
the BBC 32K 256QAM 202-FEC-block mux decoded end-to-end, and DVB-T 64QAM
7/8 through AWGN near its QEF SNR — soft demap and frame disassembly
proven where they are hardest, not only on toy configs.
"""

import numpy as np

from dtv_utils_tpu.core.config import (CodeRate, Constellation, DvbtConfig,
                                       GuardInterval, TransmissionMode)
from dtv_utils_tpu.models.dvbt2 import PROFILES
from dtv_utils_tpu.rx import dvbt as rxd
from dtv_utils_tpu.rx import dvbt2 as rx2
from dtv_utils_tpu.tx import dvbt as txd
from dtv_utils_tpu.tx import dvbt2 as tx2


def test_dvbt2_bbc_32k_roundtrip():
    """One full BBC-profile T2 frame (32K extended, 256QAM rotated, rate
    2/3, 202 FEC blocks, 3 TI blocks, PP7 — README:149-151): exact TS
    back out, every FEC/CRC instrument green, L1 parsed.  This is the
    frame-assembly/interleaving path at production scale (~2M cells)."""
    cfg = PROFILES["bbc"]
    rng = np.random.default_rng(3)
    ts = rng.integers(0, 256, cfg.payload_bytes_per_frame).astype(np.uint8)
    ts[0::188] = 0x47
    iq, _ = tx2.modulate_stream(cfg, ts)
    res = rx2.demodulate_stream(cfg, iq)
    n = len(res.ts)
    assert n > 0
    np.testing.assert_array_equal(res.ts, ts[:n])
    assert res.p1_detected
    assert res.ldpc_ok.all() and res.bch_ok.all() and res.bb_crc_ok.all()
    assert res.sync_crc_ok
    assert res.l1_pre["crc_ok"] and res.l1_post["crc_ok"]
    assert res.l1_pre["pilot_pattern"] == cfg.pilot_pattern.number
    assert res.l1_post["plp_mod"] == 3           # 256QAM
    assert res.l1_post["plp_num_blocks_max"] == 202


def test_dvbt_awgn_64qam_78():
    """64QAM 7/8 at 20.0 dB SNR (EN 300 744's Gaussian-channel QEF point
    for this mode is ~20.1 dB): the high-order soft demap LLR scaling and
    the heavily punctured Viterbi must still deliver an exact TS."""
    cfg = DvbtConfig(mode=TransmissionMode.M2K, bandwidth_mhz=8,
                     constellation=Constellation.QAM64,
                     code_rate=CodeRate.R7_8, guard=GuardInterval.G1_32)
    rng0 = np.random.default_rng(7)
    ts = rng0.integers(0, 256,
                       cfg.ts_bytes_per_superframe * 2).astype(np.uint8)
    ts.reshape(-1, 188)[:, 0] = 0x47
    iq, _ = txd.modulate_stream(cfg, ts)
    rng = np.random.default_rng(11)
    sig_p = np.mean(np.abs(iq) ** 2)
    noise_p = sig_p / 10 ** (20.0 / 10)
    noise = (rng.normal(0, np.sqrt(noise_p / 2), len(iq))
             + 1j * rng.normal(0, np.sqrt(noise_p / 2), len(iq))
             ).astype(np.complex64)
    res = rxd.demodulate_stream(cfg, iq + noise)
    n = len(res.ts)
    assert n > 0
    np.testing.assert_array_equal(res.ts, ts[:n])
    assert res.rs_ok.all()
    assert res.tps["all_bch_ok"]


def test_dvbt2_bbc_32k_awgn():
    """VERDICT r4 #5: the BBC flagship frame through AWGN at its operating
    region.  32K 256QAM rotated rate 2/3 exercises the max-log LLR path
    where it is hardest (rotated-constellation 2D demap at 8 bits/cell);
    20 dB is ~2 dB above the DVB-T2 Gaussian-channel C/N for 256QAM 2/3
    (~18 dB); the margin covers the stand-in LDPC table, whose random IRA
    degree profile has a slightly worse waterfall than the annex
    density-evolution design (at 19 dB / 30 iters, 100 of 1.08M bytes
    missed — right on the stand-in code's cliff edge).  Exact TS required
    — min-sum LDPC + BCH must clean every block."""
    cfg = PROFILES["bbc"]
    rng0 = np.random.default_rng(13)
    ts = rng0.integers(0, 256, cfg.payload_bytes_per_frame).astype(np.uint8)
    ts[0::188] = 0x47
    iq, _ = tx2.modulate_stream(cfg, ts)
    rng = np.random.default_rng(17)
    sig_p = np.mean(np.abs(iq) ** 2)
    noise_p = sig_p / 10 ** (20.0 / 10)
    noise = (rng.normal(0, np.sqrt(noise_p / 2), len(iq))
             + 1j * rng.normal(0, np.sqrt(noise_p / 2), len(iq))
             ).astype(np.complex64)
    res = rx2.demodulate_stream(cfg, iq + noise, soft=True,
                                iterations=50)
    n = len(res.ts)
    assert n > 0
    np.testing.assert_array_equal(res.ts, ts[:n])
    # QEF is defined POST-BCH (as in real T2 receivers): every BCH block
    # and BB CRC must be clean and the TS exact.  A few of the 202 LDPC
    # blocks stop short of zero-syndrome (measured: 11/202 at 20 dB / 50
    # iters — the random stand-in IRA table lacks the annex code's cycle
    # structure, giving min-sum a small error floor that BCH exists to
    # mop up; every residue is within BCH's t).  Require >=90% converged
    # so a real LDPC regression (which decodes ~0%) still fails loudly.
    assert res.bch_ok.all() and res.bb_crc_ok.all()
    assert res.sync_crc_ok
    assert res.ldpc_ok.mean() >= 0.90


def test_dvbt2_acquisition_from_mid_stream_offset():
    """VERDICT r4 #5: non-block-aligned input.  The capture starts 12345
    samples into garbage (noise), then the real frame; ``acquire=True``
    must find the P1 by guard correlation and decode the exact TS."""
    from dtv_utils_tpu.core.config import Dvbt2Config
    cfg = Dvbt2Config(fec_blocks=3, ti_blocks=1, data_symbols=40)
    rng = np.random.default_rng(23)
    ts = rng.integers(0, 256, cfg.payload_bytes_per_frame).astype(np.uint8)
    ts[0::188] = 0x47
    iq, _ = tx2.modulate_stream(cfg, ts)
    sig = np.sqrt(np.mean(np.abs(iq) ** 2) / 2)
    lead = (rng.normal(0, sig, 12345)
            + 1j * rng.normal(0, sig, 12345)).astype(np.complex64)
    res = rx2.demodulate_stream(cfg, np.concatenate([lead, iq]),
                                acquire=True)
    n = len(res.ts)
    assert n > 0
    np.testing.assert_array_equal(res.ts, ts[:n])
    assert res.ldpc_ok.all() and res.bch_ok.all() and res.sync_crc_ok
