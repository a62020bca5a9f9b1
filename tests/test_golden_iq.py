"""SNR-match against reference-chain IQ captures (SURVEY §6) — the
acquisition path for gr-dtv / gr-qam goldens, runnable the moment a
capture is installed (the blocks themselves are not in this environment;
see PARITY.md).

To certify a chain against the reference implementation, produce a capture
with the reference script reading a known TS and install it under
``tests/golden_iq/``:

  input.ts        the TS file fed to the reference script (any content;
                  long enough for >= 2 superframes / 1 T2 frame / 1 J.83B
                  superblock of payload)
  dvbt.cfile      dvbt-blade.py -m t8k -c 8 -C qam64 -r 7/8 -g 1/32
                  (gr_complex float32 file-sink output)
  dvbt2.cfile     dvbt2-blade.py (blade defaults, dvbt2-blade.py:37-60)
  j83b.cfile      qam-blade.py (fixed parameters, qam-blade.py:36-44)

Each test skips until its files exist.  Comparison: align by complex
cross-correlation over the first capture seconds, least-squares scale
match, then assert error power >= SNR_MIN_DB below signal power — float32
accumulation-order differences stay far above this bound; a wrong table
or stage ordering lands far below it.
"""

import pathlib

import numpy as np
import pytest

GOLD = pathlib.Path(__file__).parent / "golden_iq"
SNR_MIN_DB = 40.0


def _load_cfile(path: pathlib.Path) -> np.ndarray:
    raw = np.fromfile(path, dtype=np.float32)
    return raw[0::2] + 1j * raw[1::2]


def _snr_db(ours: np.ndarray, ref: np.ndarray, search: int = 200_000
            ) -> float:
    """Best-alignment SNR of ours vs ref over the overlapping run."""
    n = min(len(ours), len(ref), 1 << 20)
    a = ours[:n].astype(np.complex128)
    b = ref[: n + search].astype(np.complex128)
    # coarse alignment by FFT cross-correlation
    m = 1 << int(np.ceil(np.log2(n + search)))
    X = np.fft.fft(b, m) * np.conj(np.fft.fft(a, m))
    lag = int(np.argmax(np.abs(np.fft.ifft(X))[:search + 1]))
    ref_al = b[lag:lag + n]
    scale = np.vdot(ref_al, a) / np.vdot(ref_al, ref_al)
    err = a - scale * ref_al
    sig = np.mean(np.abs(a) ** 2)
    noise = np.mean(np.abs(err) ** 2)
    return 10 * np.log10(sig / noise) if noise > 0 else np.inf


def _input_ts() -> np.ndarray:
    if not (GOLD / "input.ts").exists():
        pytest.skip("no golden IQ captures installed (tests/golden_iq/)")
    return np.fromfile(GOLD / "input.ts", dtype=np.uint8)


def test_dvbt_golden_iq():
    if not (GOLD / "dvbt.cfile").exists():
        pytest.skip("tests/golden_iq/dvbt.cfile not installed")
    from dtv_utils_tpu.core.config import (CodeRate, Constellation,
                                           DvbtConfig, GuardInterval,
                                           TransmissionMode)
    from dtv_utils_tpu.tx.dvbt import modulate_stream

    ts = _input_ts()
    cfg = DvbtConfig(mode=TransmissionMode.M8K, bandwidth_mhz=8,
                     constellation=Constellation.QAM64,
                     code_rate=CodeRate.R7_8, guard=GuardInterval.G1_32)
    n = (len(ts) // cfg.ts_bytes_per_superframe) * cfg.ts_bytes_per_superframe
    iq, _ = modulate_stream(cfg, ts[:n])
    snr = _snr_db(iq, _load_cfile(GOLD / "dvbt.cfile"))
    assert snr >= SNR_MIN_DB, f"DVB-T golden SNR {snr:.1f} dB"


def test_dvbt2_golden_iq():
    if not (GOLD / "dvbt2.cfile").exists():
        pytest.skip("tests/golden_iq/dvbt2.cfile not installed")
    from dtv_utils_tpu.core.config import Dvbt2Config
    from dtv_utils_tpu.tx.dvbt2 import modulate_stream

    ts = _input_ts()
    cfg = Dvbt2Config()                       # blade profile
    n = (len(ts) // cfg.payload_bytes_per_frame) * cfg.payload_bytes_per_frame
    iq, _ = modulate_stream(cfg, ts[:n])
    snr = _snr_db(iq, _load_cfile(GOLD / "dvbt2.cfile"))
    assert snr >= SNR_MIN_DB, f"DVB-T2 golden SNR {snr:.1f} dB"


def test_j83b_golden_iq():
    if not (GOLD / "j83b.cfile").exists():
        pytest.skip("tests/golden_iq/j83b.cfile not installed")
    from dtv_utils_tpu.core.config import J83bConfig
    from dtv_utils_tpu.tx import j83b as txq
    from dtv_utils_tpu.tx.j83b import modulate_stream

    ts = _input_ts()
    blk = txq.PACKETS_PER_SUPERBLOCK * 188
    n = (len(ts) // blk) * blk
    iq, _ = modulate_stream(J83bConfig(), ts[:n])
    snr = _snr_db(iq, _load_cfile(GOLD / "j83b.cfile"))
    assert snr >= SNR_MIN_DB, f"J.83B golden SNR {snr:.1f} dB"
