"""ITU-T J.83B 64-QAM cable transmitter model — qam-blade.py re-expressed.

Argv surface mirrors /root/reference/qam-blade.py:24-34
(``input_file [output_file]``); all chain parameters are fixed exactly as the
reference fixes them (qam-blade.py:36-44): 5.056941 Mbaud, interp 2,
(I=128, J=4), Control_Word 6, 100-tap RRC alpha 0.18.  SDR output is out of
scope; output_file receives gr_complex IQ at 10.113882 Msps.
"""

from __future__ import annotations

import sys

import numpy as np

from dtv_utils_tpu.core.config import J83bConfig


def cli(argv: list[str]) -> int:
    if len(argv) not in (1, 2):
        sys.stderr.write("Usage: qam-mod input_file [output_file]\n")
        return 1
    infile = argv[0]
    outfile = argv[1] if len(argv) == 2 else None

    from dtv_utils_tpu.models.dvbt import load_ts_cycled
    from dtv_utils_tpu.tx import j83b as txq

    cfg = J83bConfig()
    blk = txq.PACKETS_PER_SUPERBLOCK * 188
    ts = load_ts_cycled(infile, blk, None)
    import time
    from dtv_utils_tpu.utils.metrics import Metrics
    t0 = time.perf_counter()
    iq, _state = txq.modulate_stream(cfg, ts)
    dt = time.perf_counter() - t0
    m = Metrics()
    m.emit("j83b_mod_throughput", round(iq.size / dt / 1e6, 3),
           unit="Msamples/s", ts_bytes=int(ts.size), iq_samples=int(iq.size))
    m.emit("j83b_sample_rate", round(float(cfg.sample_rate) / 1e6, 6),
           unit="Msps")
    if outfile:
        iq.astype(np.complex64).tofile(outfile)
    return 0
