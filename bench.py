"""Benchmarks for all four BASELINE.md north-star metrics, one JSON line
each (emitted through utils.metrics so the JSON/human duality is the same
as the model CLIs):

  1. dvbt_8k_qam64_r78_iq_throughput   (the headline, printed first)
  2. dvbt2_32k_bbc_iq_throughput       (BBC 40.2 Mbps mux, README:149-151)
  3. j83b_qam64_iq_throughput
  4. papr_scan_throughput              (GSa/s of the pass-1 power scan)

Measurement honesty (round 3 rewrite — the round-2 numbers were enqueue
rates, not throughput):

  * The axon TPU tunnel backend is LAZY: ``jax.block_until_ready`` returns
    immediately and execution happens when a value is fetched.  It also
    MEMOIZES dispatches (same executable + same input buffers => cached
    result).  Naive loops measured "17 TB/s HBM bandwidth" — 20x the
    physical roofline.  All timing therefore goes through
    utils/timing.timed_stream: a distinct input buffer for EVERY dispatch
    and a scalar probe chain fetched inside the timed region, so the wall
    time data-depends on every timed kernel.
  * Running the 32K DVB-T2 chain degrades the backend session itself
    (afterwards even a 1-output 128 MiB sum dispatch is ~58x slower, and
    multi-output dispatches ~10000x; jax.clear_caches does not recover
    it).  Each benchmark therefore runs in its OWN subprocess so every
    metric reflects a clean backend session.

Serving shape for the modulators: N independent muxes (each a serial
state-threaded stream) round-robin on one chip — dispatches of independent
streams pipeline on the device, so this measures chip saturation, not
single-stream latency.  States thread serially and every dispatch consumes
a fresh buffer, so no dispatch can be served from the memoization cache.

vs_baseline for the modulators is the reference's implied real-time floor:
the bladeRF sample rate each chain must sustain (dvbt-blade.py:146 →
9.142857 Msps for 8 MHz DVB-T/T2; qam-blade.py:36 → 10.113882 Msps for
J.83B).  Values >> 1 mean one chip can modulate that many simultaneous
full-rate muxes.  For papr, vs_baseline is vs 1 GSa/s (papr.c publishes no
number; its two-pass CPU loop is far below that).
"""

from __future__ import annotations

import subprocess
import sys

import numpy as np

DVBT_FLOOR_MSPS = 8e6 * 8 / 7 / 1e6      # 9.142857 Msps (dvbt-blade.py:146)
J83B_FLOOR_MSPS = 5.056941 * 2           # 10.113882 Msps (qam-blade.py:36)


def _ts_buffers(rng, block_bytes: int, n: int):
    import jax
    import jax.numpy as jnp
    bufs = []
    for _ in range(n):
        ts = rng.integers(0, 256, size=block_bytes, dtype=np.uint8)
        ts[::188] = 0x47
        bufs.append(jax.device_put(jnp.asarray(ts)))
    return bufs


def bench_dvbt(metrics) -> None:
    import jax
    from dtv_utils_tpu.core.config import (CodeRate, Constellation,
                                           DvbtConfig, GuardInterval,
                                           TransmissionMode)
    from dtv_utils_tpu.tx import dvbt as txd
    from dtv_utils_tpu.utils.timing import timed_stream

    cfg = DvbtConfig(mode=TransmissionMode.M8K, bandwidth_mhz=8,
                     constellation=Constellation.QAM64,
                     code_rate=CodeRate.R7_8, guard=GuardInterval.G1_32)
    fn = jax.jit(lambda ts, st: txd.modulate_superframe(cfg, ts, st),
                 donate_argnums=(1,))
    n_streams, n_rounds, warmup = 4, 22, 2
    rng = np.random.default_rng(0)
    bufs = _ts_buffers(rng, cfg.ts_bytes_per_superframe,
                       n_rounds * n_streams)
    states = [txd.init_state(cfg) for _ in range(n_streams)]
    dt = timed_stream(fn, bufs, states, warmup=warmup)
    n_timed = (n_rounds - warmup) * n_streams
    msps = n_timed * cfg.samples_per_superframe / dt / 1e6
    metrics.emit("dvbt_8k_qam64_r78_iq_throughput", round(msps, 3),
                 unit="Msamples/s/chip",
                 vs_baseline=round(msps / DVBT_FLOOR_MSPS, 3))


def bench_dvbt2(metrics) -> None:
    import jax
    from dtv_utils_tpu.models.dvbt2 import PROFILES
    from dtv_utils_tpu.tx import dvbt2 as txt2
    from dtv_utils_tpu.utils.timing import timed_stream

    cfg = PROFILES["bbc"]
    fn = jax.jit(lambda ts, st: txt2.modulate_frame(cfg, ts, st),
                 donate_argnums=(1,))
    n_streams, n_rounds, warmup = 2, 8, 2
    rng = np.random.default_rng(1)
    bufs = _ts_buffers(rng, cfg.payload_bytes_per_frame,
                       n_rounds * n_streams)
    states = [txt2.init_state(cfg) for _ in range(n_streams)]
    dt = timed_stream(fn, bufs, states, warmup=warmup)
    n_timed = (n_rounds - warmup) * n_streams
    msps = n_timed * txt2.samples_per_frame(cfg) / dt / 1e6
    metrics.emit("dvbt2_32k_bbc_iq_throughput", round(msps, 3),
                 unit="Msamples/s/chip",
                 vs_baseline=round(msps / DVBT_FLOOR_MSPS, 3))


def bench_j83b(metrics) -> None:
    import jax
    from dtv_utils_tpu.core.config import J83bConfig
    from dtv_utils_tpu.tx import j83b as txq
    from dtv_utils_tpu.utils.timing import timed_stream

    cfg = J83bConfig()
    fn = jax.jit(lambda ts, st: txq.modulate_superblock(cfg, ts, st),
                 donate_argnums=(1,))
    n_streams, n_rounds, warmup = 4, 12, 2
    rng = np.random.default_rng(2)
    bufs = _ts_buffers(rng, txq.PACKETS_PER_SUPERBLOCK * 188,
                       n_rounds * n_streams)
    states = [txq.init_state(cfg) for _ in range(n_streams)]
    out0, _st = fn(bufs[0], txq.init_state(cfg))
    samples = int(out0.shape[0])      # IQ pairs per superblock (3,612,420)
    dt = timed_stream(fn, bufs, states, warmup=warmup)
    n_timed = (n_rounds - warmup) * n_streams
    msps = n_timed * samples / dt / 1e6
    metrics.emit("j83b_qam64_iq_throughput", round(msps, 3),
                 unit="Msamples/s/chip",
                 vs_baseline=round(msps / J83B_FLOOR_MSPS, 3))


def bench_papr(metrics) -> None:
    import jax
    import jax.numpy as jnp
    from dtv_utils_tpu.analysis import papr
    from dtv_utils_tpu.utils.timing import timed_stream

    # 256M complex = 2 GiB per dispatch: the tunnel backend has a ~8 ms
    # per-dispatch execution overhead that does not pipeline, so throughput
    # is only measurable with large work per dispatch (4 buffers = 8 GiB
    # resident; v5e has 16 GiB HBM)
    n_complex = 1 << 28
    n_rounds, warmup = 4, 1
    rng = np.random.default_rng(3)
    bufs = [jax.device_put(jnp.asarray(
        rng.standard_normal(2 * n_complex, dtype=np.float32)))
        for _ in range(n_rounds)]
    fn = lambda raw, st: (papr._pass1_chunk(raw)[0], st)   # noqa: E731
    dt = timed_stream(fn, bufs, [None], warmup=warmup)
    gsas = (n_rounds - warmup) * n_complex / dt / 1e9
    metrics.emit("papr_scan_throughput", round(gsas, 3), unit="GSa/s/chip",
                 vs_baseline=round(gsas, 3))


def _run_inproc(name: str) -> None:
    from dtv_utils_tpu.utils.metrics import Metrics
    globals()["bench_" + name](Metrics(suppress_human=True))


def main() -> None:
    # Each metric in its own process: a clean backend session per
    # measurement (see module docstring), and one bench crashing cannot
    # take down the others.
    for name in ("dvbt", "dvbt2", "j83b", "papr"):
        r = subprocess.run(
            [sys.executable, __file__, "--inproc", name], text=True,
            capture_output=True, timeout=1800)
        for line in r.stdout.splitlines():
            if line.startswith("{"):
                print(line, flush=True)
        if r.returncode != 0:
            print(r.stderr[-2000:], file=sys.stderr)


if __name__ == "__main__":
    if len(sys.argv) == 3 and sys.argv[1] == "--inproc":
        _run_inproc(sys.argv[2])
    else:
        main()
