"""Benchmarks for all four BASELINE.md north-star metrics, one JSON line
each (emitted through utils.metrics so the JSON/human duality is the same
as the model CLIs):

  1. dvbt_8k_qam64_r78_iq_throughput   (the headline, printed first)
  2. dvbt2_32k_bbc_iq_throughput       (BBC 40.2 Mbps mux, README:149-151)
  3. j83b_qam64_iq_throughput
  4. papr_scan_throughput              (GSa/s of the pass-1 power scan)

Serving shape for the modulators: N independent muxes (each a serial
state-threaded stream) round-robin on one chip — dispatches of independent
streams pipeline on the device, so this measures chip saturation, not
single-stream latency.  Buffers rotate and states thread serially, so no
dispatch ever repeats an input (honest timing on remote backends).

vs_baseline for the modulators is the reference's implied real-time floor:
the bladeRF sample rate each chain must sustain (dvbt-blade.py:146 →
9.142857 Msps for 8 MHz DVB-T/T2; qam-blade.py:36 → 10.113882 Msps for
J.83B).  Values >> 1 mean one chip can modulate that many simultaneous
full-rate muxes.  For papr, vs_baseline is vs 1 GSa/s (papr.c publishes no
number; its two-pass CPU loop is far below that).
"""

from __future__ import annotations

import time

import numpy as np

DVBT_FLOOR_MSPS = 8e6 * 8 / 7 / 1e6      # 9.142857 Msps (dvbt-blade.py:146)
J83B_FLOOR_MSPS = 5.056941 * 2           # 10.113882 Msps (qam-blade.py:36)


def _pipeline_bench(fn, bufs, states, n_streams: int, n_iter: int,
                    warmup: int = 3) -> float:
    """Round-robin the jitted fn over n_streams serial streams; returns
    wall seconds for n_iter*n_streams dispatches."""
    import jax
    outs = [None] * n_streams
    for i in range(warmup):
        for s in range(n_streams):
            outs[s], states[s] = fn(bufs[(i * n_streams + s) % len(bufs)],
                                    states[s])
    jax.block_until_ready(outs)
    t0 = time.perf_counter()
    for i in range(n_iter):
        for s in range(n_streams):
            outs[s], states[s] = fn(bufs[(i * n_streams + s) % len(bufs)],
                                    states[s])
    jax.block_until_ready(outs)
    return time.perf_counter() - t0


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

    cfg = DvbtConfig(mode=TransmissionMode.M8K, bandwidth_mhz=8,
                     constellation=Constellation.QAM64,
                     code_rate=CodeRate.R7_8, guard=GuardInterval.G1_32)
    fn = jax.jit(lambda ts, st: txd.modulate_superframe(cfg, ts, st),
                 donate_argnums=(1,))
    n_streams = 4
    rng = np.random.default_rng(0)
    bufs = _ts_buffers(rng, cfg.ts_bytes_per_superframe, 4 * n_streams)
    states = [txd.init_state(cfg) for _ in range(n_streams)]
    dt = _pipeline_bench(fn, bufs, states, n_streams, n_iter=20)
    msps = 20 * n_streams * cfg.samples_per_superframe / dt / 1e6
    metrics.emit("dvbt_8k_qam64_r78_iq_throughput", round(msps, 3),
                 unit="Msamples/s/chip",
                 vs_baseline=round(msps / DVBT_FLOOR_MSPS, 3))


def bench_dvbt2(metrics) -> None:
    import jax
    from dtv_utils_tpu.models.dvbt2 import PROFILES
    from dtv_utils_tpu.tx import dvbt2 as txt2

    cfg = PROFILES["bbc"]
    fn = jax.jit(lambda ts, st: txt2.modulate_frame(cfg, ts, st),
                 donate_argnums=(1,))
    n_streams = 2
    rng = np.random.default_rng(1)
    bufs = _ts_buffers(rng, cfg.payload_bytes_per_frame, 2 * n_streams)
    states = [txt2.init_state(cfg) for _ in range(n_streams)]
    n_iter = 8
    dt = _pipeline_bench(fn, bufs, states, n_streams, n_iter, warmup=2)
    msps = (n_iter * n_streams * txt2.samples_per_frame(cfg)) / dt / 1e6
    metrics.emit("dvbt2_32k_bbc_iq_throughput", round(msps, 3),
                 unit="Msamples/s/chip",
                 vs_baseline=round(msps / DVBT_FLOOR_MSPS, 3))


def bench_j83b(metrics) -> None:
    import jax
    from dtv_utils_tpu.core.config import J83bConfig
    from dtv_utils_tpu.tx import j83b as txq

    cfg = J83bConfig()
    fn = jax.jit(lambda ts, st: txq.modulate_superblock(cfg, ts, st),
                 donate_argnums=(1,))
    n_streams = 4
    rng = np.random.default_rng(2)
    bufs = _ts_buffers(rng, txq.PACKETS_PER_SUPERBLOCK * 188, 4 * n_streams)
    states = [txq.init_state(cfg) for _ in range(n_streams)]
    out0, states[0] = fn(bufs[0], states[0])
    samples = int(out0.shape[0])      # IQ pairs per superblock (3,612,420)
    n_iter = 10
    dt = _pipeline_bench(fn, bufs, states, n_streams, n_iter)
    msps = n_iter * n_streams * samples / dt / 1e6
    metrics.emit("j83b_qam64_iq_throughput", round(msps, 3),
                 unit="Msamples/s/chip",
                 vs_baseline=round(msps / J83B_FLOOR_MSPS, 3))


def bench_papr(metrics) -> None:
    import jax
    import jax.numpy as jnp
    from dtv_utils_tpu.analysis import papr

    n_complex = 1 << 24                       # 16M complex = 128 MiB f32
    rng = np.random.default_rng(3)
    bufs = [jax.device_put(jnp.asarray(
        rng.standard_normal(2 * n_complex, dtype=np.float32)))
        for _ in range(2)]
    out = None
    for b in bufs:                            # compile + warm
        out = papr._pass1_chunk(b)
    jax.block_until_ready(out)
    n_iter = 10
    t0 = time.perf_counter()
    outs = [papr._pass1_chunk(bufs[i % 2]) for i in range(n_iter)]
    jax.block_until_ready(outs)
    dt = time.perf_counter() - t0
    gsas = n_iter * n_complex / dt / 1e9
    metrics.emit("papr_scan_throughput", round(gsas, 3), unit="GSa/s/chip",
                 vs_baseline=round(gsas, 3))


def main() -> None:
    from dtv_utils_tpu.utils.metrics import Metrics
    metrics = Metrics(suppress_human=True)
    bench_dvbt(metrics)
    bench_dvbt2(metrics)
    bench_j83b(metrics)
    bench_papr(metrics)


if __name__ == "__main__":
    main()
