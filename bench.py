"""Benchmarks for all four BASELINE.md north-star metrics, one JSON line
each (emitted through utils.metrics so the JSON/human duality is the same
as the model CLIs):

  1. dvbt_8k_qam64_r78_iq_throughput   (the headline, printed first)
  2. papr_scan_throughput              (GSa/s, FULL two-pass tool)
  3. j83b_qam64_iq_throughput
  4. dvbt2_32k_bbc_iq_throughput       (BBC 40.2 Mbps mux, README:149-151)

FAIL-OPEN design (VERDICT r4 next-#1 — BENCH_r04 burned every budget and
emitted nothing):

  * TWO-PHASE driver: phase 1 runs all metrics in ONE subprocess (the
    tunnel's per-session first-touch toll — ~4 min when the remote
    compile service is degraded, BENCH_NOTES.md — is paid once; every
    later compile in the session is fast; dvbt2 still last).  Phase 2
    retries anything missing in ISOLATED per-metric subprocesses with
    hard budgets (the wedge quarantine).  The parent STREAMS child
    stdout line-by-line, so a budget kill loses nothing already printed.
  * Each child emits its metric after warmup + the FIRST timed segment
    (quality="provisional", segments_completed=1), then keeps refining
    and RE-EMITTING while its deadline allows (up to MAX_SEGMENTS).  A
    metric name can therefore appear multiple times; the LAST line is the
    best estimate (highest segments_completed).  A slow host/tunnel now
    yields a coarse number instead of nothing.
  * Timestamped heartbeats go to stderr at every phase (imports, devices,
    compile, buffers resident, each segment), so the next timeout is
    attributable to a specific phase.
  * The JAX persistent compilation cache is enabled at .jax_cache/ under
    the repo, so driver-run compiles after a warmed session are cache
    hits (compile was one of the dominant unknown costs in r4's
    timeouts).
  * Stress contract: `python bench.py --stress 60` runs every metric with
    a 60 s budget and exits 0 iff every metric printed at least one line
    (the committed BENCH_STRESS log demonstrates this).

Variance: each refinement line carries the raw per-segment values
(`runs`) and `spread_pct`, so a swing like BENCH_r03's 349->230 Msps is
attributable (tunnel-session noise shows as intra-run spread; a real
regression shows tight segments at a lower level).

Measurement honesty (round 3 findings, kept):

  * The axon TPU tunnel backend is LAZY (``block_until_ready`` returns
    immediately; execution happens on value fetch) and MEMOIZES dispatches
    (same executable + same input buffers => cached result).  All timing
    uses a distinct input buffer for EVERY dispatch and a scalar probe
    chain fetched inside the timed region (utils/timing), so the wall
    time data-depends on every timed kernel.
  * device_put is ALSO lazy: a host-generated buffer's transfer executes
    on first use — so every segment's fresh buffers are probe-forced
    BEFORE that segment's timed region.  The papr bench generates its
    chunks ON DEVICE (jax.random.normal per distinct key): the timed
    region measures compute on resident data, which is the serving shape.
  * Running the 32K DVB-T2 chain degrades the backend session itself
    (afterwards even small dispatches are much slower; jax.clear_caches
    does not recover it — root-cause notes in BENCH_NOTES.md).  Each
    benchmark runs in its OWN subprocess, and dvbt2 runs LAST so its
    session damage cannot touch other metrics.

Serving shape for the modulators: one stream, L consecutive blocks per
DISPATCH (parallel/stream's carry-derivation batching — every block's
stream state is recomputed in-dispatch from its predecessor's raw tail,
so a batch has no serial dependency).  The per-bench L is recorded in the
metric's `blocks_per_dispatch` field; see BENCH_NOTES.md's dispatch-size
sweep.

vs_baseline for the modulators is the reference's implied real-time floor:
the bladeRF sample rate each chain must sustain (dvbt-blade.py:146 →
9.142857 Msps for 8 MHz DVB-T/T2; qam-blade.py:36 → 10.113882 Msps for
J.83B).  Values >> 1 mean one chip can modulate that many simultaneous
full-rate muxes.  For papr, vs_baseline is vs 1 GSa/s (papr.c publishes no
number; its two-pass CPU loop is far below that).
"""

from __future__ import annotations

import json
import os
import pathlib
import statistics
import subprocess
import sys
import threading
import time

import numpy as np

REPO = pathlib.Path(__file__).resolve().parent

DVBT_FLOOR_MSPS = 8e6 * 8 / 7 / 1e6      # 9.142857 Msps (dvbt-blade.py:146)
J83B_FLOOR_MSPS = 5.056941 * 2           # 10.113882 Msps (qam-blade.py:36)

# Per-bench wall budgets (seconds), covering compile + transfer + timing.
ORDER = ("dvbt", "papr", "j83b", "dvbt2")
TIMEOUTS = {"dvbt": 150, "papr": 120, "j83b": 150, "dvbt2": 200}
# Extra headroom for the FIRST bench of the shared-process phase: the
# tunnel's per-session first-touch toll was measured at ~235 s when the
# remote-compile service is degraded (BENCH_NOTES.md).
TOLL_ALLOWANCE_S = 600.0
# Sized so one degraded-service first compile (~10 min observed) plus the
# fast remainder still fits; in the healthy state phase 1 finishes in
# ~5 min and phase 2 never runs, so the worst case only occurs when the
# isolated path would capture nothing anyway.
PHASE1_BUDGET = 900.0
MAX_SEGMENTS = 5
# Stop refining when remaining time < last segment cost * this + slack:
# a deadline overrun loses nothing (lines already printed) but wastes the
# next bench's start.
SEG_SAFETY, SEG_SLACK_S = 1.6, 5.0

_T0 = time.perf_counter()


def _hb(name: str, phase: str) -> None:
    """Timestamped heartbeat so a budget kill is attributable to a phase."""
    print(f"[hb {name} +{time.perf_counter() - _T0:7.1f}s] {phase}",
          file=sys.stderr, flush=True)


def _enable_compile_cache() -> None:
    """Persistent XLA compilation cache under the repo (best-effort: option
    names vary across jax versions; the bench must run regardless)."""
    import jax
    for opt, val in (("jax_compilation_cache_dir", str(REPO / ".jax_cache")),
                     ("jax_persistent_cache_min_compile_time_secs", 0.0),
                     ("jax_persistent_cache_min_entry_size_bytes", 0)):
        try:
            jax.config.update(opt, val)
        except (AttributeError, ValueError):
            pass


def _emit(metrics, name, per_segment, unit, floor, **extra):
    med = statistics.median(per_segment)
    spread = (max(per_segment) - min(per_segment)) / med * 100
    n = len(per_segment)
    metrics.emit(name, round(med, 3), unit=unit,
                 vs_baseline=round(med / floor, 3),
                 runs=[round(v, 3) for v in per_segment],
                 spread_pct=round(spread, 1),
                 segments_completed=n,
                 quality="provisional" if n == 1 else "final", **extra)


def _deadline_segments(metrics, name, fn, make_round_inputs, states,
                       samples_per_round, rounds_per_segment, floor,
                       deadline, unit="Msamples/s/chip", scale=1e6,
                       warmup_rounds=1, **extra):
    """Deadline-driven fail-open measurement loop.

    Runs ``fn(input, state)`` round-robin over ``states`` with a distinct
    input per dispatch (memoization-proof), execution-forced via the probe
    chain.  After warmup and after EVERY completed segment the metric is
    (re-)emitted, so a budget kill can only lose refinement, never the
    number.  ``make_round_inputs(r)`` returns the inputs for round r
    (len(states) of them), created and probe-forced OUTSIDE timed regions.
    """
    import jax
    import jax.numpy as jnp

    from dtv_utils_tpu.utils import timing

    n_streams = len(states)
    _hb(name, "warmup/compile start")
    r = 0
    for _ in range(warmup_rounds):
        inputs = make_round_inputs(r)
        timing.force(inputs)
        _hb(name, "warmup inputs resident; dispatching (compile happens "
                  "here on first round)")
        acc = [fn(inputs[s], states[s]) for s in range(n_streams)]
        for s in range(n_streams):
            out, states[s] = acc[s]
            timing.force(out)
        r += 1
    _hb(name, "compiled + warm")
    seg_dts = []
    while len(seg_dts) < MAX_SEGMENTS:
        # stage + force this segment's buffers outside the timed region
        seg_inputs = [make_round_inputs(r + i)
                      for i in range(rounds_per_segment)]
        for ins in seg_inputs:
            timing.force(ins)
        r += rounds_per_segment
        _hb(name, f"segment {len(seg_dts) + 1}: buffers resident")
        accv = jnp.float32(0)
        t0 = time.perf_counter()
        for ins in seg_inputs:
            for s in range(n_streams):
                out, states[s] = fn(ins[s], states[s])
                for leaf in jax.tree_util.tree_leaves(out):
                    accv = timing._probe(accv, leaf)
        forced = float(accv)                  # forces every timed dispatch
        dt = time.perf_counter() - t0
        assert forced == forced
        seg_dts.append(dt)
        per_seg = [rounds_per_segment * samples_per_round / d / scale
                   for d in seg_dts]
        _emit(metrics, name, per_seg, unit, floor, **extra)
        _hb(name, f"segment {len(seg_dts)} done in {dt:.2f}s")
        left = deadline - time.perf_counter()
        if left < dt * SEG_SAFETY + SEG_SLACK_S:
            _hb(name, f"stopping: {left:.1f}s left < "
                      f"{dt * SEG_SAFETY + SEG_SLACK_S:.1f}s needed")
            break


def _ts_block(rng, shape) -> np.ndarray:
    ts = rng.integers(0, 256, size=shape, dtype=np.uint8)
    ts[..., ::188] = 0x47
    return ts


def bench_dvbt(metrics, deadline) -> None:
    import jax
    from dtv_utils_tpu.core.config import (CodeRate, Constellation,
                                           DvbtConfig, GuardInterval,
                                           TransmissionMode)
    from dtv_utils_tpu.tx import dvbt as txd
    _hb("dvbt", "imports done")

    # Serving shape: 4 independent muxes round-robin, one superframe per
    # dispatch.  The dispatch-size sweep (BENCH_NOTES.md) showed the
    # batched shard_map path LOSES here (165 vs 213 Msps at 8 blocks —
    # vmap/shard_map materializes layouts the single-superframe program
    # fuses), so the multiplexed shape stays.
    cfg = DvbtConfig(mode=TransmissionMode.M8K, bandwidth_mhz=8,
                     constellation=Constellation.QAM64,
                     code_rate=CodeRate.R7_8, guard=GuardInterval.G1_32)
    fn = jax.jit(lambda ts, st: txd.modulate_superframe(cfg, ts, st),
                 donate_argnums=(1,))
    n_streams = 4
    rng = np.random.default_rng(0)
    states = [txd.init_state(cfg) for _ in range(n_streams)]
    _hb("dvbt", f"devices acquired: {jax.devices()}")

    import jax.numpy as jnp

    def make_round(r):
        return [jax.device_put(jnp.asarray(
            _ts_block(rng, cfg.ts_bytes_per_superframe)))
            for _ in range(n_streams)]

    _deadline_segments(
        metrics, "dvbt_8k_qam64_r78_iq_throughput", fn, make_round, states,
        samples_per_round=n_streams * cfg.samples_per_superframe,
        rounds_per_segment=4, floor=DVBT_FLOOR_MSPS, deadline=deadline,
        blocks_per_dispatch=1, streams=n_streams)


def _batched_bench(metrics, name, runner, sharding, n_blocks, block_bytes,
                   samples_per_block, floor, deadline, seed,
                   rounds_per_segment=2):
    import jax
    import jax.numpy as jnp
    # dispatch-size sweep hook (`bench.py --sweep <name>`, BENCH_NOTES.md)
    n_blocks = int(os.environ.get("DTV_BENCH_BLOCKS", n_blocks))
    rng = np.random.default_rng(seed)

    def make_round(r):
        return [jax.device_put(jnp.asarray(
            _ts_block(rng, (n_blocks, block_bytes))), sharding)]

    fn = lambda b, st: (runner(b), st)   # noqa: E731
    _deadline_segments(
        metrics, name, fn, make_round, [None],
        samples_per_round=n_blocks * samples_per_block,
        rounds_per_segment=rounds_per_segment, floor=floor,
        deadline=deadline, blocks_per_dispatch=n_blocks)


def bench_dvbt2(metrics, deadline) -> None:
    import jax
    from dtv_utils_tpu.models.dvbt2 import PROFILES
    from dtv_utils_tpu.parallel import stream as ps
    from dtv_utils_tpu.tx import dvbt2 as txt2
    _hb("dvbt2", "imports done")

    cfg = PROFILES["bbc"]
    mesh = ps.make_mesh(jax.devices()[:1])
    _hb("dvbt2", f"devices acquired: {jax.devices()}")
    run, sharding = ps.sharded_dvbt2_modulator(cfg, mesh)
    _batched_bench(metrics, "dvbt2_32k_bbc_iq_throughput", run, sharding,
                   n_blocks=4, block_bytes=cfg.payload_bytes_per_frame,
                   samples_per_block=txt2.samples_per_frame(cfg),
                   floor=DVBT_FLOOR_MSPS, deadline=deadline, seed=1,
                   rounds_per_segment=1)


def bench_j83b(metrics, deadline) -> None:
    import jax
    from dtv_utils_tpu.core.config import J83bConfig
    from dtv_utils_tpu.parallel import stream as ps
    from dtv_utils_tpu.tx import j83b as txq
    _hb("j83b", "imports done")

    # Serving shape: 4 independent muxes round-robin, one superblock per
    # dispatch — the SAME single-block program the profiler measures at
    # ~30 ms/superblock, which compiles in ~1 min.  The carry-derivation
    # batched/sharded variant is this repo's worst XLA compile (>4 min
    # even on a healthy service — the vmapped halo->carry derivation
    # replays framing+RS+interleave per block); at 8 blocks it OOMed
    # outright before the r5 rail-major layout (BENCH_NOTES.md).  A
    # 30 ms dispatch amortizes the ~8 ms tunnel overhead fine, so the
    # batched shape buys little here anyway.
    cfg = J83bConfig()
    fn = jax.jit(lambda ts, st: txq.modulate_superblock(cfg, ts, st),
                 donate_argnums=(1,))
    n_streams = 4
    rng = np.random.default_rng(2)
    states = [txq.init_state(cfg) for _ in range(n_streams)]
    _hb("j83b", f"devices acquired: {jax.devices()}")
    blk = txq.PACKETS_PER_SUPERBLOCK * 188

    import jax.numpy as jnp
    del ps

    def make_round(r):
        return [jax.device_put(jnp.asarray(_ts_block(rng, blk)))
                for _ in range(n_streams)]

    _deadline_segments(
        metrics, "j83b_qam64_iq_throughput", fn, make_round, states,
        samples_per_round=n_streams * 3612420, rounds_per_segment=2,
        floor=J83B_FLOOR_MSPS, deadline=deadline,
        blocks_per_dispatch=1, streams=n_streams)


def bench_papr(metrics, deadline) -> None:
    """FULL two-pass papr tool on device-resident chunks: pass-1 stats AND
    the fused CCDF pass in ONE dispatch per chunk (the nested jits inline).
    Chunks are generated on device (distinct PRNG keys => distinct buffers,
    so memoization can't serve them) and probe-forced before timing."""
    import jax
    import jax.numpy as jnp
    from dtv_utils_tpu.analysis import papr
    _hb("papr", "imports done")

    n_complex = 1 << 26              # 64M complex = 512 MiB per chunk
    gen = jax.jit(lambda k: jax.random.normal(
        k, (2 * n_complex,), dtype=jnp.float32))
    _hb("papr", f"devices acquired: {jax.devices()}")
    # 13 CCDF levels ~ a typical 12 dB PAPR report (papr.c:138-141).
    levels = jnp.asarray(np.power(10.0, np.arange(13) / 10.0)
                         .astype(np.float32))
    full = jax.jit(lambda raw: (papr._pass1_chunk(raw),
                                papr._pass2_chunk(raw, levels)))
    keys = iter(jax.random.split(jax.random.PRNGKey(0), 64))

    def make_round(r):
        return [gen(next(keys))]

    fn = lambda raw, st: (full(raw), st)   # noqa: E731
    _deadline_segments(
        metrics, "papr_scan_throughput", fn, make_round, [None],
        samples_per_round=n_complex, rounds_per_segment=2, floor=1.0,
        deadline=deadline, unit="GSa/s/chip", scale=1e9)


def _run_inproc(name: str, budget: float) -> None:
    _enable_compile_cache()
    from dtv_utils_tpu.utils.metrics import Metrics
    deadline = _T0 + budget
    globals()["bench_" + name](Metrics(suppress_human=True), deadline)
    _hb(name, "bench complete")


def _run_inproc_all(budget: float) -> None:
    """All four metrics in ONE process (phase 1): the tunnel's
    first-touch toll — measured at 235 s after an hour of client silence,
    while every subsequent (even different) compile in the same process
    is fast — is paid once instead of once per metric.  dvbt2 still runs
    last so its trailing session-wedge cannot hurt the others; a bench
    that hangs forfeits the rest of phase 1, which phase 2 then retries
    in isolated subprocesses."""
    _enable_compile_cache()
    from dtv_utils_tpu.utils.metrics import Metrics
    m = Metrics(suppress_human=True)
    deadline = _T0 + budget
    for name in ORDER:
        left = deadline - time.perf_counter()
        if left < 20:
            _hb(name, f"phase-1 budget exhausted ({left:.0f}s left); "
                      "leaving for phase 2")
            break
        # each bench may use the remaining phase-1 time, capped at its own
        # per-metric budget past the first (toll-paying) bench
        per = min(deadline, time.perf_counter() + TIMEOUTS[name]
                  + (TOLL_ALLOWANCE_S if name == ORDER[0] else 0.0))
        try:
            globals()["bench_" + name](m, per)
            _hb(name, "phase-1 bench complete")
        except Exception as e:          # noqa: BLE001 — keep going
            _hb(name, f"phase-1 bench failed: {type(e).__name__}: {e}")


def _pump(pipe, sink, tag: str) -> None:
    for line in iter(pipe.readline, ""):
        if tag and not line.startswith("{"):
            line = tag + line
        sink.write(line)
        sink.flush()
    pipe.close()


METRIC_OF = {"dvbt": "dvbt_8k_qam64_r78_iq_throughput",
             "papr": "papr_scan_throughput",
             "j83b": "j83b_qam64_iq_throughput",
             "dvbt2": "dvbt2_32k_bbc_iq_throughput"}


def _run_child(args: list, budget: float, tag: str) -> set:
    """Spawn a bench child, STREAM its stdout (a kill loses nothing
    already emitted), kill at `budget`; returns the metric names it
    emitted."""
    p = subprocess.Popen(
        [sys.executable, __file__, *args], text=True,
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, cwd=str(REPO))
    got: set = set()

    class _Tee:
        def write(self, line):
            if line.startswith("{"):
                try:
                    got.add(json.loads(line)["metric"])
                except (ValueError, KeyError):
                    pass
            sys.stdout.write(line)

        def flush(self):
            sys.stdout.flush()

    threads = [
        threading.Thread(target=_pump, args=(p.stdout, _Tee(), ""),
                         daemon=True),
        threading.Thread(target=_pump, args=(p.stderr, sys.stderr, ""),
                         daemon=True)]
    for t in threads:
        t.start()
    try:
        p.wait(timeout=budget)
    except subprocess.TimeoutExpired:
        p.kill()
        p.wait()
        print(f"[bench] {tag}: budget {budget}s exhausted (killed; "
              f"lines already emitted stand)", file=sys.stderr, flush=True)
    for t in threads:
        t.join(timeout=10)
    return got


def main(budgets=None) -> int:
    """Two-phase fail-open driver (see module docstring).

    Phase 1: ALL metrics in one subprocess — the tunnel's per-session
    first-touch toll (~4 min when the remote-compile service is degraded)
    is paid once, and every later compile in that session is fast.
    Phase 2: any metric phase 1 did not emit is retried in its own
    isolated subprocess with its per-metric budget (the wedge-quarantine
    path).  When explicit per-metric budgets are given (--stress), only
    the isolated path runs — the stress contract is per-metric.

    Returns the number of metrics that printed nothing (0 = success)."""
    t0 = time.perf_counter()
    got: set = set()
    if budgets is None:
        budgets = TIMEOUTS
        got |= _run_child(["--inproc-all", str(PHASE1_BUDGET - 10.0)],
                          PHASE1_BUDGET, "phase1")
    for name in ORDER:
        if METRIC_OF[name] in got:
            continue
        budget = budgets[name]
        # Child deadline slightly inside the kill budget so it can stop
        # cleanly and flush.
        got |= _run_child(
            ["--inproc", name, str(max(budget - 5.0, budget * 0.8))],
            budget, name)
        if METRIC_OF[name] not in got:
            print(f"[bench] {name}: NO metric emitted", file=sys.stderr,
                  flush=True)
    missing = sum(METRIC_OF[n] not in got for n in ORDER)
    print(f"[bench] total {time.perf_counter() - t0:.1f}s, "
          f"{missing} metric(s) missing", file=sys.stderr, flush=True)
    return missing


def sweep(name: str, sizes=(1, 2, 4, 8), budget: float = 100.0) -> None:
    """Dispatch-size sweep (committed source of the BENCH_NOTES.md table):
    run one bench at several blocks-per-dispatch, one subprocess per size
    (a failing compile at one size — e.g. j83b at 8 — cannot poison the
    rest)."""
    for L in sizes:
        print(f"[sweep] {name} blocks_per_dispatch={L}", file=sys.stderr,
              flush=True)
        env = dict(os.environ, DTV_BENCH_BLOCKS=str(L))
        try:
            r = subprocess.run(
                [sys.executable, __file__, "--inproc", name, str(budget)],
                text=True, capture_output=True, timeout=budget + 20,
                env=env, cwd=str(REPO))
        except subprocess.TimeoutExpired:
            print(f"[sweep] {name} L={L}: timeout", file=sys.stderr,
                  flush=True)
            continue
        lines = [ln for ln in r.stdout.splitlines() if ln.startswith("{")]
        if lines:
            print(lines[-1], flush=True)
        else:
            print(f"[sweep] {name} L={L}: FAILED rc={r.returncode}: "
                  f"{r.stderr.strip().splitlines()[-1] if r.stderr else ''}",
                  file=sys.stderr, flush=True)


if __name__ == "__main__":
    if len(sys.argv) >= 2 and sys.argv[1] == "--inproc-all":
        _run_inproc_all(float(sys.argv[2]) if len(sys.argv) > 2 else 600.0)
    elif len(sys.argv) >= 3 and sys.argv[1] == "--inproc":
        budget = float(sys.argv[3]) if len(sys.argv) > 3 else 120.0
        _run_inproc(sys.argv[2], budget)
    elif len(sys.argv) >= 3 and sys.argv[1] == "--sweep":
        sweep(sys.argv[2])
    elif len(sys.argv) >= 2 and sys.argv[1] == "--stress":
        b = float(sys.argv[2]) if len(sys.argv) > 2 else 60.0
        sys.exit(main({name: b for name in ORDER}))
    else:
        sys.exit(1 if main() else 0)
