"""Scaling harness: samples/s at 1..N devices with sequence sharding.

On TPU hardware this measures true ICI scaling; in this environment it runs
on N virtual CPU devices (JAX_PLATFORMS=cpu +
--xla_force_host_platform_device_count), which validates that the sharded
program scales structurally (no serial dependency, collectives only for the
2.3 KB carry halo) even though CPU device parallelism is simulated.

Prints one JSON line per mesh size:
  {"devices": n, "msps": ..., "efficiency_vs_1dev": ...}

``--multihost``: instead of one process, spawn 2 localhost processes (2
virtual devices each, gloo collectives — the parallel/multihost.py backend)
and measure the 4-device global mesh where the carry-halo ppermute crosses
the process boundary; prints one JSON line from process 0.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time


def _multihost_main() -> None:
    if "--worker" in sys.argv:
        proc = int(sys.argv[sys.argv.index("--worker") + 1])
        port = sys.argv[sys.argv.index("--worker") + 2]
        from dtv_utils_tpu.parallel import multihost as mh
        mh.initialize(f"127.0.0.1:{port}", 2, proc,
                      cpu_devices_per_process=2)
        import jax
        import jax.numpy as jnp
        import numpy as np
        from dtv_utils_tpu.core.config import (Constellation, CodeRate,
                                               DvbtConfig, GuardInterval,
                                               TransmissionMode)
        from dtv_utils_tpu.parallel.stream import sharded_dvbt_modulator
        cfg = DvbtConfig(mode=TransmissionMode.M2K, bandwidth_mhz=8,
                         constellation=Constellation.QAM64,
                         code_rate=CodeRate.R3_4, guard=GuardInterval.G1_8)
        mesh = mh.seq_mesh()
        blk = cfg.ts_bytes_per_superframe
        n_blocks = 2 * len(jax.devices())
        start, stop = mh.host_block_range(n_blocks, mesh)
        rng = np.random.default_rng(0)
        ts = rng.integers(0, 256, (n_blocks, blk), dtype=np.uint8)
        ts[:, ::188] = 0x47
        run, _ = sharded_dvbt_modulator(cfg, mesh)
        ts_g = mh.make_global_blocks(ts[start:stop], n_blocks, mesh)
        out = run(ts_g)
        jax.block_until_ready(out)
        iters = 5
        t0 = time.perf_counter()
        for _ in range(iters):
            out = run(ts_g)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / iters
        if proc == 0:
            msps = n_blocks * cfg.samples_per_superframe / dt / 1e6
            print(json.dumps({"devices": len(jax.devices()),
                              "processes": 2, "multihost": True,
                              "msps": round(msps, 1)}), flush=True)
        return
    import socket
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = str(s.getsockname()[1])
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    procs = [subprocess.Popen(
        [sys.executable, __file__, "--multihost", "--worker", str(p), port],
        env=env, stdout=subprocess.PIPE, text=True) for p in range(2)]
    for p in procs:
        out, _ = p.communicate(timeout=900)
        if out.strip():
            print(out.strip(), flush=True)


if "--multihost" in sys.argv:
    _multihost_main()
    sys.exit(0)

if "--cpu" in sys.argv or os.environ.get("JAX_PLATFORMS") != "tpu":
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()
    os.environ["JAX_PLATFORMS"] = "cpu"

# core pinning must precede jax import so XLA's thread pools inherit it
if os.environ.get("DTV_SCALING_CORES"):
    os.sched_setaffinity(
        0, set(range(int(os.environ["DTV_SCALING_CORES"]))))

import jax                                                   # noqa: E402

jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import jax.numpy as jnp                                      # noqa: E402
import numpy as np                                           # noqa: E402

from dtv_utils_tpu.core.config import (Constellation, CodeRate,  # noqa: E402
                                       DvbtConfig, GuardInterval,
                                       TransmissionMode)
from dtv_utils_tpu.parallel.stream import (make_mesh,        # noqa: E402
                                           sharded_dvbt_modulator)


def measure(n: int) -> float:
    """msps of the sharded DVB-T chain on an n-device mesh (this process's
    devices/affinity as configured by the parent)."""
    cfg = DvbtConfig(mode=TransmissionMode.M2K, bandwidth_mhz=8,
                     constellation=Constellation.QAM64,
                     code_rate=CodeRate.R3_4, guard=GuardInterval.G1_8)
    blk = cfg.ts_bytes_per_superframe
    rng = np.random.default_rng(0)
    mesh = make_mesh(jax.devices()[:n])
    run, in_sharding = sharded_dvbt_modulator(cfg, mesh)
    nb = n * 2
    ts = rng.integers(0, 256, (nb, blk), dtype=np.uint8)
    ts[:, ::188] = 0x47
    ts_dev = jax.device_put(jnp.asarray(ts), in_sharding)
    out = run(ts_dev)
    out.block_until_ready()
    iters = 5
    t0 = time.perf_counter()
    for _ in range(iters):
        out = run(ts_dev)
    out.block_until_ready()
    dt = (time.perf_counter() - t0) / iters
    return nb * cfg.samples_per_superframe / dt / 1e6


def main() -> None:
    if "--measure" in sys.argv:
        n = int(sys.argv[sys.argv.index("--measure") + 1])
        print(json.dumps({"devices": n, "msps": round(measure(n), 1)}),
              flush=True)
        return
    # Parent: one pinned child per mesh size.  On this CPU simulation the
    # virtual devices share the host cores, so an un-pinned 1-device
    # baseline already uses every core and "scaling" only measures host
    # saturation.  Pinning each run to min(n, ncores) cores makes
    # efficiency a per-core number: ideal speedup is min(n, ncores)/1.
    ncores = os.cpu_count() or 1
    base = None
    for n in [1, 2, 4, 8]:
        cores = min(n, ncores)
        env = dict(os.environ)
        env["DTV_SCALING_CORES"] = str(cores)
        r = subprocess.run(
            [sys.executable, __file__, "--measure", str(n)],
            env=env, capture_output=True, text=True, timeout=1200)
        line = [ln for ln in r.stdout.splitlines()
                if ln.startswith("{")][-1]
        msps = json.loads(line)["msps"]
        if base is None:
            base = msps
        ideal = min(n, ncores)
        print(json.dumps({
            "devices": n, "cores": cores, "msps": msps,
            "efficiency_vs_1dev": round(msps / (base * ideal), 3),
        }), flush=True)


if __name__ == "__main__":
    main()
