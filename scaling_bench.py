"""Scaling harness: samples/s at 1..N devices with sequence sharding.

On TPU hardware this measures true ICI scaling; in this environment it runs
on N virtual CPU devices (JAX_PLATFORMS=cpu +
--xla_force_host_platform_device_count), which validates that the sharded
program scales structurally (no serial dependency, collectives only for the
2.3 KB carry halo) even though CPU device parallelism is simulated.

Prints one JSON line per mesh size:
  {"devices": n, "msps": ..., "efficiency_vs_1dev": ...}
"""

from __future__ import annotations

import json
import os
import sys
import time

if "--cpu" in sys.argv or os.environ.get("JAX_PLATFORMS") != "tpu":
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()
    os.environ["JAX_PLATFORMS"] = "cpu"

import jax                                                   # noqa: E402

jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import jax.numpy as jnp                                      # noqa: E402
import numpy as np                                           # noqa: E402

from dtv_utils_tpu.core.config import (Constellation, CodeRate,  # noqa: E402
                                       DvbtConfig, GuardInterval,
                                       TransmissionMode)
from dtv_utils_tpu.parallel.stream import (make_mesh,        # noqa: E402
                                           sharded_dvbt_modulator)


def main() -> None:
    cfg = DvbtConfig(mode=TransmissionMode.M2K, bandwidth_mhz=8,
                     constellation=Constellation.QAM64,
                     code_rate=CodeRate.R3_4, guard=GuardInterval.G1_8)
    blk = cfg.ts_bytes_per_superframe
    rng = np.random.default_rng(0)
    devices = jax.devices()
    blocks_per_dev = 2
    base_msps = None
    for n in [1, 2, 4, len(devices)]:
        if n > len(devices):
            break
        mesh = make_mesh(devices[:n])
        run, in_sharding = sharded_dvbt_modulator(cfg, mesh)
        nb = n * blocks_per_dev
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
        msps = nb * cfg.samples_per_superframe / dt / 1e6
        if base_msps is None:
            base_msps = msps
        print(json.dumps({
            "devices": n,
            "msps": round(msps, 1),
            "efficiency_vs_1dev": round(msps / (base_msps * n), 3),
        }))


if __name__ == "__main__":
    main()
