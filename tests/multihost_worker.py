"""Worker process for tests/test_multihost.py: joins a 2-process gloo CPU
"pod" (2 virtual devices per process = 4-device global mesh), ingests only
its own host stripe of the TS file, runs the sequence-sharded DVB-T chain
over the GLOBAL mesh (the carry halo crosses the process boundary through
a gloo ppermute), and verifies its local output shards are bit-identical
to the serial single-stream modulator."""

import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def main() -> int:
    pid = int(sys.argv[1])
    nproc = int(sys.argv[2])
    port = sys.argv[3]
    ts_path = sys.argv[4]

    from dtv_utils_tpu.parallel import multihost as mh
    mh.initialize(f"127.0.0.1:{port}", nproc, pid,
                  cpu_devices_per_process=2)
    import jax

    from dtv_utils_tpu.core.config import (CodeRate, Constellation,
                                           DvbtConfig, GuardInterval,
                                           TransmissionMode)
    from dtv_utils_tpu.parallel.stream import sharded_dvbt_modulator
    from dtv_utils_tpu.tx import dvbt as txd

    cfg = DvbtConfig(mode=TransmissionMode.M2K, bandwidth_mhz=8,
                     constellation=Constellation.QAM64,
                     code_rate=CodeRate.R3_4, guard=GuardInterval.G1_8)
    blk = cfg.ts_bytes_per_superframe
    mesh = mh.seq_mesh()
    assert len(jax.devices()) == 2 * nproc
    n_blocks = 2 * len(jax.devices())

    # host-striped ingest: this process reads ONLY its byte range
    start, stop = mh.host_block_range(n_blocks, mesh)
    data = np.memmap(ts_path, dtype=np.uint8, mode="r")
    assert len(data) == n_blocks * blk
    local = np.asarray(data[start * blk: stop * blk]).reshape(-1, blk)

    run, _ = sharded_dvbt_modulator(cfg, mesh)
    ts_global = mh.make_global_blocks(local, n_blocks, mesh)
    out = run(ts_global)
    first_block, mine = mh.local_output(out)
    mine = mine.reshape(stop - start, -1)

    # serial oracle over the full stream (verification only)
    full = np.asarray(data).copy()
    serial, _ = txd.modulate_stream(cfg, full, txd.init_state(cfg))
    per = cfg.samples_per_superframe
    assert first_block == start
    for i in range(stop - start):
        blk_c = serial[(start + i) * per: (start + i + 1) * per]
        # device output is rail-major [2, per] (tx/dvbt.py r5)
        want = np.stack([blk_c.real, blk_c.imag], 0).astype(
            np.float32).reshape(-1)
        got = mine[i].reshape(-1)
        if not np.array_equal(got, want):
            print(f"MULTIHOST_MISMATCH pid={pid} block={start + i}",
                  flush=True)
            return 1
    print(f"MULTIHOST_OK pid={pid} blocks=[{start},{stop}) "
          f"devices={len(jax.devices())}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
