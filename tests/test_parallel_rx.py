"""Sharded modulator output decoded back to exact TS (VERDICT r3 #8).

test_parallel.py proves the sharded chains bit-identical to the serial
stream; these tests close the loop SEMANTICALLY — the multi-device output
must decode, so a carry-state bug on either the parallel or the receiver
side is caught the moment either changes, independent of the serial
oracle.  Runs on the virtual 8-device CPU mesh from conftest.py.
"""

import jax
import jax.numpy as jnp
import numpy as np

from dtv_utils_tpu.core import cplx
from dtv_utils_tpu.core.config import (CodeRate, Constellation, Dvbt2Config,
                                       DvbtConfig, GuardInterval, J83bConfig,
                                       TransmissionMode)
from dtv_utils_tpu.parallel.stream import (make_mesh, sharded_dvbt2_modulator,
                                           sharded_dvbt_modulator,
                                           sharded_j83b_modulator)

CFG = DvbtConfig(mode=TransmissionMode.M2K, bandwidth_mhz=8,
                 constellation=Constellation.QPSK, code_rate=CodeRate.R1_2,
                 guard=GuardInterval.G1_4)


def test_sharded_dvbt_output_decodes():
    from dtv_utils_tpu.rx.dvbt import demodulate_stream

    n_blocks = 8
    blk = CFG.ts_bytes_per_superframe
    rng = np.random.default_rng(21)
    ts = rng.integers(0, 256, n_blocks * blk, dtype=np.uint8)
    ts[::188] = 0x47

    mesh = make_mesh()
    run, in_sharding = sharded_dvbt_modulator(CFG, mesh)
    ts_dev = jax.device_put(jnp.asarray(ts.reshape(n_blocks, blk)),
                            in_sharding)
    iq = cplx.rails_to_np(np.asarray(run(ts_dev)), axis=1).reshape(-1)

    res = demodulate_stream(CFG, iq)
    n = len(res.ts)
    assert n >= (n_blocks - 1) * blk     # all but trailing partial alignment
    np.testing.assert_array_equal(res.ts, ts[:n])
    assert res.rs_ok.all() and res.tps["all_bch_ok"]


def test_sharded_dvbt2_output_decodes():
    from dtv_utils_tpu.rx.dvbt2 import demodulate_stream
    from dtv_utils_tpu.tx import dvbt2 as txt2

    cfg = Dvbt2Config()                  # 4K blade profile
    blk = cfg.payload_bytes_per_frame
    n_frames = 8
    rng = np.random.default_rng(22)
    ts = rng.integers(0, 256, n_frames * blk, dtype=np.uint8)
    ts[::188] = 0x47

    mesh = make_mesh()
    run, in_sharding = sharded_dvbt2_modulator(cfg, mesh)
    ts_dev = jax.device_put(jnp.asarray(ts.reshape(n_frames, blk)),
                            in_sharding)
    iq = cplx.rails_to_np(np.asarray(run(ts_dev)), axis=1).reshape(-1)

    res = demodulate_stream(cfg, iq)
    n = len(res.ts)
    assert n > 0
    np.testing.assert_array_equal(res.ts, ts[:n])
    assert res.ldpc_ok.all() and res.bch_ok.all() and res.sync_crc_ok


def test_sharded_j83b_output_decodes():
    from dtv_utils_tpu.rx.j83b import demodulate_stream
    from dtv_utils_tpu.tx import j83b as txq

    cfg = J83bConfig()
    blk = txq.PACKETS_PER_SUPERBLOCK * 188
    n_blocks = 4
    rng = np.random.default_rng(23)
    ts = rng.integers(0, 256, n_blocks * blk, dtype=np.uint8)
    ts[::188] = 0x47

    mesh = make_mesh(jax.devices()[:4])
    run, in_sharding = sharded_j83b_modulator(cfg, mesh)
    ts_dev = jax.device_put(jnp.asarray(ts.reshape(n_blocks, blk)),
                            in_sharding)
    iq = cplx.rails_to_np(np.asarray(run(ts_dev)), axis=1).reshape(-1)

    res = demodulate_stream(cfg, iq)
    n = len(res.ts)
    assert n > 0
    np.testing.assert_array_equal(res.ts, ts[:n])
