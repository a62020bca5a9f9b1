"""Metrics duality + checkpoint/resume exactness."""

import io
import json

import numpy as np

from dtv_utils_tpu.core.config import (Constellation, CodeRate, DvbtConfig,
                                       GuardInterval, TransmissionMode)
from dtv_utils_tpu.tx import dvbt as txd
from dtv_utils_tpu.utils import checkpoint, metrics

CFG = DvbtConfig(mode=TransmissionMode.M2K, bandwidth_mhz=6,
                 constellation=Constellation.QPSK,
                 code_rate=CodeRate.R1_2, guard=GuardInterval.G1_4)


def test_metrics_sinks_constructor_configurable():
    # json_out/human_out are real dataclass fields: per-instance via __init__
    jo, ho = io.StringIO(), io.StringIO()
    m = metrics.Metrics(json_out=jo, human_out=ho)
    m.emit("x", 2, unit="u")
    assert json.loads(jo.getvalue())["value"] == 2
    assert "x = 2 u" in ho.getvalue()


def test_metrics_json_and_human():
    m = metrics.Metrics()
    m.json_out = io.StringIO()
    m.human_out = io.StringIO()
    m.emit("ts_rate", 31.668449, unit="Mbps", config="8MHz 64QAM 7/8")
    rec = json.loads(m.json_out.getvalue())
    assert rec == {"metric": "ts_rate", "value": 31.668449, "unit": "Mbps",
                   "config": "8MHz 64QAM 7/8"}
    assert "ts_rate = 31.668449 Mbps" in m.human_out.getvalue()
    m2 = metrics.Metrics(suppress_human=True)
    m2.json_out = io.StringIO()
    m2.human_out = io.StringIO()
    m2.emit("x", 1)
    assert m2.human_out.getvalue() == ""


def test_checkpoint_resume_mid_stream(tmp_path):
    blk = CFG.ts_bytes_per_superframe
    rng = np.random.default_rng(2)
    ts = rng.integers(0, 256, 4 * blk, dtype=np.uint8)
    ts[::188] = 0x47

    want, _ = txd.modulate_stream(CFG, ts)

    # run 2 blocks, checkpoint, "restart", resume for 2 more
    got1, state = txd.modulate_stream(CFG, ts[:2 * blk])
    path = str(tmp_path / "state.npz")
    checkpoint.save_state(path, state, kind="dvbt")
    resumed = checkpoint.load_state(path, txd.init_state(CFG), kind="dvbt")
    got2, _ = txd.modulate_stream(CFG, ts[2 * blk:], state=resumed)
    got = np.concatenate([got1, got2])
    np.testing.assert_array_equal(got, want)


def test_checkpoint_rejects_mismatches(tmp_path):
    import pytest
    state = txd.init_state(CFG)
    path = str(tmp_path / "state.npz")
    checkpoint.save_state(path, state, kind="dvbt")
    with pytest.raises(ValueError, match="kind"):
        checkpoint.load_state(path, state, kind="dvbt2")


def test_cli_resume_matches_oneshot(tmp_path):
    """dvbt-mod --save-state / --load-state splices a stream exactly."""
    import subprocess
    import sys
    blk = CFG.ts_bytes_per_superframe
    rng = np.random.default_rng(4)
    ts = rng.integers(0, 256, 2 * blk, dtype=np.uint8)
    ts[::188] = 0x47
    (tmp_path / "a.ts").write_bytes(ts[:blk].tobytes())
    (tmp_path / "b.ts").write_bytes(ts[blk:].tobytes())
    (tmp_path / "ab.ts").write_bytes(ts.tobytes())
    env_args = ["-m", "t2k", "-c", "6", "-C", "qpsk", "-r", "1/2",
                "-g", "1/4"]

    import os
    import pathlib
    env = dict(os.environ)
    env["PYTHONPATH"] = str(pathlib.Path(__file__).resolve().parents[1])

    def run(*extra):
        r = subprocess.run(
            [sys.executable, "-m", "dtv_utils_tpu.cli", "dvbt-mod",
             *env_args, *extra], capture_output=True, cwd=tmp_path, env=env)
        assert r.returncode == 0, r.stderr.decode()

    run("-o", "full.iq", str(tmp_path / "ab.ts"))
    run("-o", "p1.iq", "--save-state", "st.npz", str(tmp_path / "a.ts"))
    run("-o", "p2.iq", "--load-state", "st.npz", str(tmp_path / "b.ts"))
    full = (tmp_path / "full.iq").read_bytes()
    spliced = (tmp_path / "p1.iq").read_bytes() + \
        (tmp_path / "p2.iq").read_bytes()
    assert full == spliced


def test_profile_bytes_model():
    """The roofline bytes model is argument+result buffer bytes — a true
    lower bound on HBM traffic — not XLA's logical 'bytes accessed' (which
    exceeds physical traffic for gather-heavy stages and scored stages at
    an impossible >100% of roofline in PROFILE_r03)."""
    import jax.numpy as jnp

    from dtv_utils_tpu.utils import profile

    x = jnp.zeros((1024, 128), jnp.float32)
    idx = jnp.zeros((1024,), jnp.int32)

    def gathery(x, idx):
        return x[idx] + x[idx] + x[idx]        # logical reads 3x the input

    r = profile.profile_fn("gathery", gathery, (x, idx), n_variants=3)
    in_b = 1024 * 128 * 4 + 1024 * 4
    out_b = 1024 * 128 * 4
    assert r.bytes_io == in_b + out_b
    # logical accounting counts the gather amplification; io must not
    assert r.bytes_xla >= r.bytes_io or r.bytes_xla == 0.0
    if r.roofline_pct is not None:             # TPU only
        assert r.roofline_pct <= 110.0         # <=100 + timer noise


def test_profile_cli_streams_rows_as_measured(capsys, monkeypatch):
    """`dtv profile -j` must emit each stage row the moment it is measured
    (fail-open, r5): a budget kill mid-chain keeps the measured prefix.
    Fake two-stage chain; assert a row exists after the first stage even
    though the second raises."""
    import jax.numpy as jnp

    from dtv_utils_tpu.utils import profile

    def fake_chain():
        profile.profile_fn("s1", lambda x: x + 1.0,
                           (jnp.zeros(128, jnp.float32),), n_variants=3)
        raise RuntimeError("chain dies after stage 1")

    monkeypatch.setitem(profile.CHAINS, "fake", fake_chain)
    try:
        profile.cli(["-j", "fake"])
    except RuntimeError:
        pass
    assert profile.ON_REPORT is None          # hook cleaned up on error
    out = capsys.readouterr().out
    rows = [ln for ln in out.splitlines() if ln.startswith("{")]
    assert len(rows) == 1 and '"profile.fake.s1"' in rows[0]


def test_profile_railifies_pair_minor_outputs():
    """Stage outputs with a trailing size-2 pair axis are transposed to
    rail-major inside the profiled function, so profiling never
    materializes a 2-lane-minor buffer (64x tile padding on TPU)."""
    import jax
    import jax.numpy as jnp

    from dtv_utils_tpu.utils import profile

    def stage(x):
        return jnp.stack([x, x + 1.0], axis=-1)     # [n, 2] pair-minor

    x = jnp.arange(64, dtype=jnp.float32)
    wrapped = lambda *a: profile._railify(stage(*a))   # noqa: E731
    out = jax.eval_shape(wrapped, x)
    assert out.shape == (2, 64)
    r = profile.profile_fn("pairy", stage, (x,), n_variants=3)
    assert r.bytes_io == 64 * 4 + 2 * 64 * 4    # sizes unchanged by moveaxis
