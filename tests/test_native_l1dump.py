"""Native l1dump vs the reference binary, byte-for-byte."""

import pathlib
import subprocess

import pytest

import l1_gen
from dtv_utils_tpu.analysis import native

REF = pathlib.Path("/root/reference")
GOLDEN = pathlib.Path(__file__).parent / "golden"


@pytest.fixture(scope="session")
def ref_l1dump(tmp_path_factory):
    if not (REF / "l1dump.c").exists():
        return None
    out = tmp_path_factory.mktemp("refl1") / "l1dump"
    subprocess.run(["gcc", "-O2", str(REF / "l1dump.c"), "-o", str(out)],
                   check=True)
    return out


@pytest.mark.parametrize("name", sorted(l1_gen.SCENARIOS))
def test_l1dump_parity(name, ref_l1dump, tmp_path):
    infile = tmp_path / f"{name}.b64"
    infile.write_bytes(l1_gen.SCENARIOS[name]())
    ours = native.run("l1dump", [str(infile)], capture_output=True)
    assert ours.returncode == 0, ours.stderr
    if ref_l1dump is not None:
        theirs = subprocess.run([str(ref_l1dump), str(infile)],
                                capture_output=True)
        assert ours.stdout.decode() == theirs.stdout.decode()
        (GOLDEN / f"l1dump_{name}.txt").write_bytes(theirs.stdout)
    else:
        expect = (GOLDEN / f"l1dump_{name}.txt").read_bytes()
        assert ours.stdout == expect


def test_l1dump_usage_and_decode_failure(tmp_path):
    proc = native.run("l1dump", [], capture_output=True)
    assert proc.returncode == 255
    assert b"usage: l1dump" in proc.stderr
    bad = tmp_path / "bad.b64"
    bad.write_bytes(b"!!!not-base64!!!\n")
    proc = native.run("l1dump", [str(bad)], capture_output=True)
    assert proc.returncode == 255
    assert b"Decode Failure" in proc.stderr
