"""Native H.264 analyzers vs the reference binaries, byte-for-byte.

The reference tools are compiled unmodified from /root/reference at test
time (cached per session); inputs are synthetic ES streams from h264_gen.
If the reference tree is absent, committed golden outputs are used instead.
"""

import pathlib
import shutil
import subprocess

import pytest

import h264_gen
from dtv_utils_tpu.analysis import native

REF = pathlib.Path("/root/reference")
GOLDEN = pathlib.Path(__file__).parent / "golden"

STREAMS = {
    "progressive_main": dict(interlaced=False, profile=77),
    "progressive_high": dict(interlaced=False, profile=100),
    "progressive_baseline": dict(interlaced=False, profile=66),
    "interlaced_main": dict(interlaced=True, profile=77),
}


@pytest.fixture(scope="session")
def ref_flags264(tmp_path_factory):
    if not (REF / "flags264.c").exists():
        return None
    out = tmp_path_factory.mktemp("refbin") / "flags264"
    subprocess.run(["gcc", "-O2", "-D_FILE_OFFSET_BITS=64",
                    str(REF / "flags264.c"), "-o", str(out)], check=True)
    return out


@pytest.mark.parametrize("name", sorted(STREAMS))
def test_flags264_parity(name, ref_flags264, tmp_path):
    es = h264_gen.make_stream(**STREAMS[name])
    infile = tmp_path / f"{name}.264"
    infile.write_bytes(es)
    ours = native.run("flags264", [str(infile)], capture_output=True)
    assert ours.returncode == 0, ours.stderr
    if ref_flags264 is not None:
        theirs = subprocess.run([str(ref_flags264), str(infile)],
                                capture_output=True)
        assert ours.stdout.decode() == theirs.stdout.decode()
        # refresh golden so CI-without-reference still has a check
        (GOLDEN / f"flags264_{name}.txt").write_bytes(theirs.stdout)
    else:
        expect = (GOLDEN / f"flags264_{name}.txt").read_bytes()
        assert ours.stdout == expect


def test_flags264_usage():
    proc = native.run("flags264", [], capture_output=True)
    assert proc.returncode == 255
    assert b"usage: flags264" in proc.stderr
