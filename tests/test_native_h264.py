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


@pytest.fixture(scope="session")
def ref_h264_parse(tmp_path_factory):
    src = REF / "h264_parse"
    if not src.exists():
        return None
    # The vendored win32 stdint.h shadows the system header and getopt.c is
    # K&R C; stage the sources minus stdint.h and use system getopt_long.
    stage = tmp_path_factory.mktemp("refh264")
    for f in src.iterdir():
        if f.name != "stdint.h":
            (stage / f.name).symlink_to(f)
    out = tmp_path_factory.mktemp("refbin2") / "h264_parse"
    subprocess.run(["g++", "-O2", "-D_FILE_OFFSET_BITS=64", "-DHAVE_GETOPT_H",
                    "-DHAVE_GETOPT_LONG", "-DHAVE_UNISTD_H",
                    str(stage / "main.cpp"), "-o", str(out)],
                   check=True, cwd=stage)
    return out


def _run_as(binary, argv0, args):
    return subprocess.run([argv0] + args, executable=str(binary),
                          capture_output=True)


H264P_STREAMS = dict(STREAMS)
H264P_STREAMS["extended"] = None  # uses make_extended_stream


@pytest.mark.parametrize("name", sorted(H264P_STREAMS))
def test_h264_parse_parity(name, ref_h264_parse, tmp_path):
    if name == "extended":
        es = h264_gen.make_extended_stream()
    else:
        es = h264_gen.make_stream(**H264P_STREAMS[name])
    infile = tmp_path / f"{name}.264"
    infile.write_bytes(es)
    # identical argv[0] for both so the version banner matches
    ours = _run_as(native.tool_path("h264_parse"), "h264_parse",
                   [str(infile)])
    assert ours.returncode == 0, ours.stderr
    if ref_h264_parse is not None:
        theirs = _run_as(ref_h264_parse, "h264_parse", [str(infile)])
        assert ours.stdout.decode() == theirs.stdout.decode()
        (GOLDEN / f"h264_parse_{name}.txt").write_bytes(theirs.stdout)
    else:
        expect = (GOLDEN / f"h264_parse_{name}.txt").read_bytes()
        assert ours.stdout == expect


def test_h264_parse_version_and_usage():
    out = _run_as(native.tool_path("h264_parse"), "h264_parse", ["-v"])
    assert b"mpeg4ip version 1.5.0.1" in out.stderr
    out = _run_as(native.tool_path("h264_parse"), "h264_parse", [])
    assert out.returncode == 1
    assert b"usage: h264_parse" in out.stderr


def test_flags264_usage():
    proc = native.run("flags264", [], capture_output=True)
    assert proc.returncode == 255
    assert b"usage: flags264" in proc.stderr
