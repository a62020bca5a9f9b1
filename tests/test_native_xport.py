"""Native xport vs the reference binary: stdout AND demuxed files."""

import pathlib
import subprocess

import pytest

import ts_gen
from dtv_utils_tpu.analysis import native

REF = pathlib.Path("/root/reference")
GOLDEN = pathlib.Path(__file__).parent / "golden"


@pytest.fixture(scope="session")
def ref_xport(tmp_path_factory):
    if not (REF / "xport.c").exists():
        return None
    out = tmp_path_factory.mktemp("refxp") / "xport"
    subprocess.run(["gcc", "-O2", "-D_FILE_OFFSET_BITS=64",
                    str(REF / "xport.c"), "-o", str(out)], check=True)
    return out


def run_in(tmp, binary, args):
    d = tmp / "run"
    d.mkdir(parents=True, exist_ok=True)
    proc = subprocess.run([str(binary)] + args, capture_output=True, cwd=d)
    files = {}
    for f in sorted(d.iterdir()):
        if f.name.startswith("bits"):
            files[f.name] = f.read_bytes()
            f.unlink()
    return proc, files


CASES = {
    "basic": (dict(), ["{ts}", "1", "1", "1"]),
    "pts_dump": (dict(), ["-av", "{ts}", "1", "1", "1"]),
    "parse_only": (dict(), ["-pvis", "{ts}", "1", "1", "1"]),
    "pes_mode": (dict(), ["-z", "{ts}", "1", "1", "1"]),
    "no_gop": (dict(with_gop=False), ["-t", "{ts}", "1", "1", "1"]),
    "progressive": (dict(progressive=1), ["{ts}", "1", "1", "1"]),
    "cc_error": (dict(cc_error=True, garbage=True),
                 ["-r", "{ts}", "1", "1", "1"]),
    "psip": (dict(psip=True), ["-gs", "{ts}", "1", "1", "1"]),
    "dump_pids": (dict(), ["-ds", "{ts}", "1", "1", "1"]),
}


@pytest.mark.parametrize("name", sorted(CASES))
def test_xport_parity(name, ref_xport, tmp_path):
    kwargs, argt = CASES[name]
    ts = tmp_path / "in.ts"
    ts.write_bytes(ts_gen.make_ts(**kwargs))
    args = [a.format(ts=ts) for a in argt]
    ours, our_files = run_in(tmp_path / "ours", native.tool_path("xport"),
                             args)
    assert ours.returncode == 0, ours.stderr
    if ref_xport is not None:
        theirs, ref_files = run_in(tmp_path / "ref", ref_xport, args)
        assert ours.stdout.decode() == theirs.stdout.decode()
        assert our_files.keys() == ref_files.keys()
        for k in ref_files:
            assert our_files[k] == ref_files[k], f"{k} differs"
        (GOLDEN / f"xport_{name}.txt").write_bytes(theirs.stdout)
    else:
        expect = (GOLDEN / f"xport_{name}.txt").read_bytes()
        assert ours.stdout == expect


AV_CASES = {
    "h264_ac3": (dict(video="h264", audio="ac3"), ["{ts}", "1", "1", "1"]),
    "h264_ac3_pts": (dict(video="h264", audio="ac3"),
                     ["-avi", "{ts}", "1", "1", "1"]),
    "vc1_ac3": (dict(video="vc1", audio="ac3"), ["{ts}", "1", "1", "1"]),
    "lpcm": (dict(video="h264", audio="lpcm", hdmv=True),
             ["-h", "{ts}", "1", "1", "1"]),
    "lpcm_stereo_extract": (dict(video="h264", audio="lpcm", hdmv=True,
                                 lpcm_flags=0x8140),
                            ["-h2e", "{ts}", "1", "1", "1"]),
}


@pytest.mark.parametrize("name", sorted(AV_CASES))
def test_xport_av_parity(name, ref_xport, tmp_path):
    kwargs, argt = AV_CASES[name]
    ts = tmp_path / "in.ts"
    ts.write_bytes(ts_gen.make_av_ts(**kwargs))
    args = [a.format(ts=ts) for a in argt]
    ours, our_files = run_in(tmp_path / "ours", native.tool_path("xport"),
                             args)
    assert ours.returncode == 0, ours.stderr
    if ref_xport is not None:
        theirs, ref_files = run_in(tmp_path / "ref", ref_xport, args)
        assert ours.stdout.decode() == theirs.stdout.decode()
        assert our_files.keys() == ref_files.keys()
        for k in ref_files:
            assert our_files[k] == ref_files[k], f"{k} differs"
        (GOLDEN / f"xport_{name}.txt").write_bytes(theirs.stdout)
    else:
        expect = (GOLDEN / f"xport_{name}.txt").read_bytes()
        assert ours.stdout == expect


def test_xport_usage():
    proc = native.run("xport", [], capture_output=True)
    assert proc.returncode == 255
    assert b"xport Transport Stream Demuxer 1.1" in proc.stderr


def test_xport_force_mode(ref_xport, tmp_path):
    """-f: PIDs and video stream type forced from hex argv (xport.c:221-230)."""
    ts = tmp_path / "in.ts"
    ts.write_bytes(ts_gen.make_av_ts(video="mpeg2", audio="ac3"))
    args = ["-fs", str(ts), "31", "34", "2"]   # hex video pid/audio pid/type
    ours, our_files = run_in(tmp_path / "ours", native.tool_path("xport"),
                             args)
    assert ours.returncode == 0, ours.stderr
    if ref_xport is not None:
        theirs, ref_files = run_in(tmp_path / "ref", ref_xport, args)
        assert ours.stdout.decode() == theirs.stdout.decode()
        assert our_files == ref_files
        (GOLDEN / "xport_force_mode.txt").write_bytes(theirs.stdout)
    else:
        assert ours.stdout == (GOLDEN / "xport_force_mode.txt").read_bytes()


def test_xport_hdmv_arrival_stamps(ref_xport, tmp_path):
    """-he: HDMV 192-byte packets with arrival_time_stamp delta dump."""
    ts = tmp_path / "in.m2ts"
    ts.write_bytes(ts_gen.make_av_ts(video="h264", audio="lpcm", hdmv=True))
    args = ["-hes", str(ts), "1", "1", "1"]
    ours, our_files = run_in(tmp_path / "ours", native.tool_path("xport"),
                             args)
    assert ours.returncode == 0, ours.stderr
    if ref_xport is not None:
        theirs, ref_files = run_in(tmp_path / "ref", ref_xport, args)
        assert ours.stdout.decode() == theirs.stdout.decode()
        assert our_files == ref_files
        (GOLDEN / "xport_hdmv_extra.txt").write_bytes(theirs.stdout)
    else:
        assert ours.stdout == (GOLDEN / "xport_hdmv_extra.txt").read_bytes()


def test_xport_corruption_fuzz(ref_xport, tmp_path):
    """Randomized TS corruption over every codec combo, diffed against the
    reference binary.  Trials where the reference itself crashes (it is not
    bounds-checked; ours is) are skipped — see native/README.md."""
    if ref_xport is None:
        pytest.skip("reference sources not present")
    import itertools
    import random

    rng = random.Random(20260820)
    combos = list(itertools.product(["h264", "vc1", "mpeg2"],
                                    ["ac3", "mp2", "lpcm"]))
    checked = 0
    for t in range(24):
        video, audio = combos[t % len(combos)]
        hdmv = audio == "lpcm"
        ts = bytearray(ts_gen.make_av_ts(video=video, audio=audio,
                                         hdmv=hdmv, seed=rng.randrange(10000)))
        for _ in range(rng.randrange(0, 12)):
            ts[rng.randrange(len(ts))] = rng.randrange(256)
        if rng.random() < 0.5:
            psz = 192 if hdmv else 188
            k = rng.randrange(0, len(ts) // psz)
            del ts[k * psz:(k + rng.randrange(1, 4)) * psz]
        tsf = tmp_path / "fuzz.ts"
        tsf.write_bytes(bytes(ts))
        args = rng.choice([[], ["-t"], ["-avi"], ["-z"],
                           ["-h"] if hdmv else ["-r"],
                           ["-h2"] if hdmv else ["-s"]])
        argv = args + [str(tsf), "1", "1", "1"]
        theirs, ref_files = run_in(tmp_path / "ref", ref_xport, argv)
        if theirs.returncode != 0:  # reference crashed on this input
            continue
        ours, our_files = run_in(tmp_path / "ours",
                                 native.tool_path("xport"), argv)
        assert ours.stdout == theirs.stdout, f"trial {t}: {video}/{audio} {args}"
        assert our_files == ref_files, f"trial {t}: {video}/{audio} {args}"
        checked += 1
    assert checked >= 15  # the vast majority of trials must actually compare
