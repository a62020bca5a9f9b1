"""Randomized sweep parity: rate oracles + papr vs reference binaries
compiled unmodified from /root/reference at test time.

The committed goldens (test_rates.py / test_papr.py) keep CI reference-less;
this module is the exhaustiveness pass over the huge config spaces
(dvbt2rate.c:107-186 — 11 args; atsc3rate.c:154-193 — 14-15 args;
dvbs2rate.c:112-166 option/rate space), a few hundred randomized configs per
tool, stdout diffed byte-for-byte.  Skipped when /root/reference or a C
compiler is unavailable.
"""

import pathlib
import shutil
import subprocess

import numpy as np
import pytest

REF = pathlib.Path("/root/reference")

pytestmark = pytest.mark.skipif(
    not REF.exists() or shutil.which("gcc") is None,
    reason="reference tree or gcc unavailable")


@pytest.fixture(scope="session")
def refbin(tmp_path_factory):
    d = tmp_path_factory.mktemp("refrates")
    out = {}
    for name, extra in (("dvbtrate", []), ("dvbs2rate", ["-lm"]),
                        ("dvbt2rate", ["-lm"]), ("atsc3rate", ["-lm"]),
                        ("papr", ["-lm"])):
        src = REF / f"{name}.c"
        if not src.exists():
            continue
        binp = d / name
        subprocess.run(["gcc", "-O2", str(src), "-o", str(binp)] + extra,
                       check=True)
        out[name] = binp
    return out


def ref_out(refbin, tool, args):
    return subprocess.run([str(refbin[tool])] + [str(a) for a in args],
                          capture_output=True, text=True).stdout


def test_dvbtrate_sweep(refbin):
    from dtv_utils_tpu.rates import dvbt
    for bw in range(1, 13):
        assert dvbt.format_report(bw) == ref_out(refbin, "dvbtrate", [bw]), bw


def test_dvbs2rate_sweep(refbin):
    from dtv_utils_tpu.rates import dvbs2
    rng = np.random.default_rng(0x52A7E)
    rates = [f"{r:.6g}" for r in rng.uniform(1e5, 6e7, size=40)]
    rates += ["27500000", "1", "0.5", "123456789"]
    for opts in ("", "s", "x", "sx", "v", "sv", "xv", "sxv"):
        for r in rates[:12] if opts else rates:
            args = ([f"-{opts}", r] if opts else [r])
            got = dvbs2.format_report(float(r), short="s" in opts,
                                      s2x="x" in opts, vlsnr="v" in opts)
            assert got == ref_out(refbin, "dvbs2rate", args), (opts, r)


def test_dvbt2rate_sweep(refbin):
    """~400 random draws over the full 11-arg space (valid enum ranges —
    outside them the C truncates with int division by zero / UB), plus the
    documented corner cases: 1.7 MHz clock, every FC-suppression pair,
    32K even-symbol forcing, short frames with rates 7/8."""
    from dtv_utils_tpu.rates import dvbt2
    rng = np.random.default_rng(0x72A7E)

    def check(args):
        args = [str(a) for a in args]
        got = dvbt2.format_report(args)
        want = ref_out(refbin, "dvbt2rate", args)
        assert got == want, args

    for _ in range(360):
        framesize = int(rng.integers(0, 2))
        rate = int(rng.integers(1, 9)) if framesize else int(
            rng.integers(1, 7))
        check([
            int(rng.choice([0, 1, 5, 6, 7, 8, 10])),     # bandwidth
            int(rng.choice([1, 2, 4, 8, 16, 32])),       # fft (K)
            int(rng.integers(0, 7)),                     # guard
            int(rng.integers(1, 600)),                   # data symbols
            int(rng.integers(1, 400)),                   # fec blocks
            rate,
            int(rng.integers(1, 7)),                     # constellation
            framesize,
            int(rng.integers(0, 2)),                     # carrier mode
            int(rng.integers(1, 9)),                     # pilot pattern
            int(rng.integers(0, 4)),                     # L1 modulation
        ])
    # corner cases
    for gi, pp in ((3, 7), (4, 4), (0, 2), (1, 2)):      # FC suppression set
        check([8, 32, gi, 59, 202, 4, 4, 0, 1, pp, 3])
    check([0, 8, 1, 100, 50, 2, 2, 1, 0, 5, 1])          # 1.7 MHz clock
    check([8, 32, 6, 68, 202, 4, 4, 0, 1, 7, 3])         # 32K even forcing
    check([8, 16, 5, 100, 31, 7, 3, 1, 0, 7, 2])         # short rate 1/3
    check([8, 16, 5, 100, 31, 8, 3, 1, 0, 7, 2])         # short rate 2/5


def test_atsc3rate_sweep(refbin):
    """~300 random draws over the 14/15-arg space + HTI sizing paths."""
    from dtv_utils_tpu.rates import atsc3
    rng = np.random.default_rng(0xA75C3)

    def check(args):
        args = [str(a) for a in args]
        got = atsc3.format_report(args)
        want = ref_out(refbin, "atsc3rate", args)
        assert got == want, args

    for i in range(300):
        args = [
            int(rng.choice([8, 16, 32])),                # fft (K)
            int(rng.integers(1, 13)),                    # guard interval
            int(rng.integers(8, 200)),                   # payload symbols
            int(rng.integers(1, 8)),                     # preamble symbols
            int(rng.integers(2, 14)),                    # rate (n/15)
            int(rng.integers(0, 6)),                     # constellation
            int(rng.integers(0, 2)),                     # frame size
            int(rng.integers(0, 16)),                    # pilot pattern
            int(rng.integers(0, 2)),                     # first SBS
            int(rng.integers(1, 6)),                     # L1 basic mode
            int(rng.integers(1, 8)),                     # L1 detail mode
            int(rng.integers(0, 5)),                     # cred
            int(rng.integers(0, 5)),                     # pilot boost
            int(rng.integers(0, 2)),                     # papr mode
        ]
        if i % 3 == 0:                                   # HTI PLP size path
            args.append(int(rng.integers(1, 4000)))
        check(args)


def _cfile(path, data):
    np.asarray(data, dtype=np.float32).tofile(path)


def test_papr_sweep(refbin, tmp_path):
    """Live-compile papr parity: random/structured cfiles, both modes."""
    from dtv_utils_tpu.analysis import papr as P

    rng = np.random.default_rng(0x9A92)
    cases = {
        "gauss": rng.standard_normal(4096).astype(np.float32),
        "allneg": -np.abs(rng.standard_normal(512)).astype(np.float32),
        "const": np.full(1024, 0.25, np.float32),
        "spike": np.concatenate([np.full(2048, 0.01, np.float32),
                                 np.asarray([7.5], np.float32),
                                 np.full(2047, 0.01, np.float32)]),
        "odd_tail": rng.standard_normal(1001).astype(np.float32),
        # odd tail PAST the first 16384-float chunk: the reference pairs the
        # trailing float with STALE buffer content from the previous chunk
        "odd_tail_stale": rng.standard_normal(16384 * 2 + 4097).astype(
            np.float32),
        "empty": np.empty(0, np.float32),
    }
    import contextlib
    import io
    for name, data in cases.items():
        f = tmp_path / f"{name}.cfile"
        _cfile(f, data)
        for flags in ([], ["-g"]):
            want = subprocess.run([str(refbin["papr"])] + flags + [str(f)],
                                  capture_output=True, text=True).stdout
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                rc = P.cli(flags + [str(f)])
            assert rc == 0
            assert buf.getvalue() == want, (name, flags)
