"""Annex-data loading layer: files under dtv_utils_tpu/data/t2/ replace the
structure-exact stand-ins, and structurally invalid tables are refused."""

import numpy as np
import pytest

from dtv_utils_tpu.tx import dvbt2_tables as T
from dtv_utils_tpu.tx import t2_annex


@pytest.fixture
def data_dir(tmp_path, monkeypatch):
    monkeypatch.setattr(t2_annex, "DATA_DIR", tmp_path)
    loaders = (t2_annex.ldpc_rows, t2_annex.continual_pilots,
               t2_annex.tr_positions, t2_annex.column_twist,
               t2_annex.demux_map, t2_annex.scalar,
               t2_annex.lfsr_wires, t2_annex.lfsr_feedback)
    for fn in loaders:
        fn.cache_clear()
    yield tmp_path
    for fn in loaders:
        fn.cache_clear()


def test_missing_files_fall_back(data_dir):
    assert t2_annex.ldpc_rows(64800, 2, 3, 43200) is None
    assert t2_annex.continual_pilots(32768, 27841) is None
    assert t2_annex.tr_positions(32768, 27841, 288) is None


def test_ldpc_file_loads_and_is_consumed(data_dir):
    # a tiny structurally-valid stand-in "annex" for rate 2/3 64800:
    # 120 rows, 13 addresses for the first 15 rows then 3, all < 21600
    rng = np.random.default_rng(5)
    rows = [sorted(rng.choice(21600, size=(13 if g < 15 else 3),
                              replace=False).tolist()) for g in range(120)]
    path = data_dir / "ldpc_64800_2_3.txt"
    path.write_text("# test table\n" + "\n".join(
        " ".join(map(str, r)) for r in rows))
    got = t2_annex.ldpc_rows(64800, 2, 3, 43200)
    assert got == tuple(tuple(r) for r in rows)
    # the table module picks it up (rate_idx 3 = 2/3)
    T.ldpc_accumulator_rows.cache_clear()
    try:
        assert T.ldpc_accumulator_rows(3, 64800, 43200) == got
    finally:
        T.ldpc_accumulator_rows.cache_clear()


@pytest.mark.parametrize("mutate, err", [
    (lambda rows: rows[:-1], "rows"),                       # wrong row count
    (lambda rows: rows[:-1] + [[1, 2, 99999]], "address"),  # out of range
    (lambda rows: rows[:-1] + [[5, 5, 7]], "repeated"),     # dup address
    (lambda rows: [r[:2] for r in rows], "profile"),        # degree < 3
])
def test_ldpc_structural_validation(data_dir, mutate, err):
    rng = np.random.default_rng(6)
    rows = [sorted(rng.choice(21600, size=(13 if g < 15 else 3),
                              replace=False).tolist()) for g in range(120)]
    rows = mutate(rows)
    (data_dir / "ldpc_64800_2_3.txt").write_text(
        "\n".join(" ".join(map(str, r)) for r in rows))
    with pytest.raises(t2_annex.AnnexDataError, match=err):
        t2_annex.ldpc_rows(64800, 2, 3, 43200)


def test_tr_count_enforced(data_dir):
    (data_dir / "tr_1024.txt").write_text(
        "\n".join(map(str, [109, 117, 122, 129, 139, 321, 350, 403, 459])))
    with pytest.raises(t2_annex.AnnexDataError, match="expected 10"):
        t2_annex.tr_positions(1024, 853, 10)


def test_cp_set_loads(data_dir):
    (data_dir / "cp_1024.txt").write_text("116\n255\n285\n430\n")
    got = t2_annex.continual_pilots(1024, 853)
    assert got.tolist() == [116, 255, 285, 430]


def test_cp_rejects_out_of_band(data_dir):
    (data_dir / "cp_1024.txt").write_text("116\n9999\n")
    with pytest.raises(t2_annex.AnnexDataError):
        t2_annex.continual_pilots(1024, 853)


def test_twist_file_loads_and_is_consumed(data_dir):
    (data_dir / "twist_64800_12.txt").write_text(
        "0 0 0 2 2 2 3 3 3 6 7 7\n")
    assert t2_annex.column_twist(64800, 12) == (0, 0, 0, 2, 2, 2,
                                                3, 3, 3, 6, 7, 7)
    # consumed by the bit interleaver builder
    from dtv_utils_tpu.core.config import Dvbt2Config
    T.bit_interleaver_perm.cache_clear()
    try:
        perm = T.bit_interleaver_perm(Dvbt2Config())
        assert perm is not None and len(perm) == 64800
        assert sorted(perm.tolist()) == list(range(64800))
    finally:
        T.bit_interleaver_perm.cache_clear()


def test_twist_structural_validation(data_dir):
    (data_dir / "twist_64800_12.txt").write_text("0 0 0\n")
    with pytest.raises(t2_annex.AnnexDataError, match="offsets"):
        t2_annex.column_twist(64800, 12)
    t2_annex.column_twist.cache_clear()
    (data_dir / "twist_64800_12.txt").write_text(
        "0 0 0 2 2 2 3 3 3 6 7 99999\n")
    with pytest.raises(t2_annex.AnnexDataError, match="outside"):
        t2_annex.column_twist(64800, 12)


def test_demux_file_loads_and_is_consumed(data_dir):
    (data_dir / "demux_12.txt").write_text("11 7 3 10 6 2 9 5 1 8 4 0\n")
    assert t2_annex.demux_map(12) == (11, 7, 3, 10, 6, 2, 9, 5, 1, 8, 4, 0)
    from dtv_utils_tpu.core.config import Dvbt2Config
    T.demux_perm.cache_clear()
    try:
        dperm = T.demux_perm(Dvbt2Config())
        assert sorted(dperm.tolist()) == list(range(12))
    finally:
        T.demux_perm.cache_clear()


def test_demux_structural_validation(data_dir):
    (data_dir / "demux_12.txt").write_text("11 7 3 10 6 2 9 5 1 8 4 4\n")
    with pytest.raises(t2_annex.AnnexDataError, match="permutation"):
        t2_annex.demux_map(12)


def test_scalar_loader_rational_and_decimal(data_dir):
    assert t2_annex.scalar("p2_amplitude") is None      # no file -> default
    (data_dir / "scalar_p2_amplitude.txt").write_text(
        "# provenance: test\n8/3\n")
    t2_annex.scalar.cache_clear()
    assert t2_annex.scalar("p2_amplitude") == pytest.approx(8 / 3)
    t2_annex.scalar.cache_clear()
    (data_dir / "scalar_p2_amplitude.txt").write_text("1.3333\n")
    assert t2_annex.scalar("p2_amplitude") == pytest.approx(1.3333)
    t2_annex.scalar.cache_clear()
    (data_dir / "scalar_p2_amplitude.txt").write_text("1.0\n2.0\n")
    with pytest.raises(t2_annex.AnnexDataError, match="one value"):
        t2_annex.scalar("p2_amplitude")
    # consumed by the table module
    from dtv_utils_tpu.tx import dvbt2_tables as T2T
    t2_annex.scalar.cache_clear()
    (data_dir / "scalar_p2_amplitude.txt").write_text("8/3\n")
    assert T2T.p2_amplitude() == pytest.approx(8 / 3)


def test_lfsr_wire_loader(data_dir):
    assert t2_annex.lfsr_wires("ci_10", 10) is None
    (data_dir / "wires_ci_10.txt").write_text(
        "# provenance: test\n0 7 5 1 8 2 6 9 3 4\n")
    t2_annex.lfsr_wires.cache_clear()
    assert t2_annex.lfsr_wires("ci_10", 10) == (0, 7, 5, 1, 8, 2, 6, 9,
                                                3, 4)
    t2_annex.lfsr_wires.cache_clear()
    (data_dir / "wires_ci_10.txt").write_text("0 7 5 1 8 2 6 9 3 3\n")
    with pytest.raises(t2_annex.AnnexDataError, match="permutation"):
        t2_annex.lfsr_wires("ci_10", 10)
    (data_dir / "feedback_ci_10.txt").write_text("1 4\n")
    assert t2_annex.lfsr_feedback("ci_10", 10) == (1, 4)
    t2_annex.lfsr_feedback.cache_clear()
    (data_dir / "feedback_ci_10.txt").write_text("0 4\n")
    with pytest.raises(t2_annex.AnnexDataError, match="taps"):
        t2_annex.lfsr_feedback("ci_10", 10)


def test_lfsr_wires_reach_cell_interleaver(data_dir):
    # installed wires must change the generated permutation (consumption
    # path), and the result must still be a permutation
    from dtv_utils_tpu.tx import dvbt2_tables as T2T
    T2T.cell_interleaver_perm.cache_clear()
    base = T2T.cell_interleaver_perm(2048)
    (data_dir / "wires_ci_10.txt").write_text(
        "4 3 9 6 2 5 1 7 0 8\n")          # a different valid ordering
    t2_annex.lfsr_wires.cache_clear()
    T2T.cell_interleaver_perm.cache_clear()
    try:
        got = T2T.cell_interleaver_perm(2048)
        assert sorted(got.tolist()) == list(range(2048))
        assert not np.array_equal(got, base)
    finally:
        t2_annex.lfsr_wires.cache_clear()
        T2T.cell_interleaver_perm.cache_clear()


def test_demux_short_qam256_uses_tagged_file(data_dir):
    # 256-QAM short frames demux to 8 substreams via demux_8_<tag>.txt;
    # the untagged demux_8.txt (16-QAM) must NOT be used as a fallback.
    (data_dir / "demux_8.txt").write_text("7 1 4 2 5 3 6 0\n")
    assert t2_annex.demux_map(8, tag="16200_qam256") is None
    (data_dir / "demux_8_16200_qam256.txt").write_text("7 3 1 5 2 6 4 0\n")
    t2_annex.demux_map.cache_clear()
    assert t2_annex.demux_map(8, tag="16200_qam256") == (7, 3, 1, 5,
                                                         2, 6, 4, 0)


# ---------------------------------------------------------------------------
# The REAL installed files under dtv_utils_tpu/data/t2/ (round 5): load,
# validate, and reach their consumers (VERDICT r4 #2 "installed-file paths
# run, not skip").
# ---------------------------------------------------------------------------

def test_installed_twist_files_load_and_validate():
    for nldpc, nc in [(64800, 8), (64800, 12), (64800, 16),
                      (16200, 8), (16200, 12)]:
        tc = t2_annex.column_twist(nldpc, nc)
        assert tc is not None, f"twist_{nldpc}_{nc}.txt should be installed"
        assert len(tc) == nc


def test_installed_demux_files_load_and_validate():
    assert t2_annex.demux_map(8) == (7, 1, 4, 2, 5, 3, 6, 0)
    assert t2_annex.demux_map(12) == (11, 7, 3, 10, 6, 2, 9, 5, 1, 8, 4, 0)
    assert len(t2_annex.demux_map(16)) == 16
    assert t2_annex.demux_map(8, tag="16200_qam256") == (7, 3, 1, 5,
                                                         2, 6, 4, 0)


def test_installed_tr_1k_has_annex_cardinality():
    # 1K TR set: exactly 10 cells (dvbt2rate.c:1108-1196), all in-band.
    arr = t2_annex.tr_positions(1024, 853, 10)
    assert arr is not None and len(arr) == 10
    arr2 = t2_annex.tr_positions(2048, 1705, 18)
    assert arr2 is not None and len(arr2) == 18


def test_installed_files_feed_bbc_bit_interleaver():
    # The BBC profile's bit interleaver must now be built from the
    # installed twist file (values identical to the previous stand-in by
    # construction — the point is the loader path runs).
    from dtv_utils_tpu.core.config import Dvbt2Config
    from dtv_utils_tpu.models.dvbt2 import PROFILES
    from dtv_utils_tpu.tx import dvbt2_tables as T
    cfg = PROFILES["bbc"]
    assert t2_annex.column_twist(cfg.nldpc, 16) is not None
    perm = T.bit_interleaver_perm(cfg)
    assert sorted(perm.tolist()) == list(range(cfg.nldpc))


def test_table_status_reflects_installed_files():
    from dtv_utils_tpu.models.dvbt2 import PROFILES
    rows = t2_annex.table_status(PROFILES["bbc"])
    by_name = {r["name"]: r for r in rows}
    twist = by_name["column twist tc (§6.1.3 tables 9-10)"]
    assert twist["state"] == "installed"
    assert "confidence" in twist["detail"]
    ldpc = by_name["LDPC parity addresses (annex A)"]
    assert ldpc["state"] == "stand-in"


def test_tables_cli_reports_and_exit_code(capsys):
    from dtv_utils_tpu.models import dvbt2 as m
    rc = m.cli(["--tables", "--profile", "bbc"])
    out = capsys.readouterr().out
    assert rc == 3                      # stand-ins still active
    assert "INSTALLED" in out and "STAND-IN" in out
    assert "NOT decodable" in out
