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
               t2_annex.demux_map)
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
