"""Loadable EN 302 755 annex data with structural validation.

The DVB-T2 annex tables that are pure numeric data with no generative rule
(LDPC parity addresses, continual-pilot sets, tone-reservation positions)
cannot be re-derived; where certified values are unavailable the modulator
falls back to structure-exact stand-ins (see tx/dvbt2_tables.py and
PARITY.md).  This module is the drop-in path for the real data: place a
file under ``dtv_utils_tpu/data/t2/`` and every consumer picks it up, after
the table passes the structural constraints the standard forces — so a
mis-transcribed table fails loudly instead of silently desyncing.

File formats (plain text, ``#`` comments allowed):

  ldpc_<nldpc>_<num>_<den>.txt   one annex row per line: the parity-bit
                                 accumulator addresses of the first bit of
                                 each 360-bit group (EN 302 755 annex A)
  cp_<fft>.txt                   continual-pilot carrier indices, one per
                                 line (annex table, union of CP groups)
  tr_<fft>.txt                   tone-reservation carrier indices for data
                                 symbols (annex H), one per line
  tr_p2_<fft>.txt                tone-reservation carrier indices for P2
                                 symbols (annex H), one per line
"""

from __future__ import annotations

import functools
import pathlib

import numpy as np

DATA_DIR = pathlib.Path(__file__).resolve().parent.parent / "data" / "t2"


def _read_rows(path: pathlib.Path) -> list[list[int]]:
    rows = []
    for line in path.read_text().splitlines():
        line = line.split("#", 1)[0].strip().replace(",", " ")
        if line:
            rows.append([int(tok) for tok in line.split()])
    return rows


class AnnexDataError(ValueError):
    """A provided annex data file violates a structural constraint the
    standard forces — refuse to modulate with it."""


@functools.cache
def ldpc_rows(nldpc: int, num: int, den: int, kldpc: int
              ) -> tuple[tuple[int, ...], ...] | None:
    """Annex-A accumulator rows for code rate num/den at frame size nldpc,
    or None when no data file is installed.  kldpc is passed explicitly
    because short-frame codes have Kldpc != Nldpc*num/den (the nominal rate
    names an effective-rate family, EN 302 755 table 6).

    Structural validation: kldpc/360 rows; every address in [0, nldpc -
    kldpc); an IRA profile (a minority of high-degree rows followed by
    degree-3 rows, all rows of one of exactly two distinct degrees).
    """
    path = DATA_DIR / f"ldpc_{nldpc}_{num}_{den}.txt"
    if not path.exists():
        return None
    n_parity = nldpc - kldpc
    rows = _read_rows(path)
    if len(rows) != kldpc // 360:
        raise AnnexDataError(
            f"{path.name}: {len(rows)} rows, expected {kldpc // 360}")
    degrees = sorted({len(r) for r in rows})
    if not (len(degrees) <= 2 and degrees[0] >= 3):
        raise AnnexDataError(f"{path.name}: degree profile {degrees} is not "
                             "an IRA two-level profile")
    for i, r in enumerate(rows):
        if any(a < 0 or a >= n_parity for a in r):
            raise AnnexDataError(
                f"{path.name} row {i}: address outside [0, {n_parity})")
        if len(set(r)) != len(r):
            raise AnnexDataError(f"{path.name} row {i}: repeated address")
    return tuple(tuple(r) for r in rows)


def _read_index_set(path: pathlib.Path, k_max: int) -> np.ndarray | None:
    if not path.exists():
        return None
    vals = [v for row in _read_rows(path) for v in row]
    arr = np.asarray(sorted(vals), dtype=np.int32)
    if len(np.unique(arr)) != len(arr):
        raise AnnexDataError(f"{path.name}: repeated carrier index")
    if len(arr) and (arr[0] < 0 or arr[-1] >= k_max):
        raise AnnexDataError(f"{path.name}: index outside [0, {k_max})")
    return arr


@functools.cache
def continual_pilots(fft: int, k_max: int) -> np.ndarray | None:
    """Continual-pilot carrier set for the FFT size, or None."""
    return _read_index_set(DATA_DIR / f"cp_{fft}.txt", k_max)


@functools.cache
def tr_positions(fft: int, k_max: int, n_tr: int,
                 p2: bool = False) -> np.ndarray | None:
    """Annex-H tone-reservation set (exactly n_tr entries), or None."""
    name = f"tr_p2_{fft}.txt" if p2 else f"tr_{fft}.txt"
    arr = _read_index_set(DATA_DIR / name, k_max)
    if arr is not None and len(arr) != n_tr:
        raise AnnexDataError(
            f"{name}: {len(arr)} entries, expected {n_tr} "
            "(dvbt2rate.c:1108-1196 TR cell count)")
    return arr


@functools.cache
def column_twist(nldpc: int, nc: int) -> tuple[int, ...] | None:
    """§6.1.3 table-9/10 column-twist offsets tc for an Nc-column
    interleaver at frame size nldpc (``twist_<nldpc>_<nc>.txt``: the Nc
    offsets on one or more lines), or None when no file is installed.

    Structural validation: exactly Nc values, each in [0, Nr) where
    Nr = nldpc / Nc."""
    path = DATA_DIR / f"twist_{nldpc}_{nc}.txt"
    if not path.exists():
        return None
    vals = [v for row in _read_rows(path) for v in row]
    nr = nldpc // nc
    if len(vals) != nc:
        raise AnnexDataError(f"{path.name}: {len(vals)} offsets, "
                             f"expected {nc}")
    if any(v < 0 or v >= nr for v in vals):
        raise AnnexDataError(f"{path.name}: offset outside [0, {nr})")
    return tuple(vals)


@functools.cache
def demux_map(n_substreams: int) -> tuple[int, ...] | None:
    """§6.2 table-12 bit-to-substream map (``demux_<nsub>.txt``: for each
    substream d in order, the output bit position y of substream d), or
    None when no file is installed.

    Structural validation: a permutation of 0..n_substreams-1."""
    path = DATA_DIR / f"demux_{n_substreams}.txt"
    if not path.exists():
        return None
    vals = [v for row in _read_rows(path) for v in row]
    if sorted(vals) != list(range(n_substreams)):
        raise AnnexDataError(
            f"{path.name}: not a permutation of 0..{n_substreams - 1}")
    return tuple(vals)
