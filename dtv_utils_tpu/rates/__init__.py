"""Exact bitrate calculators ("rate oracles") for every supported standard.

Each module computes whole parameter sweeps as vectorized array programs and
also provides a ``format_report`` producing byte-identical output to the
corresponding reference C tool (dvbtrate/dvbs2rate/dvbt2rate/atsc3rate), so
the reference binaries can be diffed directly.  The same math validates the
modulators: a correct TX chain consumes TS bytes at exactly the oracle rate.
"""

from dtv_utils_tpu.rates import dvbt, dvbs2  # noqa: F401
