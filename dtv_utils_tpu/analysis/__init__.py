"""IQ stream analysis: PAPR/CCDF (device-accelerated) and stream statistics."""

from dtv_utils_tpu.analysis import papr  # noqa: F401
