"""Device-side DSP building blocks (vectorized, jit-compatible)."""

from dtv_utils_tpu.ops.rs import RsBitEncoder, DVBT_RS
from dtv_utils_tpu.ops.convcode import conv_encode, puncture_indices, PUNCTURE_PATTERNS
from dtv_utils_tpu.ops.interleave import forney_interleave, forney_carry_len

__all__ = [
    "RsBitEncoder", "DVBT_RS",
    "conv_encode", "puncture_indices", "PUNCTURE_PATTERNS",
    "forney_interleave", "forney_carry_len",
]
