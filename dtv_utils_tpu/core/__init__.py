"""Core primitives: Galois-field linear algebra, LFSR/PRBS sequences, bit ops,
and typed configuration for every broadcast standard in the framework."""

from dtv_utils_tpu.core.galois import GF, GF256, GF128, gf2_matmul  # noqa: F401
from dtv_utils_tpu.core import prbs, bits, config  # noqa: F401
