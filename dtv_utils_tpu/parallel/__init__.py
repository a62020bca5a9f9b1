"""Multi-device execution: sequence-parallel sharding of the sample stream."""

from dtv_utils_tpu.parallel.stream import (derive_state, sharded_dvbt_modulator,
                                           make_mesh)

__all__ = ["derive_state", "sharded_dvbt_modulator", "make_mesh"]
