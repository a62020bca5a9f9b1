"""Multi-device execution: sequence-parallel sharding of the sample stream
(stream) and the multi-host distributed backend (multihost).

Attribute access is lazy: ``multihost.initialize`` must run before anything
initializes the XLA backend (jax.distributed requirement), so importing
this package must not pull in modules that touch jax at import time.
"""

import importlib

__all__ = ["derive_state", "sharded_dvbt_modulator", "make_mesh",
           "multihost", "stream"]

_STREAM_NAMES = {"derive_state", "sharded_dvbt_modulator", "make_mesh"}


def __getattr__(name):
    if name in _STREAM_NAMES:
        mod = importlib.import_module("dtv_utils_tpu.parallel.stream")
        return getattr(mod, name)
    if name in ("multihost", "stream"):
        return importlib.import_module(f"dtv_utils_tpu.parallel.{name}")
    raise AttributeError(name)
