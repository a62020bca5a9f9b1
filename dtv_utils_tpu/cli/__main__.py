"""Dispatch for ``python -m dtv_utils_tpu.cli``.

``DTV_PLATFORM=cpu`` (or tpu/...) pins the JAX backend before any jax use —
needed because the environment's sitecustomize registers the axon TPU plugin
in every interpreter, and ``JAX_PLATFORMS`` alone does not stick.
"""

import os
import sys

if os.environ.get("DTV_PLATFORM"):
    import jax

    jax.config.update("jax_platforms", os.environ["DTV_PLATFORM"])

from dtv_utils_tpu.cli.main import main

sys.exit(main(sys.argv[1:]))
