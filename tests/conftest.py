"""Test harness: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding is validated without TPU hardware by forcing the host
platform to present 8 XLA CPU devices (the driver separately dry-runs the
multi-chip path via __graft_entry__.dryrun_multichip).

NOTE: the session environment pins JAX_PLATFORMS=axon (a remote TPU tunnel),
and auto-loaded pytest plugins (jaxtyping et al.) import jax before this
conftest runs — so setting os.environ here is not enough; jax.config must be
updated explicitly before any backend initializes.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
