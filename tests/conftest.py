"""Test configuration: force an 8-device virtual CPU mesh.

Multi-chip TPU hardware is unavailable in CI; all sharding tests run on a
virtual CPU mesh (XLA_FLAGS=--xla_force_host_platform_device_count=8), the
same mechanism the driver uses for `dryrun_multichip`.

Note: this image's sitecustomize registers the remote-TPU backend and
overrides the JAX_PLATFORMS env var, so the CPU platform must be forced via
jax.config AFTER import, not via the environment.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
