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

# MT_TEST_TPU=1: keep the real device backend so the TPU-only kernel tests
# (Pallas row-DMA bit-identity) run on the chip — use with a targeted
# selection (e.g. -k PallasRowDMA); the 8-device sharding tests need the
# virtual CPU mesh and will not fit one chip.
if os.environ.get("MT_TEST_TPU", "0") != "1":
    jax.config.update("jax_platforms", "cpu")

# Persistent XLA compile cache: the suite's cost is dominated by repeated
# jit compiles of near-identical step programs; a warm cache cuts a
# compile-bound test ~3.5x (measured: first train_step 12.9s cold ->
# 3.6s warm). Safe across versions (the cache key includes them).
jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("MT_TEST_COMPILE_CACHE", "/tmp/monolith_tpu_test_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)


import pytest  # noqa: E402


@pytest.fixture(autouse=True)
def _drain_devices():
    """Block on all pending async work at each test boundary.

    With 8 virtual devices multiplexed on few (here: one) host cores, a
    collective program left half-executed by a test that never synced can
    deadlock against the next test's compile/execute load: XLA's CPU
    rendezvous aborts the whole process after 40 s ("Expected 8 threads to
    join... only 5 arrived"). A trivial device_put per device queues behind
    all pending work (per-device FIFO), so blocking on them drains the
    machine before the next test starts."""
    yield
    try:
        for d in jax.devices():
            jax.device_put(0, d).block_until_ready()
    except Exception:
        pass
