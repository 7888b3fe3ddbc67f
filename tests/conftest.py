"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is not available in CI; sharding correctness is
validated on host-platform virtual devices (the driver separately dry-runs
the multi-chip path via __graft_entry__.dryrun_multichip).
"""

import os

# HFT_TEST_ON_TPU=1 escapes the CPU forcing so the TPU-gated tests
# (@requires_tpu: demo smoke, binned-rasterizer agreement) can run against
# the real chip:  HFT_TEST_ON_TPU=1 python -m pytest tests/... -k tpu
_ON_TPU = os.environ.get("HFT_TEST_ON_TPU") == "1"

if not _ON_TPU:
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()

import jax  # noqa: E402
import numpy as np  # noqa: E402
import pytest  # noqa: E402

# The JAX_PLATFORMS env var is overridden by the axon TPU plugin in this
# environment; the config flag is authoritative.
if not _ON_TPU:
    jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: XLA CPU compiles are the dominant test cost
# on this 1-core host; cache them across pytest runs.
_CACHE_DIR = os.path.join(os.path.dirname(__file__), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)


@pytest.fixture(scope="session")
def devices():
    return jax.devices()
