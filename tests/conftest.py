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
        flags = (flags + " --xla_force_host_platform_device_count=8").strip()
    # XLA:CPU collective rendezvous: all 8 virtual devices' partition
    # threads must join each collective; the default 40 s termination
    # timeout ABORTS the whole process ("Exiting to ensure a consistent
    # program state") when this 1-core host schedules the last participant
    # late — reproduced ~1-in-6 on the 8-device eval step with sample
    # metrics, in a fresh process, with no other device work in flight.
    # Late-on-a-loaded-host is not stuck: raise the termination timeout so
    # slow scheduling completes instead of killing the suite.
    if "collective_call_terminate_timeout" not in flags:
        flags += (
            " --xla_cpu_collective_call_warn_stuck_timeout_seconds=120"
            " --xla_cpu_collective_call_terminate_timeout_seconds=900"
        )
    os.environ["XLA_FLAGS"] = flags

import jax  # noqa: E402
import numpy as np  # noqa: E402
import pytest  # noqa: E402

# The JAX_PLATFORMS env var is overridden by the axon TPU plugin in this
# environment; the config flag is authoritative.
if not _ON_TPU:
    jax.config.update("jax_platforms", "cpu")
    # Serialize CPU device programs.  XLA:CPU runs each virtual device's
    # partition of a collective program on a shared thread pool sized for
    # ONE program; with async dispatch two programs can be in flight (e.g.
    # the eval step for batch i+1 and the metric update for batch i), the
    # second's partitions starve, and the collective rendezvous ABORTS the
    # process after 40 s ("Termination timeout for all gather ... Exiting
    # to ensure a consistent program state" — observed intermittently in
    # the mesh half of test_pipeline_metric_warm_hits_end_to_end).  Sync
    # dispatch guarantees all 8 pool threads are free for each program.
    jax.config.update("jax_cpu_enable_async_dispatch", False)

# Persistent compilation cache: XLA CPU compiles are the dominant test cost
# on this 1-core host; cache them across pytest runs.  HFT_TEST_NO_COMPILE_CACHE=1
# disables it (diagnostic knob: cache-loaded XLA:CPU executables go through
# cpu_aot_loader.cc and are suspected in intermittent collective aborts).
if os.environ.get("HFT_TEST_NO_COMPILE_CACHE") != "1":
    _CACHE_DIR = os.path.join(os.path.dirname(__file__), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)


@pytest.fixture(scope="session")
def devices():
    return jax.devices()
