"""Test harness: force JAX onto a virtual 8-device CPU mesh so every
multi-chip code path (pjit/shard_map over a Mesh) runs in CI without TPUs —
the multi-device test capability the reference lacks (SURVEY.md §4)."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The environment pre-pins JAX_PLATFORMS=axon (the TPU tunnel); a config
# update after import is the reliable way to force the CPU test mesh.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_threefry_partitionable", True)

# Persistent compilation cache: the suite jits the same tiny train steps in
# several test files/processes; caching compiled executables across pytest
# invocations cuts repeat/sharded-run wall time substantially.
jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("TACORL_TEST_CACHE", "/tmp/tacorl_tpu_test_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import pytest  # noqa: E402


@pytest.fixture
def rng():
    return jax.random.key(0)
