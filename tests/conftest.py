"""Test configuration: CPU backend with a virtual 8-device mesh, f64 on.

Tests run on CPU (per the multi-host test strategy, SURVEY §4): an
8-device virtual platform validates the sharding/mesh code paths without
TPU hardware, and float64 gives tight numeric oracles against the math.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# A pytest plugin may import jax before this conftest runs, in which case the
# env var above is read too late; backends initialize lazily, so forcing the
# platform through the config still works here.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# Persistent compile cache: the suite's long tail on a small box is XLA
# CPU compile time (~140 jitted tests); with the cache warm a rerun skips
# nearly all of it. Shared with benchmarks' cache dir (keys include
# backend/flags, so CPU and TPU entries never collide).
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

assert jax.default_backend() == "cpu", "tests must run on the CPU backend"
assert jax.device_count() >= 8, "tests expect an 8-device virtual CPU platform"

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
