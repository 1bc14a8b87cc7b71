"""Test config: force CPU with 8 virtual devices so multi-chip sharding tests
run anywhere (the TPU-native analog of testing multi-node without a cluster).

Note: this host's sitecustomize registers a TPU PJRT plugin and pytest
plugins import jax before this file runs, so setting env vars is not enough —
we update the live jax config too.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"  # override the axon/TPU default of this host
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.default_backend() == "cpu", (
    "tests must run on CPU; JAX backend was already initialized to "
    f"{jax.default_backend()}"
)
assert jax.device_count() == 8, "expected 8 virtual CPU devices for sharding tests"

# Persistent compilation cache: the CPU tile-rasterizer compiles dominate the
# suite's runtime; caching them across runs/processes cuts repeat suites from
# ~10 min toward the compile-free floor.
_cache_dir = os.path.join(os.path.dirname(__file__), ".jax_cpu_cache")
try:
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass
