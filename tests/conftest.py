"""Test configuration: force a virtual 8-device CPU platform so sharding
tests run without TPU hardware (and unit numerics are fp64-capable CPU)."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

# jax may already be imported by sitecustomize with JAX_PLATFORMS=axon
# baked into its config defaults — override explicitly.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent XLA compile cache (CPU backend supports it on this jax):
# the suite is compile-dominated on this 1-core host, so warm re-runs
# skip most of the ~40 min wall.  Dir is gitignored; cold runs unaffected.
_cache_dir = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".jax_cache_cpu")
os.makedirs(_cache_dir, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


# ---------------------------------------------------------------------------
# fast/slow split: `pytest -m "not slow"` is the quick iteration loop
# (unit/numerics tests); the full suite (default) adds the golden-parity,
# session-equivalence and training modules that dominate the ~40 min wall.
SLOW_MODULES = {
    "test_golden_parity", "test_golden_lm", "test_kv_stream",
    "test_kv_batcher", "test_audio_batcher", "test_stream_v1",
    "test_pipeline", "test_training",
    "test_validate_reference", "test_lm_training", "test_model_dir",
}


def pytest_collection_modifyitems(config, items):
    import pytest
    for item in items:
        if item.module.__name__ in SLOW_MODULES:
            item.add_marker(pytest.mark.slow)


def pytest_configure(config):
    config.addinivalue_line("markers",
                            "slow: golden-parity / session / training "
                            "modules (the bulk of suite wall time)")
