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

import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
