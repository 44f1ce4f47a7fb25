"""Test configuration: run everything on a virtual 8-device CPU mesh.

The axon TPU plugin on this machine overrides JAX_PLATFORMS from the
environment (sitecustomize), so we force CPU through jax.config instead.
Multi-chip sharding tests use all 8 virtual devices; numeric tests use
device 0.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
# Reference-parity numerics: f32 matmuls everywhere in tests.
jax.config.update("jax_default_matmul_precision", "highest")
