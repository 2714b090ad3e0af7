"""Test configuration: run everything on CPU with 8 virtual devices so
multi-chip sharding is exercised without TPU hardware (SURVEY.md section 4).

NOTE: this image auto-imports jax at interpreter startup, so JAX_PLATFORMS
from the environment is already baked into jax.config by the time conftest
runs -- override via jax.config, and set XLA_FLAGS before the backend
initializes (it is lazy)."""

import os

import jax

jax.config.update("jax_platforms", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
