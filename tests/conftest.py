"""Test configuration: run everything on CPU with 8 virtual devices so
multi-chip sharding is exercised without TPU hardware (SURVEY.md section 4).

NOTE: this image auto-imports jax at interpreter startup, so JAX_PLATFORMS
from the environment is already baked into jax.config by the time conftest
runs -- override via jax.config, and set XLA_FLAGS before the backend
initializes (it is lazy)."""

import os

import jax

jax.config.update("jax_platforms", "cpu")
# XLA:CPU's collective rendezvous aborts the whole process (SIGABRT) if the
# 8 per-device threads don't all arrive within a hard 40 s watchdog. With
# async dispatch, two sharded programs can be in flight at once and their
# threads interleave arbitrarily -- on this 1-core box that intermittently
# starves a rendezvous past the watchdog and kills the test run. Synchronous
# dispatch keeps at most one program in flight (same fix as
# __graft_entry__._provision_devices).
jax.config.update("jax_cpu_enable_async_dispatch", False)
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
# ... and the watchdog itself assumes device threads run concurrently; on a
# single core a long sharded program legitimately skews thread arrival by
# minutes. Raise both timeouts well past any real program's span.
if "collective_call_terminate_timeout" not in flags:
    flags += (
        " --xla_cpu_collective_call_warn_stuck_timeout_seconds=120"
        " --xla_cpu_collective_call_terminate_timeout_seconds=1200"
    )
os.environ["XLA_FLAGS"] = flags
