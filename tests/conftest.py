"""Test configuration: run the whole suite on a virtual 8-device CPU mesh.

The container's sitecustomize registers the remote `axon` TPU backend at interpreter
startup (JAX_PLATFORMS=axon in the env) — every eager dispatch then rides the TPU
tunnel (~0.4 s/op), which makes the suite minutes-slow and defeats the virtual-mesh
strategy from SURVEY.md §4.3. jax is therefore already imported by the time pytest
loads this file, so plain env `setdefault` is too late: we must force the platform
through `jax.config.update` as well. XLA_FLAGS is still honoured because the CPU
client is created lazily, after this file runs.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_test_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

import jax

jax.config.update("jax_platforms", "cpu")
