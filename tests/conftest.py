"""Test configuration: force CPU platform with 8 virtual devices.

The container's sitecustomize pins JAX_PLATFORMS=axon (the real-TPU tunnel),
so we must override (not setdefault) before any backend initializes: tests
must run on the virtual CPU mesh — the real chip is for bench.py, and two
processes sharing the tunnel serialize against each other.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402  (import after env setup)

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
# persistent compilation cache: the blocked point-scan graphs are compile-heavy
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_plonk_tests")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

assert jax.devices()[0].platform == "cpu", "tests must run on CPU devices"
