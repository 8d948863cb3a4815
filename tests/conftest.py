"""Test configuration: force CPU platform with 8 virtual devices.

Multi-chip sharding paths are validated on a virtual CPU mesh; real-TPU
execution is exercised by bench.py / the driver.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402  (import after env setup)

jax.config.update("jax_enable_x64", False)
# persistent compilation cache: the blocked point-scan graphs are compile-heavy
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_plonk_tests")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
