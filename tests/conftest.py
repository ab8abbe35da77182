"""Test configuration: run on a virtual 8-device CPU mesh.

Multi-chip sharding logic is exercised on a fake CPU mesh (the standard
JAX analog of a fake backend); float64 is enabled so parity tests can
match the reference's double-precision numerics. Must run before jax
initializes, hence the env vars at import time.
"""

import os

# NOTE: the axon TPU plugin ignores JAX_PLATFORMS; JAX_PLATFORM_NAME is
# the variable that actually selects the CPU backend under it. Set both.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("JAX_PLATFORM_NAME", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/tmp/tmgcn_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
