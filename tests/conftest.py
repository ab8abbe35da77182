"""Test configuration: run on a virtual 8-device CPU mesh.

Multi-chip sharding logic is exercised on a fake CPU mesh (the standard
JAX analog of a fake backend); float64 is enabled so parity tests can
match the reference's double-precision numerics.

NOTE: in this environment jax is already imported at interpreter startup
(site hook), so setting JAX_PLATFORMS/JAX_PLATFORM_NAME here is too
late; ``jax.config.update`` is the reliable in-process switch. The
XLA_FLAGS device-count flag is still honored at first backend
initialization, so keep running pytest via the provided env (or rely on
the default below).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# jax_platforms (not just platform_name) so the axon plugin is never
# initialized: with only a platform *preference*, backend discovery
# still dials the TPU tunnel, and a wedged tunnel hangs every device op
# — the suite must run CPU-only regardless of tunnel health.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_platform_name", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/tmp/tmgcn_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
