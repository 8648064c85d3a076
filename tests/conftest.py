"""Test configuration: run JAX on a virtual multi-device CPU mesh.

TPU hardware in CI is a single chip; all sharding/multi-chip tests run against
8 virtual CPU devices (the pattern recommended for jax.distributed simulation,
mirroring the reference's CPU-forced math tests at
/root/reference/myosuite/tests/mjx/test_quat_math.py:7).

Parity tests against the CPU MuJoCo oracle run in float64 (enabled here
globally for the test process; the production path is float32/bfloat16).
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# NB: the env var JAX_PLATFORMS is overridden by the host's sitecustomize
# (forces "axon,cpu"); the config update below wins as long as it runs before
# backend initialization, so conftest must be imported before any jax op.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# Persistent compilation cache: env reset/step jits dominate test wall time
# (hand/leg scenes take minutes to compile on CPU); cached executables cut
# repeat runs to seconds. Safe across processes (content-addressed).
_cache_dir = os.environ.get(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(__file__), os.pardir, ".jax_cache"))
jax.config.update("jax_compilation_cache_dir", os.path.abspath(_cache_dir))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
