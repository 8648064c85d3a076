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
# repeat runs to seconds. Entries are content-addressed and written
# atomically (temp + rename, see utils/compile_cache.py) so a killed test
# run cannot leave truncated entries that segfault later readers.
import sys  # noqa: E402
sys.path.insert(0, os.path.abspath(
    os.path.join(os.path.dirname(__file__), os.pardir)))
from myosuite_mjx_tpu.utils import compile_cache  # noqa: E402
_cache_dir = os.environ.get(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(__file__), os.pardir, ".jax_cache"))
compile_cache.enable(_cache_dir)
