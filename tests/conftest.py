"""Test configuration.

Tests run on CPU with 8 virtual devices so the multi-chip sharding path is
exercised without TPU hardware.  Must run before jax is imported anywhere.
"""

import os

# Force, not setdefault: the environment presets JAX_PLATFORMS to the TPU
# plugin, and tests must run on the virtual-device CPU backend.
os.environ["JAX_PLATFORMS"] = "cpu"
# On 1-core hosts jax's async CPU dispatch can deadlock while lowering
# embeds device constants (observed: array._value futex-wait inside
# ir_constant).  Synchronous dispatch avoids it.
os.environ["JAX_CPU_ENABLE_ASYNC_DISPATCH"] = "false"

# The TPU plugin in this image overrides jax_platforms at import time
# (config becomes "axon,cpu" regardless of the env var), so re-force the
# CPU backend after import as well.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# Persistent compile cache: repeat test runs skip XLA compilation.
# Set through jax.config, NOT os.environ — env config vars are read at
# jax import, which already happened above (round-4 suites ran with an
# effectively dead cache: 29 entries after hundreds of compiles).
jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache"),
)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
