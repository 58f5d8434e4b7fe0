"""Test configuration: force CPU with 8 virtual devices so unit + sharding
tests run fast and everywhere (cf. SURVEY.md §4 — multi-device coverage the
reference lacks).

Note: this environment may pre-register a remote TPU backend via
sitecustomize, so we both set the env vars and update jax.config post-import.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402
from neuradar_tpu.utils.cache_dirs import jax_cache_dir

jax.config.update("jax_platforms", "cpu")
# persistent compile cache: re-runs of the suite skip recompilation
jax.config.update("jax_compilation_cache_dir", jax_cache_dir("cpu"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
