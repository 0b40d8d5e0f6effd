"""Test configuration: run the suite on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is unavailable in CI, so sharding/pjit tests follow the
TPU-native testing recipe (SURVEY.md §4): force the CPU platform with 8 XLA
devices. Notes for this environment:
  * JAX_PLATFORMS=axon is exported globally — it must be overridden, not
    defaulted.
  * jax >= 0.9 ignores --xla_force_host_platform_device_count; the supported
    switch is the jax_num_cpu_devices config (set before backend init).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
# persistent compile cache: XLA-CPU compiles dominate suite runtime otherwise
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_pytest_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

import jax  # noqa: E402

# the axon site hook initializes the backend at import time; updating
# jax_platforms via config forces a re-init on the CPU platform
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
