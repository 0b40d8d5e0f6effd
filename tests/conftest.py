"""Test configuration: run the suite on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is unavailable in CI, so sharding/pjit tests follow the
TPU-native testing recipe: force the host platform to expose 8 XLA CPU devices
(SURVEY.md §4). Must run before the first jax import.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()
