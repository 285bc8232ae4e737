"""Test harness: force CPU with 8 virtual devices so the distributed tests
can build a jax.sharding.Mesh without TPU hardware (SURVEY.md §4)."""
import os

# Force-override: the environment presets JAX_PLATFORMS=axon (TPU tunnel)
# and a sitecustomize re-forces it at interpreter start, so the env var
# alone is NOT enough — jax.config must be updated after import (below).
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

# Persistent compile cache: the suite re-jits the same render graphs each run.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_hrt")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
