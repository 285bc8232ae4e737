"""Test harness: force CPU with 8 virtual devices so the distributed tests
can build a jax.sharding.Mesh without TPU hardware (SURVEY.md §4)."""
import os

# Force-override: the environment presets JAX_PLATFORMS=axon (TPU tunnel);
# the test suite must run on the virtual-device CPU backend.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

# Persistent compile cache: the suite re-jits the same render graphs each run.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_hrt")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
