"""Test harness: force an 8-virtual-device CPU platform so sharding tests run
without TPU hardware (SURVEY §4 test plan)."""
import os

# Must be set before jax import anywhere.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_PLATFORMS", "cpu")
