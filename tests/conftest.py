"""Test harness: force an 8-virtual-device CPU platform so sharding tests run
without TPU hardware (SURVEY §4 test plan)."""
import os

# Must be set before jax backends initialize.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

# The env var alone is NOT enough when an accelerator PJRT plugin was
# registered at interpreter startup (sitecustomize): the plugin's
# registration survives the env and jax still picks the accelerator.
# The config knob wins as long as no backend has been initialized yet —
# conftest imports before any test module, so this is the one reliable
# place to pin the platform.
import jax

jax.config.update("jax_platforms", "cpu")
