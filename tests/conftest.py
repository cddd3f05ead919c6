import os

# Tests run on the host platform with a virtual 8-device mesh so that the
# multi-chip sharding paths compile and execute without TPU hardware.
# The environment pre-imports jax with JAX_PLATFORMS=axon pinned (site
# customization), so the env var alone is ineffective — jax.config is the
# authoritative override.  The real chip is exercised by bench.py only.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
