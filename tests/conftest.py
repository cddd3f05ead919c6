import os

# Tests run on the host platform with a virtual 8-device mesh so that the
# multi-chip sharding paths compile and execute without TPU hardware.
# (The environment pins JAX_PLATFORMS=axon globally; override it for tests —
# the real chip is exercised by bench.py, not the unit suite.)
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()
