import os

# Tests run on a virtual 8-device CPU mesh with f64 enabled: the parity/
# physics oracles need double precision, and sharding tests need >1 device.
# Benchmarks (bench.py) run on the real TPU in f32 instead.
# Force CPU: the session env exports JAX_PLATFORMS=axon (remote TPU tunnel),
# and the axon plugin also ignores JAX_PLATFORMS=cpu — JAX_PLATFORM_NAME pins it.
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_PLATFORM_NAME"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

jax.config.update("jax_enable_x64", True)
