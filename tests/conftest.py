import os

# Tests run on a virtual 8-device CPU mesh so sharded code paths are
# exercised without TPU hardware (the driver separately dry-runs multi-chip).
# NOTE: the axon sitecustomize force-sets jax_platforms="axon,cpu" at
# interpreter start, so the env var alone is not enough -- we must override
# the config after importing jax (backends initialize lazily, so this wins
# as long as it happens before any device op).
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
