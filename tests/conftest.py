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

# Persistent compilation cache: the limb-arithmetic composites are
# compile-heavy; cache them across test processes.
import pathlib
_cache = pathlib.Path("/tmp/zkcnn_tpu_xla_cache_cpu")
_cache.mkdir(exist_ok=True)
jax.config.update("jax_compilation_cache_dir", str(_cache))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
