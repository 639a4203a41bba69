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
# CRITICAL: the axon environment routes even XLA:CPU compiles to the
# remote compile service (PALLAS_AXON_REMOTE_COMPILE=1); the returned
# AOT binaries target the remote host's CPU (AMX/AVX512 features the
# local machine lacks) and SIGILL/segfault when this process loads
# them from the persistent cache.  Force local compiles for tests.
os.environ["PALLAS_AXON_REMOTE_COMPILE"] = "0"
# zkcnn_tpu/__init__ configures the compile cache from this env var at
# import time; without it the package would re-point the cache at the
# axon dir (remote-compiled artifacts) AFTER this file set it.
# The dir is keyed by a host-CPU fingerprint: rounds run on different
# machines, and XLA:CPU AOT entries from a foreign machine SIGILL.
import hashlib
_flags = ""
try:
    with open("/proc/cpuinfo") as _f:
        for _line in _f:
            if _line.startswith("flags"):
                _flags = " ".join(sorted(_line.split(":", 1)[1].split()))
                break
except OSError:
    pass
_fp = hashlib.sha256(_flags.encode()).hexdigest()[:12]
# "_l1" = locally-compiled entries only (matches use_cpu_cache): the
# unsuffixed dirs hold remote-compiled AOT entries whose target
# features fail the host check on every load (r4 dryrun timeout)
os.environ["ZKCNN_TPU_XLA_CACHE"] = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".xla_cache", "cpu_" + _fp + "_l1")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the limb-arithmetic composites are
# compile-heavy; cache them across test processes (same host-keyed dir
# as above so suite runs share the build/dryrun cache).
import pathlib
_cache = pathlib.Path(os.environ["ZKCNN_TPU_XLA_CACHE"])
_cache.mkdir(parents=True, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", str(_cache))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
