"""zkcnn_tpu: a TPU-native zkCNN (GKR + Hyrax) prover/verifier framework.

A from-scratch JAX/XLA re-design of the capabilities of TAMUCrypto/zkCNN
(reference mounted at /root/reference): zero-knowledge-style interactive
proofs that a quantized CNN inference (LeNet5 / VGG11 / VGG16) was computed
correctly, with the witness committed under a Hyrax polynomial commitment
over BLS12-381.

Layer map (tpu-first, not a port):
  field/    batched prime-field limb arithmetic (Montgomery, uint32 lanes)
  mle/      multilinear-extension tables: eq/beta, phi (FFT wiring), folds
  ntt/      field NTT (batched radix-2), serves witness gen + conv pipeline
  circuit/  dense-tensor layered arithmetic circuit IR + subset compaction
  nn/       quantizer, model builders (lenet/vgg...), witness generation
  gkr/      sumcheck prover engines + verifier protocol driver
  pcs/      Hyrax polynomial commitment: G1 curve ops, MSM, open/verify
  parallel/ jax.sharding mesh helpers, multi-chip variants of hot kernels
  cli/      demo entry points mirroring the reference argv contract
"""

__version__ = "0.1.0"

# Persistent XLA compilation cache: the limb-arithmetic composites are
# compile-heavy and shapes repeat across runs; cache survives processes.
import os as _os
import jax as _jax

# IMPORTANT: cache dirs are per-platform. The axon (TPU tunnel)
# backend writes host-side AOT executables compiled on the REMOTE
# machine's CPU (different ISA features); loading those from a pure-CPU
# process SIGILLs. Processes that force the CPU backend must call
# use_cpu_cache() (tests/conftest.py and the CLI --cpu flag do).
#
# The cache lives INSIDE the repo (survives /tmp wipes between driver
# rounds) and the min-compile-time threshold is 0: over the axon tunnel
# even a trivial jit(multiply) costs ~0.4s of remote-compile RPC (a
# local compile would be ~10ms, under the default 0.5s threshold and
# thus never persisted -- which made every "warm" run recompile
# thousands of tiny eager-op programs and was the round-1 latency
# floor: results/lenet_pic1_tpu_warm2.log per-layer 20-257s).
_repo_root = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
_cache_dir = _os.environ.get("ZKCNN_TPU_XLA_CACHE",
                             _os.path.join(_repo_root, ".xla_cache",
                                           "axon"))
try:
    _os.makedirs(_cache_dir, exist_ok=True)
    _jax.config.update("jax_compilation_cache_dir", _cache_dir)
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    _jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
except Exception:
    pass


def start_tunnel_warmup():
    """Pay the axon tunnel's one-time device->host channel setup
    (~70s, measured) in a background thread, concurrent with circuit
    building / tracing.  No-op off-TPU.  Returns the thread (join it
    before timing anything transfer-sensitive)."""
    import threading

    def _warm():
        try:
            import jax as j
            import jax.numpy as jn
            import numpy as n
            if j.default_backend() != "tpu":
                return
            n.asarray(jn.zeros((8,), jn.uint32) + n.uint32(1))
        except Exception:
            pass

    t = threading.Thread(target=_warm, daemon=True)
    t.start()
    return t


def host_fingerprint() -> str:
    """Short digest of this host's CPU feature set.  XLA:CPU AOT
    executables embed the compile machine's features; loading entries
    written on a different machine logs SIGILL warnings (and can
    actually SIGILL).  Rounds of this build run on different hosts, so
    CPU cache dirs are keyed by this fingerprint."""
    import hashlib
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    flags = " ".join(sorted(line.split(":", 1)[1].split()))
                    return hashlib.sha256(flags.encode()).hexdigest()[:12]
    except OSError:
        pass
    import platform
    return hashlib.sha256(platform.processor().encode()).hexdigest()[:12]


def use_cpu_cache():
    """Switch the persistent compile cache to the local-CPU-only
    directory (call after forcing jax_platforms='cpu').  Also disables
    the axon remote compile service for this process: remote-compiled
    XLA:CPU AOT binaries target the remote host's CPU features and
    SIGILL when loaded locally.

    The dir is suffixed "_l1" (local, v1): earlier rounds wrote
    REMOTE-compiled entries into the unsuffixed fingerprint dirs, whose
    `+prefer-no-gather/scatter` target features fail XLA's host check
    on EVERY load -- each hit then recompiled from scratch, which is
    what timed out the r4 driver dryrun (MULTICHIP_r04.json rc=124).
    A fresh dir orphans the poisoned entries."""
    _os.environ["PALLAS_AXON_REMOTE_COMPILE"] = "0"
    d = _os.environ.get("ZKCNN_TPU_XLA_CACHE_CPU",
                        _os.path.join(_repo_root, ".xla_cache",
                                      "cpu_" + host_fingerprint()
                                      + "_l1"))
    try:
        _os.makedirs(d, exist_ok=True)
        _jax.config.update("jax_compilation_cache_dir", d)
    except Exception:
        pass
