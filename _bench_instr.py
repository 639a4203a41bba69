import json, sys, time, threading, faulthandler
faulthandler.enable()
T0 = time.time()
def log(msg):
    print(f"[{time.time()-T0:7.1f}s] {msg}", file=sys.stderr, flush=True)

# watchdog: dump all thread stacks every 120s so stalls are visible
faulthandler.dump_traceback_later(180, repeat=True, file=sys.stderr)

log("importing jax")
import jax
log(f"backend {jax.default_backend()}")
from zkcnn_tpu import warm
from zkcnn_tpu.nn import random_source
from zkcnn_tpu.nn.models import lenet
from zkcnn_tpu.nn.params import PoolType
from zkcnn_tpu.gkr import Prover, Verifier, Tape
log("imports done")

manifest = warm.manifest_path(f"lenet_pic1_{jax.default_backend()}")
t0 = time.time()
loaded, skipped = warm.warm_from_manifest(manifest, verbose=True)
log(f"warm: loaded={loaded} skipped={skipped} in {time.time()-t0:.1f}s  stats={warm.STATS}")

t0 = time.time()
nn = lenet(32, 32, 1, 1, PoolType.MAX)
C, vals = nn.create(random_source(17))
log(f"witness build {time.time()-t0:.1f}s")

for trial in range(2):
    p = Prover(C, vals)
    v = Verifier(p, C, Tape(b"bench-lenet"),
                 log=lambda *a: log(" ".join(map(str, a))))
    if trial == 0:
        t0 = time.time()
        p.prefetch()
        log(f"prefetch {time.time()-t0:.1f}s")
    t0 = time.time()
    ok = v.verify()
    log(f"trial {trial}: ok={ok} total={time.time()-t0:.1f}s PT={p.prove_time:.1f} VT={v.vt:.2f} VT_slow={v.vt_slow:.1f} stats={warm.STATS}")
