import time, sys, cProfile, pstats, io
T0=time.time()
def log(m): print(f"[{time.time()-T0:6.1f}s] {m}", file=sys.stderr, flush=True)
import jax
from zkcnn_tpu import warm
from zkcnn_tpu.nn import random_source
from zkcnn_tpu.nn.models import lenet
from zkcnn_tpu.nn.params import PoolType
log(f"backend {jax.default_backend()}")
t0=time.time()
warm.warm_from_manifest(warm.manifest_path("lenet_pic1_tpu"))
log(f"warm {time.time()-t0:.1f}s")
nn = lenet(32, 32, 1, 1, PoolType.MAX)
pr = cProfile.Profile()
t0=time.time()
pr.enable()
C, vals = nn.create(random_source(17))
pr.disable()
log(f"witness build {time.time()-t0:.1f}s")
s = io.StringIO()
pstats.Stats(pr, stream=s).sort_stats("cumulative").print_stats(25)
print(s.getvalue()[:4000])
