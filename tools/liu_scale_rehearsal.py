"""Scale rehearsal of the r5 Liu streaming accumulate at REAL vgg11
shapes (2^24 witness, real subset maps from the snapshot).  The r4
failure mode was a crash at this exact site (prover.py
sumcheck_liu_init); completion + bounded memory is the pass criterion.

Usage: liu_scale_rehearsal.py [--snapshot PATH] [--tpu]
Default is the CPU backend (local, no remote compile); --tpu runs the
same site on the real chip -- the r4 OOM was an HBM exhaustion, so the
TPU pass is the on-hardware closure of that failure."""
import argparse, os, pickle, resource, sys, time

ap = argparse.ArgumentParser()
ap.add_argument("--snapshot", default="/root/repo/results/vgg11_s17.snap")
ap.add_argument("--tpu", action="store_true")
args = ap.parse_args()

if not args.tpu:
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["PALLAS_AXON_REMOTE_COMPILE"] = "0"
import jax
if not args.tpu:
    jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, "/root/repo")
if not args.tpu:
    from zkcnn_tpu import use_cpu_cache
    use_cpu_cache()
import numpy as np
from zkcnn_tpu.field.params import FR_P
from zkcnn_tpu.gkr.prover import Prover

t0 = time.time()
with open(args.snapshot, "rb") as f:
    snap = pickle.load(f)
C, vals = snap["C"], snap["vals"]
print(f"snapshot loaded {time.time()-t0:.0f}s; input 2^{C.layers[0].bit_length}", flush=True)

p = Prover(C, vals, own_vals=False)
rng = np.random.default_rng(7)
def rnd(): return int(rng.integers(1, 1 << 62)) % FR_P
for i in range(1, C.size):
    ly = C.layers[i]
    p.r_u[i] = [rnd() for _ in range(max(ly.max_bl_u, 1))]
    p.r_v[i] = [rnd() for _ in range(max(ly.max_bl_v, 1))] \
        if ly.need_phase2 else None
sig_u = [rnd() for _ in range(C.size - 1)]
sig_v = [rnd() for _ in range(C.size - 1)]

rows = sum((1 << ly.bit_length_u[0] if ly.bit_length_u[0] >= 0 else 0)
           + (1 << ly.bit_length_v[0] if ly.bit_length_v[0] >= 0 else 0)
           for ly in C.layers[1: C.size])
print(f"subset rows total: {rows} (2^{rows.bit_length()-1}) -> "
      f"{'STREAMING' if rows > p.LIU_ONESHOT_ROWS else 'oneshot'} path",
      flush=True)
t0 = time.time()
p.sumcheck_liu_init(sig_u, sig_v)
jax.block_until_ready(p.phase.sides[1].A)
rss = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss // 1024
hbm = ""
try:
    st = jax.devices()[0].memory_stats()
    hbm = (f"; HBM in use {st['bytes_in_use'] >> 20} MB, "
           f"peak {st.get('peak_bytes_in_use', 0) >> 20} MB")
except Exception:
    pass
print(f"liu init OK in {time.time()-t0:.0f}s; mult shape "
      f"{p.phase.sides[1].A.shape}; peak RSS {rss} MB{hbm}", flush=True)
# sanity: the accumulated mult table is nonzero
a = np.asarray(p.phase.sides[1].A[:4096])
print("nonzero mult rows in first 4096:", int((a.any(axis=1)).sum()),
      flush=True)
