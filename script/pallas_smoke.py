import sys; sys.path.insert(0, "/root/repo")
import time
import numpy as np
import jax
import jax.numpy as jnp
print("backend:", jax.default_backend(), flush=True)
from zkcnn_tpu.field import FR
from zkcnn_tpu.field.params import FR_P
from zkcnn_tpu.field.pallas_round import round_step, cubic_round_step
from zkcnn_tpu.mle import fold, coeffs_quadratic_dots

rng = np.random.default_rng(11)
def rand_mont(m):
    xs = [int.from_bytes(rng.bytes(31), "little") % FR_P for _ in range(m)]
    return jnp.asarray(FR.pack_mont_host(xs))

m = 1 << 12
A, V = rand_mont(m), rand_mont(m)
r = 5555555555444444444 % FR_P
rp = jnp.asarray(FR.to_mont_host(r))

t0 = time.time()
d, A2, V2 = round_step(A, V, rp)
jax.block_until_ready(A2)
print("quad compile+run %.1fs" % (time.time() - t0), flush=True)

d_ref = np.asarray(coeffs_quadratic_dots(A, V))
A2_ref = np.asarray(fold(A, rp)); V2_ref = np.asarray(fold(V, rp))
assert [FR.from_mont_host(x) for x in np.asarray(d)] == \
       [FR.from_mont_host(x) for x in d_ref], "DOTS MISMATCH"
np.testing.assert_array_equal(np.asarray(A2), A2_ref)
np.testing.assert_array_equal(np.asarray(V2), V2_ref)
print("quad OK on TPU", flush=True)

# cubic
from zkcnn_tpu.gkr.engine import _cubic_terms
M = 1 << 8
mm, V0, V1 = rand_mont(M), rand_mont(m), rand_mont(m)
t0 = time.time()
c, m2, V02, V12 = cubic_round_step(mm, V0, V1, rp)
jax.block_until_ready(V02)
print("cubic compile+run %.1fs" % (time.time() - t0), flush=True)
c_ref = np.asarray(jnp.stack(_cubic_terms(mm, V1, V0)))
assert [FR.from_mont_host(x) for x in np.asarray(c)] == \
       [FR.from_mont_host(x) for x in c_ref], "CUBIC MISMATCH"
np.testing.assert_array_equal(np.asarray(V02), np.asarray(fold(V0, rp)))
np.testing.assert_array_equal(np.asarray(V12), np.asarray(fold(V1, rp)))
print("cubic OK on TPU", flush=True)

# throughput at 2^20
N = 1 << 20
A, V = rand_mont(2048), rand_mont(2048)
A = jnp.tile(A, (N // 2048, 1)); V = jnp.tile(V, (N // 2048, 1))
out = round_step(A, V, rp); jax.block_until_ready(out[1])
iters = 20
t0 = time.time()
for _ in range(iters):
    out = round_step(A, V, rp)
jax.block_until_ready(out[1])
dt = (time.time() - t0) / iters
print("pallas round 2^20: %.2f ms -> %.1fM muls/s" % (dt*1e3, 3*N/dt/1e6), flush=True)

# ---- v2 kernel ----
from zkcnn_tpu.field.pallas_round2 import round_step2, to_red, red_to_mont, TILE2
m = 2 * TILE2
A, V = rand_mont(m), rand_mont(m)
t0 = time.time()
d, A2r, V2r = round_step2(to_red(A), to_red(V), rp)
jax.block_until_ready(A2r)
print("v2 compile+run %.1fs" % (time.time() - t0), flush=True)
d_ref = np.asarray(coeffs_quadratic_dots(A, V))
assert [FR.from_mont_host(x) for x in np.asarray(d)] == \
       [FR.from_mont_host(x) for x in d_ref], "V2 DOTS MISMATCH"
np.testing.assert_array_equal(np.asarray(red_to_mont(A2r)), np.asarray(fold(A, rp)))
print("v2 OK on TPU", flush=True)

# v2 throughput at 2^20
N2 = 1 << 20
A = jnp.tile(rand_mont(4096), (N2 // 4096, 1))
V = jnp.tile(rand_mont(4096), (N2 // 4096, 1))
Ar, Vr = to_red(A), to_red(V)
out = round_step2(Ar, Vr, rp); jax.block_until_ready(out[1])
iters = 20
t0 = time.time()
for _ in range(iters):
    out = round_step2(Ar, Vr, rp)
jax.block_until_ready(out[1])
dt = (time.time() - t0) / iters
print("v2 round 2^20: %.2f ms -> %.1fM muls/s" % (dt*1e3, 3*N2/dt/1e6), flush=True)

# second shape to gauge per-shape Mosaic compile cost
A3 = Ar[: (1 << 18)]; V3 = Vr[: (1 << 18)]
t0 = time.time()
out = round_step2(A3, V3, rp); jax.block_until_ready(out[1])
print("v2 2^18 compile+run %.1fs" % (time.time() - t0), flush=True)
