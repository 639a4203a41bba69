"""Multi-scalar multiplication: GLV + signed-digit fixed-base windows.

TPU-native MSM strategy: instead of Pippenger's bucket scatter (which
maps poorly onto XLA's dense model), we precompute d*G for every base
G and digit magnitude d <= 128, then each window is a pure GATHER
followed by a log-depth batched tree of point additions, with an
8-doubling Horner step between windows.  All steps are dense, batched,
and compile once per shape.

Optimizations over the naive digit-table form:
  * log-structured table build: 7 batched point-adds instead of 254
    sequential ones (table[m+j] = table[m] + table[j]);
  * signed digits in [-128, 127]: table stores magnitudes only
    (129 rows instead of 256 -- half the build cost and memory);
    negative digits negate Y after the gather (free on the VPU);
  * GLV endomorphism phi(x, y) = (beta*x, y) with phi(P) = lambda*P
    (lambda^2 + lambda + 1 = 0 mod r): scalars split as
    k = k1 + lambda*k2 with k1, k2 < 2^128 via a Barrett division by
    lambda, halving the window count (17 instead of 33) and therefore
    the Horner doubling chain; the phi-image bases come from the SAME
    table with one field mul on X after the gather.

Used by the Hyrax commitment (fixed gens, many rows at once), the
row-combination MSM, and the final opening check (SURVEY.md section 3E;
reference call sites verifier.cpp:119-128,359-373).
"""

import os

import numpy as np
import jax
import jax.numpy as jnp

from ..field.limbs import FR, FP, add_base16, resolve, mul_wide, mul_low, \
    _MASK
from ..field.params import FR_P, to_limbs
from . import curve
from ..warm import zjit


def _compile_light() -> bool:
    """Compile-light MSM routing: off-TPU, the fused _window_sum /
    _horner_step composites (20k-op unrolled point-add trees) take
    minutes EACH to compile on a single XLA:CPU core, and this
    jaxlib's persistent CPU cache never reloads its own AOT entries
    (see zkcnn_tpu.use_cpu_cache) -- the r4 driver-dryrun timeout.
    The light path runs the same point-add sequence eagerly through a
    few BUCKETED padd/pdouble programs (identical math, identical
    results).  ZKCNN_TPU_MSM_LIGHT=1/0 overrides."""
    env = os.environ.get("ZKCNN_TPU_MSM_LIGHT")
    if env is not None:
        return env == "1"
    try:
        return jax.default_backend() != "tpu"
    except Exception:
        return True


# flat point-count buckets for the light path: every eager padd/
# pdouble call pads to the smallest sufficient bucket so the whole
# MSM shares a handful of compiled programs
_PADD_BUCKETS = (1 << 9, 1 << 13)


def _bucketed(op, *args):
    """op on flat [K, 3, n] operands, padded to a shared bucket (pads
    are infinity: padd(inf, inf) = inf, pdouble(inf) = inf).  Under an
    active mesh the operands are replicated first: jit keys include
    arg shardings, and the gather/reshape-derived shardings otherwise
    mint a fresh multi-minute XLA:CPU compile per variant (these
    tensors are tiny -- the light path never runs at TPU scale)."""
    from ..parallel.context import active_mesh, replicate
    K = args[0].shape[0]
    big = _PADD_BUCKETS[-1]
    if K > big:
        return jnp.concatenate(
            [_bucketed(op, *[a[s: s + big] for a in args])
             for s in range(0, K, big)])
    B = next(b for b in _PADD_BUCKETS if b >= K)
    if K < B:
        pad = curve.infinity((B - K,))
        args = [jnp.concatenate([a, pad]) for a in args]
    if active_mesh() is not None:
        args = [replicate(a) for a in args]
    return op(*args)[:K]

MAX_DIGIT = 128          # signed radix-256 digit magnitudes
HALF_WINDOWS = 17        # 16 byte windows per 128-bit GLV half + carry

# GLV endomorphism constants for BLS12-381 G1 (verified in tests
# against the pure-Python curve: phi(G) == lambda*G):
#   z = -0xd201000000010000 (the BLS parameter), lambda = z^2 - 1.
GLV_LAMBDA = (0xd201000000010000 ** 2 - 1) % FR_P
GLV_BETA = 0x1a0111ea397fe699ec02408663d4de85aa0d857d89759ad4897d29650fb85f9b409427eb4f49fffd8bfd00000000aaac
# Barrett reciprocal: floor(2^384 / lambda); q = (k*M) >> 384 needs at
# most one correction step for k < 2^255.
_BARRETT_M = (1 << 384) // GLV_LAMBDA


def build_table(points, max_digit: int = MAX_DIGIT):
    """points [N, 3, n] -> table [max_digit+1, N, 3, n], table[d] = d*P.

    Log-structured: with rows 0..m known, rows m+1..2m are
    table[m] + table[j] for j = 1..m -- one batched padd per doubling
    of the table size (7 dispatches for 128 digits)."""
    rows = jnp.concatenate([curve.infinity((1, points.shape[0])),
                            points[None]])
    light = _compile_light()
    N = points.shape[0]
    while rows.shape[0] - 1 < max_digit:
        m = rows.shape[0] - 1
        take = min(m, max_digit - m)
        if light:
            a = jnp.broadcast_to(rows[m], (take, N, 3, FP.n)) \
                .reshape(-1, 3, FP.n)
            b = rows[1: 1 + take].reshape(-1, 3, FP.n)
            new = _bucketed(curve.padd, a, b).reshape(take, N, 3, FP.n)
        else:
            new = curve.padd(
                jnp.broadcast_to(rows[m], rows.shape[1:])[None],
                rows[1: 1 + take])
        rows = jnp.concatenate([rows, new])
    return rows


@zjit
def _signed_digits(halves):
    """[..., 8] plain uint32 limbs (value < 2^128) -> [..., 17] int32
    signed radix-256 digits in [-128, 127] (window 16 is the carry)."""
    k = np.arange(16)
    limb = halves[..., k // 2]
    digs = (limb >> jnp.asarray(((k % 2) * 8).astype(np.uint32))) \
        & np.uint32(0xFF)
    out = []
    carry = jnp.zeros(halves.shape[:-1], jnp.uint32)
    for i in range(16):
        d = digs[..., i] + carry
        neg = d >= 128
        out.append(jnp.where(neg, d.astype(jnp.int32) - 256,
                             d.astype(jnp.int32)))
        carry = neg.astype(jnp.uint32)
    out.append(carry.astype(jnp.int32))
    return jnp.stack(out, axis=-1)


def _sub_wide(a, b):
    """a - b mod 2^(16*w) plus the no-borrow flag (a >= b)."""
    s, carry = add_base16(a, b ^ _MASK, extra_one=True)
    return s, carry > 0


@zjit
def glv_split(plain):
    """[..., 16] plain Fr limbs -> (k1, k2) [..., 8] plain limbs with
    k = k1 + lambda*k2, k1 < lambda, k2 < 2^128."""
    M = jnp.asarray(np.array(to_limbs(_BARRETT_M, 24), np.uint32))
    lam16 = jnp.asarray(np.array(to_limbs(GLV_LAMBDA, 16), np.uint32))
    prod = resolve(mul_wide(plain, jnp.broadcast_to(
        M, plain.shape[:-1] + (24,))), 40)
    q = prod[..., 24:40]                          # floor(k*M / 2^384)
    ql = resolve(mul_low(q, jnp.broadcast_to(lam16, q.shape), 16), 16)
    r1, _ = _sub_wide(plain, ql)                  # k - q*lambda >= 0
    # at most one correction (verified for the Barrett constant)
    r2, ge = _sub_wide(r1, jnp.broadcast_to(lam16, r1.shape))
    k1 = jnp.where(ge[..., None], r2, r1)
    one = jnp.zeros_like(q).at[..., 0].set(1)
    q = jnp.where(ge[..., None], add_base16(q, one)[0], q)
    return k1[..., :8], q[..., :8]


@zjit
def _window_gather(table, digits):
    """digits [R, 2N] signed (first N for P, last N for phi(P)) ->
    the gathered, GLV/sign-adjusted window points [R, 2N, 3, n]."""
    N = table.shape[1]
    two_n = digits.shape[1]
    mag = jnp.abs(digits)
    idx = jnp.arange(two_n) % N
    pts = table[mag, idx[None, :]]                # [R, 2N, 3, n]
    X, Y, Z = pts[..., 0, :], pts[..., 1, :], pts[..., 2, :]
    beta = jnp.asarray(FP.to_mont_host(GLV_BETA))
    is_phi = (jnp.arange(two_n) >= N)[None, :, None]
    X = jnp.where(is_phi, FP.mul(X, jnp.broadcast_to(beta, X.shape)), X)
    Y = jnp.where((digits < 0)[..., None], FP.neg(Y), Y)
    return jnp.stack([X, Y, Z], axis=-2)


@zjit
def _window_sum(table, digits):
    """_window_gather + halving padd tree, fused (TPU path; nested
    jit inlines the gather)."""
    pts = _window_gather(table, digits)
    n = pts.shape[1]
    while n > 1:
        if n % 2:
            pts = jnp.concatenate(
                [pts, curve.infinity((pts.shape[0], 1))], axis=1)
            n += 1
        pts = curve.padd(pts[:, 0::2], pts[:, 1::2])
        n >>= 1
    return pts[:, 0]


def _window_sum_light(table, digits):
    """Same reduction as _window_sum, but the tree levels run as EAGER
    bucketed padd calls (identical pairing order -> identical points;
    see _compile_light)."""
    pts = _window_gather(table, digits)
    R = pts.shape[0]
    m = pts.shape[1]
    while m > 1:
        if m % 2:
            pts = jnp.concatenate([pts, curve.infinity((R, 1))], axis=1)
            m += 1
        a = pts[:, 0::2].reshape(R * (m // 2), 3, FP.n)
        b = pts[:, 1::2].reshape(R * (m // 2), 3, FP.n)
        pts = _bucketed(curve.padd, a, b).reshape(R, m // 2, 3, FP.n)
        m >>= 1
    return pts[:, 0]


@zjit
def _horner_step(acc, w):
    for _ in range(8):
        acc = curve.pdouble(acc)
    return curve.padd(acc, w)


def _horner_step_light(acc, w):
    for _ in range(8):
        acc = _bucketed(curve.pdouble, acc)
    return _bucketed(curve.padd, acc, w)


@zjit
def _digits_of(scalars_mont):
    """[..., 16] Montgomery scalars -> [..., doubled-N..., 17] signed
    digits: REDC out of Montgomery, GLV split, radix-256 recode."""
    plain = FR.mont_redc(scalars_mont, FR.n)
    k1, k2 = glv_split(plain)
    return jnp.concatenate([_signed_digits(k1), _signed_digits(k2)],
                           axis=1)


class FixedBaseMSM:
    # cap on the gathered [R_chunk, 2N, 3, n] window tensor (uint32
    # words): ~1.5 GB.  vgg16's commit is 4096 rows x 4096 cols -- an
    # unchunked gather would be terabytes.
    MAX_GATHER_WORDS = 3 << 27
    # cap on scalars per digit-recode dispatch: the Barrett/REDC
    # intermediates (shift-matrix mul columns) are ~1.5 KB/scalar in
    # f32, so 2^19 scalars keeps that pass under ~1 GB (vgg11's commit
    # previously OOM'd here, results/vgg11_pic1_tpu_r2b.log).
    MAX_REDC_SCALARS = 1 << 19

    def __init__(self, points):
        self.n_points = int(points.shape[0])
        # host mode (ZKCNN_TPU_MSM_HOST=1): compute MSMs in pure
        # Python ints -- identical points, zero XLA programs.  The
        # driver dryrun uses it: on its single-core virtual-CPU mesh
        # every per-shape curve program costs ~a minute of XLA:CPU
        # compile, which dwarfed the actual point arithmetic (the r4
        # MULTICHIP timeout).  Device MSM coverage stays with the test
        # suite (light path) and the TPU (fused path).
        self.host_mode = os.environ.get("ZKCNN_TPU_MSM_HOST") == "1"
        if self.host_mode:
            self._points_affine = curve.to_affine_host(points)
        else:
            self.table = build_table(points)

    def compute(self, scalars_mont):
        """scalars_mont [R, N, n_limbs] (Montgomery) -> [R, 3, n] points.
        Rows are processed in chunks bounding the window-gather
        footprint; chunk results concatenate exactly (rows are
        independent MSMs)."""
        if self.host_mode:
            return self._compute_host(scalars_mont)
        R = scalars_mont.shape[0]
        per_row = 2 * self.n_points * 3 * curve.FP.n
        chunk = max(1, min(R, self.MAX_GATHER_WORDS // per_row))
        outs = [self._compute_rows(scalars_mont[s: s + chunk])
                for s in range(0, R, chunk)]
        return outs[0] if len(outs) == 1 else jnp.concatenate(outs)

    def _compute_host(self, scalars_mont):
        """Pure-host MSM (see __init__): per row, sum k_i * P_i with
        py_mul/py_add on Python ints."""
        sc = np.asarray(scalars_mont)
        rows = []
        for r in range(sc.shape[0]):
            ints = FR.unpack_mont_host(sc[r])
            acc = None
            for P, k in zip(self._points_affine, ints):
                if P is None or k == 0:
                    continue
                acc = curve.py_add(acc, curve.py_mul(P, k))
            rows.append(curve.point_pack((acc[0], acc[1], 1)) if acc
                        else np.zeros((3, curve.FP.n), np.uint32))
        return jnp.asarray(np.stack(rows))

    def _compute_rows(self, scalars_mont):
        R = scalars_mont.shape[0]
        drows = max(1, self.MAX_REDC_SCALARS // self.n_points)
        if R <= drows:
            digs = _digits_of(scalars_mont)       # [R, 2N, 17]
        else:
            digs = jnp.concatenate(
                [_digits_of(scalars_mont[s: s + drows])
                 for s in range(0, R, drows)])
        light = _compile_light()
        wsum = _window_sum_light if light else _window_sum
        horner = _horner_step_light if light else _horner_step
        acc = None
        for k in range(HALF_WINDOWS - 1, -1, -1):
            w = wsum(self.table, digs[:, :, k])
            acc = w if acc is None else horner(acc, w)
        return acc


@zjit
def points_equal(p, q):
    """Jacobian equality: cross-multiplied affine comparison."""
    X1, Y1, Z1 = p[..., 0, :], p[..., 1, :], p[..., 2, :]
    X2, Y2, Z2 = q[..., 0, :], q[..., 1, :], q[..., 2, :]
    Z1Z1, Z2Z2 = FP.mul(Z1, Z1), FP.mul(Z2, Z2)
    xe = jnp.all(FP.sub(FP.mul(X1, Z2Z2), FP.mul(X2, Z1Z1)) == 0, axis=-1)
    ye = jnp.all(FP.sub(FP.mul(FP.mul(Y1, Z2), Z2Z2),
                        FP.mul(FP.mul(Y2, Z1), Z1Z1)) == 0, axis=-1)
    i1 = ~jnp.any(Z1 != 0, axis=-1)
    i2 = ~jnp.any(Z2 != 0, axis=-1)
    return jnp.where(i1 | i2, i1 == i2, xe & ye)
