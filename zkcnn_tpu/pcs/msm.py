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

import numpy as np
import jax
import jax.numpy as jnp

from ..field.limbs import FR, FP, add_base16, resolve, mul_wide, mul_low, \
    _MASK
from ..field.params import FR_P, to_limbs
from . import curve
from ..warm import zjit

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
    while rows.shape[0] - 1 < max_digit:
        m = rows.shape[0] - 1
        take = min(m, max_digit - m)
        new = curve.padd(jnp.broadcast_to(rows[m], rows.shape[1:])[None],
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
def _window_sum(table, digits):
    """digits [R, 2N] signed (first N for P, last N for phi(P)) ->
    sum_i digits[r,i] * base_i as [R, 3, n]."""
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
    pts = jnp.stack([X, Y, Z], axis=-2)
    n = two_n
    while n > 1:
        if n % 2:
            pts = jnp.concatenate(
                [pts, curve.infinity((pts.shape[0], 1))], axis=1)
            n += 1
        pts = curve.padd(pts[:, 0::2], pts[:, 1::2])
        n >>= 1
    return pts[:, 0]


@zjit
def _horner_step(acc, w):
    for _ in range(8):
        acc = curve.pdouble(acc)
    return curve.padd(acc, w)


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
        self.table = build_table(points)

    def compute(self, scalars_mont):
        """scalars_mont [R, N, n_limbs] (Montgomery) -> [R, 3, n] points.
        Rows are processed in chunks bounding the window-gather
        footprint; chunk results concatenate exactly (rows are
        independent MSMs)."""
        R = scalars_mont.shape[0]
        per_row = 2 * self.n_points * 3 * curve.FP.n
        chunk = max(1, min(R, self.MAX_GATHER_WORDS // per_row))
        outs = [self._compute_rows(scalars_mont[s: s + chunk])
                for s in range(0, R, chunk)]
        return outs[0] if len(outs) == 1 else jnp.concatenate(outs)

    def _compute_rows(self, scalars_mont):
        R = scalars_mont.shape[0]
        drows = max(1, self.MAX_REDC_SCALARS // self.n_points)
        if R <= drows:
            digs = _digits_of(scalars_mont)       # [R, 2N, 17]
        else:
            digs = jnp.concatenate(
                [_digits_of(scalars_mont[s: s + drows])
                 for s in range(0, R, drows)])
        acc = None
        for k in range(HALF_WINDOWS - 1, -1, -1):
            w = _window_sum(self.table, digs[:, :, k])
            acc = w if acc is None else _horner_step(acc, w)
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
