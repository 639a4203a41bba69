"""Multi-scalar multiplication via per-base digit tables + batched
tree reduction.

TPU-native MSM strategy: instead of Pippenger's bucket scatter (which
maps poorly onto XLA's dense model), we precompute d*G for every base
G and digit d < 256, then each window is a pure GATHER followed by a
log-depth batched tree of point additions, with an 8-doubling Horner
step between windows.  All steps are dense, batched, and compile once
per shape.

Used by the Hyrax commitment (fixed gens, many rows at once), the
row-combination MSM, and the final opening check (SURVEY.md section 3E;
reference call sites verifier.cpp:119-128,359-373).
"""



import numpy as np
import jax
import jax.numpy as jnp

from ..field.limbs import FR
from . import curve

N_WINDOWS = 32          # 256-bit scalars, 8-bit windows
DIGITS = 256


@jax.jit
def _table_step(prev, base):
    return curve.padd(prev, base)


def build_table(points):
    """points [N, 3, n] -> table [256, N, 3, n] with table[d] = d*P."""
    rows = [curve.infinity((points.shape[0],)), points]
    for _ in range(DIGITS - 2):
        rows.append(_table_step(rows[-1], points))
    return jnp.stack(rows)


@jax.jit
def _window_sum(table, digits):
    """digits [R, N] -> sum_i digits[r,i]*P_i as [R, 3, n]."""
    N = table.shape[1]
    pts = table[digits, jnp.arange(N)[None, :]]       # [R, N, 3, n]
    n = N
    while n > 1:
        if n % 2:
            pts = jnp.concatenate(
                [pts, curve.infinity((pts.shape[0], 1))], axis=1)
            n += 1
        pts = curve.padd(pts[:, 0::2], pts[:, 1::2])
        n >>= 1
    return pts[:, 0]


@jax.jit
def _horner_step(acc, w):
    for _ in range(8):
        acc = curve.pdouble(acc)
    return curve.padd(acc, w)


def digits_of(scalars_plain):
    """[..., 16] plain Fr limbs -> [..., 32] uint32 byte digits."""
    k = np.arange(N_WINDOWS)
    limb = scalars_plain[..., k // 2]
    return (limb >> jnp.asarray(((k % 2) * 8).astype(np.uint32))) & 0xFF


class FixedBaseMSM:
    def __init__(self, points):
        self.n_points = int(points.shape[0])
        self.table = build_table(points)

    def compute(self, scalars_mont):
        """scalars_mont [R, N, n_limbs] (Montgomery) -> [R, 3, n] points."""
        plain = FR.mont_redc(scalars_mont, FR.n)
        digs = digits_of(plain)                       # [R, N, 32]
        acc = None
        for k in range(N_WINDOWS - 1, -1, -1):
            w = _window_sum(self.table, digs[:, :, k])
            acc = w if acc is None else _horner_step(acc, w)
        return acc


@jax.jit
def points_equal(p, q):
    """Jacobian equality: cross-multiplied affine comparison."""
    from ..field.limbs import FP
    X1, Y1, Z1 = p[..., 0, :], p[..., 1, :], p[..., 2, :]
    X2, Y2, Z2 = q[..., 0, :], q[..., 1, :], q[..., 2, :]
    Z1Z1, Z2Z2 = FP.mul(Z1, Z1), FP.mul(Z2, Z2)
    xe = jnp.all(FP.sub(FP.mul(X1, Z2Z2), FP.mul(X2, Z1Z1)) == 0, axis=-1)
    ye = jnp.all(FP.sub(FP.mul(FP.mul(Y1, Z2), Z2Z2),
                        FP.mul(FP.mul(Y2, Z1), Z1Z1)) == 0, axis=-1)
    i1 = ~jnp.any(Z1 != 0, axis=-1)
    i2 = ~jnp.any(Z2 != 0, axis=-1)
    return jnp.where(i1 | i2, i1 == i2, xe & ye)
