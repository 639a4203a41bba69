"""Batched BLS12-381 G1 arithmetic in Jacobian coordinates over FP
limb tensors.

Replaces the reference's dependency on mcl's G1 (used only through the
hyrax submodule; reference src/global_var.hpp:44, verifier.cpp:119-128)
with a TPU-native implementation: points are [..., 3, 24]-limb uint32
tensors (X, Y, Z Montgomery form; Z == 0 encodes infinity), and
add/double are branchless formula evaluations with where-selects for
the edge cases, so they batch over arbitrary leading dimensions.

A pure-Python integer implementation is included for cross-checking.
"""

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from ..field.limbs import FP
from ..field.params import FP_P
from ..warm import zjit

# curve: y^2 = x^3 + 4
G1_X = 0x17F1D3A73197D7942695638C4FA9AC0FC3688C4F9774B905A14E3A3F171BAC586C55E83FF97A1AEFFB3AF00ADB22C6BB
G1_Y = 0x08B3F481E3AAA0F1A09E30ED741D8AE4FCF5E095D5D00AF600DB18CB2C04B3EDD03CC744A2888AE40CAA232946C5E7E1
G1_COFACTOR = 0x396C8C005555E1568C00AAAB0000AAAB


def point_pack(xyz):
    """host (x, y, z) ints -> [3, n] Montgomery limbs."""
    return np.stack([FP.to_mont_host(c) for c in xyz])


def point_unpack(pt):
    """[..., 3, n] -> (x, y, z) object arrays of ints."""
    arr = np.asarray(pt)
    flat = arr.reshape(-1, 3, FP.n)
    out = []
    for p in flat:
        out.append(tuple(FP.from_mont_host(c) for c in p))
    return out


def infinity(shape=()):
    return jnp.zeros(shape + (3, FP.n), jnp.uint32)


def base_point():
    return jnp.asarray(point_pack((G1_X, G1_Y, 1)))


def _is_zero(v):
    return ~jnp.any(v != 0, axis=-1)


@zjit
def pdouble(p):
    """Jacobian doubling, a = 0 curve.  Handles infinity (Z=0) and
    Y = 0 (-> infinity) implicitly: 2*inf = inf since Z3 = 2YZ = 0."""
    X, Y, Z = p[..., 0, :], p[..., 1, :], p[..., 2, :]
    A = FP.mul(X, X)
    B = FP.mul(Y, Y)
    Cc = FP.mul(B, B)
    t = FP.add(X, B)
    D = FP.sub(FP.sub(FP.mul(t, t), A), Cc)
    D = FP.add(D, D)
    E = FP.add(FP.add(A, A), A)
    F = FP.mul(E, E)
    X3 = FP.sub(F, FP.add(D, D))
    eightC = FP.add(Cc, Cc)
    eightC = FP.add(eightC, eightC)
    eightC = FP.add(eightC, eightC)
    Y3 = FP.sub(FP.mul(E, FP.sub(D, X3)), eightC)
    YZ = FP.mul(Y, Z)
    Z3 = FP.add(YZ, YZ)
    return jnp.stack([X3, Y3, Z3], axis=-2)


@zjit
def padd(p, q):
    """Complete-in-practice Jacobian addition with edge handling:
    p + inf, inf + q, p == q (double), p == -q (infinity)."""
    X1, Y1, Z1 = p[..., 0, :], p[..., 1, :], p[..., 2, :]
    X2, Y2, Z2 = q[..., 0, :], q[..., 1, :], q[..., 2, :]
    Z1Z1 = FP.mul(Z1, Z1)
    Z2Z2 = FP.mul(Z2, Z2)
    U1 = FP.mul(X1, Z2Z2)
    U2 = FP.mul(X2, Z1Z1)
    S1 = FP.mul(FP.mul(Y1, Z2), Z2Z2)
    S2 = FP.mul(FP.mul(Y2, Z1), Z1Z1)
    H = FP.sub(U2, U1)
    r = FP.sub(S2, S1)
    HH = FP.mul(H, H)
    HHH = FP.mul(H, HH)
    V = FP.mul(U1, HH)
    r2 = FP.mul(r, r)
    X3 = FP.sub(FP.sub(r2, HHH), FP.add(V, V))
    Y3 = FP.sub(FP.mul(r, FP.sub(V, X3)), FP.mul(S1, HHH))
    Z3 = FP.mul(FP.mul(Z1, Z2), H)
    out = jnp.stack([X3, Y3, Z3], axis=-2)

    h_zero = _is_zero(H)
    r_zero = _is_zero(r)
    # same x: equal points -> double; opposite -> infinity (Z3 = 0
    # already, but X/Y garbage: force canonical zeros)
    dbl = pdouble(p)
    same = (h_zero & r_zero)[..., None, None]
    out = jnp.where(same, dbl, out)
    opp = (h_zero & ~r_zero)[..., None, None]
    out = jnp.where(opp, jnp.zeros_like(out), out)

    p_inf = _is_zero(Z1)[..., None, None]
    q_inf = _is_zero(Z2)[..., None, None]
    out = jnp.where(q_inf, p, out)
    out = jnp.where(p_inf, q, out)
    return out


@zjit
def pneg(p):
    Y = FP.neg(p[..., 1, :])
    return p.at[..., 1, :].set(Y)


def tree_sum(pts):
    """Sum points along axis 0 by pairwise halving."""
    n = pts.shape[0]
    while n > 1:
        if n % 2:
            pts = jnp.concatenate([pts, infinity((1,) + pts.shape[1:-2])])
            n += 1
        pts = padd(pts[0::2], pts[1::2])
        n >>= 1
    return pts[0]


@partial(zjit, static_argnums=(2,))
def _scalar_mul_steps(pt, bits, nbits: int):
    def body(i, acc):
        acc = pdouble(acc)
        b = jnp.take(bits, nbits - 1 - i, axis=-1)
        return jnp.where((b > 0)[..., None, None], padd(acc, pt), acc)
    return jax.lax.fori_loop(0, nbits, body, infinity(pt.shape[:-2]))


def scalar_mul(pt, scalars_plain, nbits: int = 255):
    """pt: [..., 3, n] points; scalars_plain: [..., 16] Fr plain limbs."""
    idx = np.arange(nbits)
    bits = (scalars_plain[..., idx // 16] >> jnp.asarray(
        (idx % 16).astype(np.uint32))) & jnp.uint32(1)
    return _scalar_mul_steps(pt, bits, nbits)


# ---------------------------------------------------------------------
# pure-Python reference (for tests)

def py_add(P, Q, p=FP_P):
    if P is None:
        return Q
    if Q is None:
        return P
    (x1, y1), (x2, y2) = P, Q
    if x1 == x2:
        if (y1 + y2) % p == 0:
            return None
        lam = (3 * x1 * x1) * pow(2 * y1, -1, p) % p
    else:
        lam = (y2 - y1) * pow(x2 - x1, -1, p) % p
    x3 = (lam * lam - x1 - x2) % p
    return (x3, (lam * (x1 - x3) - y1) % p)


def py_mul(P, k, p=FP_P):
    acc = None
    while k:
        if k & 1:
            acc = py_add(acc, P, p)
        P = py_add(P, P, p)
        k >>= 1
    return acc


def to_affine_host(pt):
    """[..., 3, n] -> list of (x, y) or None, for comparisons."""
    out = []
    for (x, y, z) in point_unpack(pt):
        if z == 0:
            out.append(None)
        else:
            zi = pow(z, -1, FP_P)
            out.append((x * zi * zi % FP_P, y * zi * zi * zi % FP_P))
    return out


def encode_points_host(pt) -> bytes:
    """Canonical byte encoding of a batch of points: affine x||y (48+48
    LE bytes each; a single zero byte for infinity).  Used for
    Fiat-Shamir absorption -- Jacobian limb bytes are NOT canonical
    (any Z-scaling changes them without changing the group element)."""
    parts = []
    for a in to_affine_host(pt):
        if a is None:
            parts.append(b"\x00")
        else:
            parts.append(a[0].to_bytes(48, "little")
                         + a[1].to_bytes(48, "little"))
    return b"".join(parts)


def hash_to_group_host(seed: bytes, index: int):
    """Try-and-increment hash-to-curve with cofactor clearing: returns
    an affine (x, y) whose discrete log is unknown to everyone.  Used
    for Fiat-Shamir-mode Pedersen generators, where tape-derived
    s_i*G generators would hand the prover every discrete log (the
    tape is a public function of the seed).  Host-side Python-int math
    (setup-time only).  p == 3 (mod 4), so sqrt is a single pow."""
    import hashlib
    assert FP_P % 4 == 3
    ctr = 0
    while True:
        h = hashlib.sha512(seed + index.to_bytes(8, "little")
                           + ctr.to_bytes(8, "little")).digest()
        x = int.from_bytes(h, "little") % FP_P
        rhs = (x * x * x + 4) % FP_P
        y = pow(rhs, (FP_P + 1) // 4, FP_P)
        if y * y % FP_P == rhs:
            if y & 1:
                y = FP_P - y          # canonical sign choice
            P = py_mul((x, y), G1_COFACTOR)
            if P is not None:
                return P
        ctr += 1
