"""Log-round inner-product argument (Bulletproofs-style, non-ZK).

Compresses the Hyrax opening from sqrt-size to 2*log2(cols) G1 points
plus one scalar, matching the construction the reference's (absent)
hyrax-bls12-381 submodule implements per the Hyrax paper (reference
README.md:92-94; call sites verifier.cpp:128,359-373).

Statement: P = <b, G>, public x, claimed t = <b, x>.  With a
tape-derived auxiliary generator Q, set P* = P + t*Q and run the
standard halving rounds:

    L_k = <b_lo, G_hi> + <b_lo, x_hi> * Q
    R_k = <b_hi, G_lo> + <b_hi, x_lo> * Q
    c   = tape challenge
    b' = c*b_lo + c^-1*b_hi,  G' = c^-1*G_lo + c*G_hi,
    x' = c^-1*x_lo + c*x_hi,  P*' = c^2*L_k + P* + c^-2*R_k

ending with one scalar b0 and the check
    b0*G_final + (b0 * x_final)*Q == P*_final.
"""

from typing import List

import numpy as np
import jax.numpy as jnp

from ..field import FR
from ..field.params import FR_P
from . import curve
from .msm import points_equal


def _pack_scalar(s: int):
    return jnp.asarray(np.array([[(s >> (16 * i)) & 0xFFFF
                                  for i in range(FR.n)]], np.uint32))


def _pmul(points, scalar_int: int):
    """Batched fixed-scalar point multiplication."""
    sc = jnp.broadcast_to(_pack_scalar(scalar_int % FR_P)[0],
                          points.shape[:-2] + (FR.n,))
    return curve.scalar_mul(points, sc)


def _msm_small(points, scalars_mont):
    """<scalars, points> via batched double-and-add + tree (fine for
    the per-round half-length vectors)."""
    plain = FR.mont_redc(scalars_mont, FR.n)
    return curve.tree_sum(curve.scalar_mul(points, plain))


def _fold_scalars(v, c: int, cinv: int):
    """c*v_lo + c^-1*v_hi (Montgomery limb vectors)."""
    n = v.shape[0] // 2
    lo, hi = v[:n], v[n:]
    cp = jnp.asarray(FR.to_mont_host(c))
    cip = jnp.asarray(FR.to_mont_host(cinv))
    return FR.add(FR.mul(lo, jnp.broadcast_to(cp, lo.shape)),
                  FR.mul(hi, jnp.broadcast_to(cip, hi.shape)))


def _fold_points(G, c: int, cinv: int):
    """c^-1*G_lo + c*G_hi."""
    n = G.shape[0] // 2
    return curve.padd(_pmul(G[:n], cinv), _pmul(G[n:], c))


class IpaProof:
    def __init__(self):
        self.Ls: List = []
        self.Rs: List = []
        self.b0: int = 0


def _absorb_lr(tape, Lk, Rk):
    """Bind the round challenge to the round message (the standard
    Bulletproofs Fiat-Shamir requirement: challenges independent of
    L_k/R_k admit forgery).  Canonical affine encoding -- Jacobian limb
    bytes are malleable via Z-scaling.  Skipped for precomputable
    (interactive) tapes, whose absorb is a no-op by definition."""
    if not tape.precomputable:
        enc = curve.encode_points_host(jnp.stack([Lk, Rk]))
        tape.absorb(int.from_bytes(enc, "little"))


def ipa_prove(b, x, G, Q, t: int, tape) -> IpaProof:
    """b, x: [L, n] Montgomery; G: [L, 3, n]; Q: [3, n]."""
    proof = IpaProof()
    while b.shape[0] > 1:
        n = b.shape[0] // 2
        b_lo, b_hi = b[:n], b[n:]
        x_lo, x_hi = x[:n], x[n:]
        G_lo, G_hi = G[:n], G[n:]
        cl = int(FR.from_mont_host(np.asarray(FR.dot_mont(b_lo, x_hi))))
        cr = int(FR.from_mont_host(np.asarray(FR.dot_mont(b_hi, x_lo))))
        Lk = curve.padd(_msm_small(G_hi, b_lo), _pmul(Q[None], cl)[0])
        Rk = curve.padd(_msm_small(G_lo, b_hi), _pmul(Q[None], cr)[0])
        proof.Ls.append(Lk)
        proof.Rs.append(Rk)
        _absorb_lr(tape, Lk, Rk)
        c = tape.field()
        cinv = pow(c, FR_P - 2, FR_P)
        b = _fold_scalars(b, c, cinv)
        x = _fold_scalars(x, cinv, c)     # x folds with inverse roles
        G = _fold_points(G, c, cinv)
    proof.b0 = int(FR.from_mont_host(np.asarray(b[0])))
    tape.absorb(proof.b0)
    return proof


def ipa_verify(proof: IpaProof, x, G, Q, P, t: int, tape) -> bool:
    """Recompute challenges from the same tape and check the final
    relation.  x: [L, n]; G: [L, 3, n]; P: commitment point to <b,G>."""
    L = x.shape[0]
    logn = L.bit_length() - 1
    assert len(proof.Ls) == logn
    P_star = curve.padd(P, _pmul(Q[None], t % FR_P)[0])
    chals = []
    for k in range(logn):
        _absorb_lr(tape, proof.Ls[k], proof.Rs[k])
        c = tape.field()
        cinv = pow(c, FR_P - 2, FR_P)
        chals.append((c, cinv))
        c2 = c * c % FR_P
        ci2 = cinv * cinv % FR_P
        P_star = curve.padd(P_star,
                            curve.padd(_pmul(proof.Ls[k][None], c2)[0],
                                       _pmul(proof.Rs[k][None], ci2)[0]))
    tape.absorb(proof.b0)     # mirror the prover's transcript
    # s_i = prod over rounds of (c_k if bit else c_k^-1); round k splits
    # on index bit (logn-1-k) from the top; the lo half takes the
    # inverse role.  G and x fold with the SAME orientation, so one
    # weight vector serves both.
    s = np.ones(L, object)
    for k, (c, cinv) in enumerate(chals):
        bit = 1 << (logn - 1 - k)
        for i in range(L):
            s[i] = s[i] * (c if (i & bit) else cinv) % FR_P
    s_mont = jnp.asarray(FR.pack_mont_host(list(s)))
    G_final = _msm_small(G, s_mont)
    x_final = int(FR.from_mont_host(np.asarray(FR.dot_mont(s_mont, x))))
    lhs = curve.padd(_pmul(G_final[None], proof.b0)[0],
                     _pmul(Q[None], proof.b0 * x_final % FR_P)[0])
    return bool(np.asarray(points_equal(lhs, P_star)))
