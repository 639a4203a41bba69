"""Sumcheck MLE folding kernels.

The reference represents each sumcheck operand as a vector of lazy
linear polynomials halved once per round (mult_array/V_mult of
linear_poly, src/prover.cpp:396-426).  The TPU-native equivalent keeps
plain field-value tensors and, per round,

  * emits the quadratic round message's coefficients from even/odd
    pairs:  h(x) = sum_i (A0_i + x dA_i)(V0_i + x dV_i), and
  * folds with the verifier's random point: X'_i = X_{2i} + r*(X_{2i+1}
    - X_{2i}),

both as single fused batched-field kernels (jit cached per shape; the
power-of-two shapes repeat across layers and phases so the compile set
is tiny).  Ragged `total_size` masking in the reference is a CPU
optimization only -- zero padding folds to zero, so we just keep pads
at zero (see prover.cpp:407-417: cleared pads never contribute).
"""

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from ..field import FR
from ..field.params import FR_P
from ..warm import zjit


@zjit
def fold(X, r_pack):
    """[2m, n] -> [m, n]: X'_i = (1-r)*X_{2i} + r*X_{2i+1}.

    Fused two-scalar linear combination: both scalar multiplies ride a
    Toeplitz matmul on the MXU and share ONE Montgomery reduction (3
    carry resolutions total instead of 7 for sub+mul+add)."""
    e = X[..., 0::2, :]
    o = X[..., 1::2, :]
    one = jnp.asarray(FR.one_mont)
    s0 = FR.sub(one[None], r_pack.reshape(1, -1))[0]
    return FR.lincomb2_scalar(e, o, s0, r_pack)


@zjit
def coeffs_quadratic_dots(A, V):
    """The four pair inner products (D00, D01, D10, D11) with
    D_xy = sum_i A_{2i+x} * V_{2i+y}, as Montgomery limb vectors.

    No tensor subtractions: the round coefficients are small host-side
    combinations of these (coeffs_from_dots), so the only device work
    is four MXU contraction dots over raw slices."""
    a0, a1 = A[0::2], A[1::2]
    v0, v1 = V[0::2], V[1::2]
    aa = jnp.stack([a0, a0, a1, a1])
    vv = jnp.stack([v0, v1, v0, v1])
    return FR.dot_mont(aa, vv)          # [4, n]


def coeffs_from_dots(d) -> tuple:
    """(c0, c1, c2) host ints from the stacked dots [4, n]:
    c0 = D00, c1 = D01 + D10 - 2*D00, c2 = D11 - D01 - D10 + D00."""
    d00, d01, d10, d11 = (FR.from_mont_host(x) for x in np.asarray(d))
    c0 = d00
    c1 = (d01 + d10 - 2 * d00) % FR_P
    c2 = (d11 - d01 - d10 + d00) % FR_P
    return c0, c1, c2


@zjit
def coeffs_quadratic(A, V):
    """Round message coefficients (c0, c1, c2) of
    h(x) = sum_i (A_{2i} + x(A_{2i+1}-A_{2i})) (V_{2i} + x(V_{2i+1}-V_{2i})).
    Returns three [n]-limb vectors (device path, used where the
    coefficients stay on device, e.g. the sharded round kernel)."""
    d = coeffs_quadratic_dots(A, V)
    d00, d01, d10, d11 = d[0], d[1], d[2], d[3]
    c0 = d00
    c1 = FR.sub(FR.add(d01, d10), FR.add(d00, d00))
    c2 = FR.add(FR.sub(FR.sub(d11, d01), d10), d00)
    return c0, c1, c2


def mle_eval(X, rs):
    """Multilinear extension of X (padded to 2^l) at point rs (host ints).

    Matches prover::Vres (src/prover.cpp:434-457): fold lowest variable
    first.  Returns a host int.
    """
    l = len(rs)
    m = 1 << l
    arr = X
    if arr.shape[0] < m:
        arr = jnp.pad(arr, ((0, m - arr.shape[0]), (0, 0)))
    for r in rs:
        arr = fold(arr, jnp.asarray(FR.to_mont_host(r)))
    return FR.from_mont_host(np.asarray(arr[0]))


class MleFolder:
    """One sumcheck operand pair (mult, V) with the reference's
    early-exhaustion semantics (prover.cpp:396-426).

    A side with 2^k entries contributes pair-product quadratics for
    rounds 0..k-1; at round k its folded scalar product moves into the
    caller's add_term, which thereafter contributes add_term*(1-x)
    (prover.cpp:375-378).
    """

    def __init__(self, A, V, bits: int):
        assert A.shape == V.shape
        m = 1 << bits if bits >= 0 else 0
        if bits >= 0 and A.shape[0] < m:
            pad = ((0, m - A.shape[0]), (0, 0))
            A = jnp.pad(A, pad)
            V = jnp.pad(V, pad)
        self.A, self.V = A, V
        self.bits = bits
        self.rounds_done = 0
        self.exhausted_product = None  # host int once collapsed
        self.claim_V = None            # host int once collapsed

    @property
    def active(self):
        return self.bits >= 0 and self.rounds_done < self.bits

    def round_coeffs(self):
        """Quadratic contribution for the current round (host ints)."""
        c0, c1, c2 = coeffs_quadratic(self.A, self.V)
        packed = np.asarray(jnp.stack([c0, c1, c2]))
        return tuple(FR.from_mont_host(x) for x in packed)

    def apply_fold(self, r: int):
        rp = jnp.asarray(FR.to_mont_host(r))
        self.A = fold(self.A, rp)
        self.V = fold(self.V, rp)
        self.rounds_done += 1
        if self.A.shape[0] == 1:
            a = FR.from_mont_host(np.asarray(self.A[0]))
            v = FR.from_mont_host(np.asarray(self.V[0]))
            self.exhausted_product = a * v % FR_P
            self.claim_V = v
