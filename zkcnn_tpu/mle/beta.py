"""Equality (beta) tables and FFT wiring-predicate (phi) tables.

TPU-native replacements for the reference's scalar table builders
(initBetaTable / initHalfTable, src/utils.cpp:32-51,148-180 and
phiGInit / phiPowInit, src/utils.cpp:53-103).

Conventions (identical to the reference's):
  * index bits are little-endian: beta[i] = init * prod_k (r_k if bit k
    of i else 1-r_k).  The reference builds this via two half-tables and
    a cross product; on TPU we use the doubling recurrence directly --
    each step is two fused batched field ops, total 2^(l+1) muls.
  * phi tables evaluate the FFT butterfly predicate closed-form so
    FFT/IFFT layers need no materialized gates (same trick, same math).

All `r` / scalar arguments are host Python ints (the verifier's
randomness); tables are device Montgomery limb tensors [2^l, n].
"""

from functools import partial, lru_cache

import numpy as np
import jax
import jax.numpy as jnp

from ..field import FR, root_of_unity
from ..field.params import FR_P
from ..warm import zjit


@partial(zjit, static_argnums=(0,))
def _beta_expand(ell: int, r_pack, init_pack):
    """Doubling build: B_{k+1} = [B_k*(1-r_k), B_k*r_k] (bit k = high)."""
    B = init_pack[None, :]
    for k in range(ell):
        top = FR.mul_scalar(B, r_pack[k])
        bot = FR.sub(B, top)
        B = jnp.concatenate([bot, top], axis=0)
    return B


# largest table built as ONE jitted doubling program.  Above this the
# XLA shift-matmul mul materializes [2^(l-1), 2*n*n] f32 operands
# (17GB at l=24, vgg's input bit-length) -- so bigger tables compose
# low-bit blocks scaled by the high-bit beta factors, chunk by chunk.
_BETA_JIT_MAX = 20


@zjit
def _beta_scale_block(B, s):
    return FR.mul(B, jnp.broadcast_to(s, B.shape))


def beta_table(r, init=1):
    """beta[i] = init * prod_k (r_k if bit_k(i) else 1-r_k), i in [0,2^l)."""
    ell = len(r)
    if init % FR_P == 0:
        return jnp.zeros((1 << ell, FR.n), jnp.uint32)
    if ell > _BETA_JIT_MAX:
        # bit k is the HIGH bit of step k's doubling, so the full table
        # is out[j * 2^m + i] = lo[i] * hi[j] with m = _BETA_JIT_MAX
        lo = beta_table(r[:_BETA_JIT_MAX], init)
        hi = beta_table(r[_BETA_JIT_MAX:], 1)
        return jnp.concatenate(
            [_beta_scale_block(lo, hi[j])
             for j in range(hi.shape[0])])
    r_pack = jnp.asarray(FR.pack_mont_host([x % FR_P for x in r])) if ell \
        else jnp.zeros((0, FR.n), jnp.uint32)
    init_pack = jnp.asarray(FR.to_mont_host(init))
    return _beta_expand(ell, r_pack, init_pack)


def beta_table_2pt(r0, r1, alpha, beta):
    """alpha-scaled eq at r0 plus beta-scaled eq at r1 (same length).

    Mirrors the two-point initBetaTable overload (src/utils.cpp:148-165):
    r1/beta may be absent (beta==0) and r0/alpha may be zero.
    """
    ell = len(r0) if r0 is not None else len(r1)
    out = None
    if alpha % FR_P != 0 and r0 is not None:
        out = beta_table(r0, alpha)
    if beta % FR_P != 0 and r1 is not None:
        t = beta_table(r1, beta)
        out = t if out is None else FR.add(out, t)
    if out is None:
        out = jnp.zeros((1 << ell, FR.n), jnp.uint32)
    return out


@lru_cache(maxsize=64)
def _omega_powers(n_bits: int, inverse: bool):
    """Host-precomputed [2^n] powers of the 2^n-th root of unity (or its
    inverse), packed to Montgomery limbs."""
    w = root_of_unity(n_bits)
    if inverse:
        w = pow(w, FR_P - 2, FR_P)
    N = 1 << n_bits
    pows = [1] * N
    for i in range(1, N):
        pows[i] = pows[i - 1] * w % FR_P
    return np.asarray(FR.pack_mont_host(pows))


@partial(zjit, static_argnums=(0, 1, 2))
def _phi_build(n_bits: int, inverse: bool, out_bits: int, pw, c0, c1, scale):
    """prod over k of (c0_k + c1_k * omega^(u*2^k)) for u in [0, 2^out_bits)."""
    N = 1 << n_bits
    u = jnp.arange(1 << out_bits, dtype=jnp.uint32)
    n_factors = n_bits - 1 if inverse else n_bits
    acc = jnp.broadcast_to(scale, (1 << out_bits, FR.n))
    for k in range(n_factors):
        idx = (u << k) & np.uint32(N - 1)
        g = pw[idx]
        term = FR.add(jnp.broadcast_to(c0[k], g.shape),
                      FR.mul(jnp.broadcast_to(c1[k], g.shape), g))
        acc = FR.mul(acc, term)
    return acc


def phi_table(r, scale: int, n_bits: int, inverse: bool):
    """Closed-form FFT wiring predicate table (reference phiGInit).

    Forward (FFT layer): table over u in [0, 2^(n-1)) with
        phi[u] = scale * prod_{k<n} ((1-r_k) + r_k * w^(u*2^k)),
    the MLE over the output-frequency variables t (bound to r, n of them)
    of the DFT kernel w^(t*u) against a half-length input.

    Inverse (IFFT layer): table over t in [0, 2^n) with
        phi[t] = scale * prod_{k<n-1} ((1-r_k) + r_k * w^(-t*2^k)),
    the MLE over the n-1 kept output-position variables.

    Contract (tested): sum_u phi[u]*x[u] == MLE of the (I)FFT of x at r.
    """
    n_factors = n_bits - 1 if inverse else n_bits
    assert len(r) >= n_factors
    pw = jnp.asarray(_omega_powers(n_bits, inverse))
    c0 = jnp.asarray(FR.pack_mont_host([(1 - rk) % FR_P
                                        for rk in r[:n_factors]])
                     if n_factors else np.zeros((0, FR.n), np.uint32))
    c1 = jnp.asarray(FR.pack_mont_host([rk % FR_P for rk in r[:n_factors]])
                     if n_factors else np.zeros((0, FR.n), np.uint32))
    scale_pack = jnp.asarray(FR.to_mont_host(scale))
    out_bits = n_bits if inverse else n_bits - 1
    return _phi_build(n_bits, inverse, out_bits, pw, c0, c1, scale_pack)
