"""Field matrix multiplication on the MXU.

C[m, n] = sum_k A[m, k] * B[k, n] over Fr, with the contraction running
on the systolic array: operands split to bf16-exact 8-bit planes,
einsum contracts k in chunks of 256 (f32 accumulators stay < 2^24),
plane pairs route to base-2^8 columns via a constant shift matmul, and
one Montgomery finish lands back on canonical limbs.

This is the scalability kernel for the conv pipeline at VGG scale: the
DOT_PROD layer's phase-1 operand build and its witness are (batched)
field matmuls with K up to 512 and N up to millions — the per-gate
formulation would materialize [gates * fft_len] intermediates, this
one touches only [chunk] tiles.
"""

from functools import lru_cache, partial

import numpy as np
import jax
import jax.numpy as jnp

from .limbs import FR, _split8, _shift_matrix8_flat, _resolve8, resolve, \
    add_base16
from ..warm import zjit, register_factory


@partial(zjit, static_argnums=())
def _mm_tile(a8, b8, M8):
    """a8: [M, C, T, 2n8] bf16-ready planes; b8: [C, T, N, 2n8];
    -> (cols_lo, cols_hi) uint32 [M, N, 64] summed over all of k."""
    O = jnp.einsum("mcti,ctnj->cmnij",
                   a8.astype(jnp.bfloat16), b8.astype(jnp.bfloat16),
                   preferred_element_type=jnp.float32)
    O = O.astype(jnp.uint32)                   # [C, M, N, n8, n8] < 2^24
    n8 = O.shape[-1]
    Of = O.reshape(*O.shape[:-2], n8 * n8)
    lo = jnp.dot((Of & jnp.uint32(0xFFFF)).astype(jnp.float32), M8,
                 preferred_element_type=jnp.float32,
                 precision=jax.lax.Precision.HIGHEST).astype(jnp.uint32)
    hi = jnp.dot((Of >> 16).astype(jnp.float32), M8,
                 preferred_element_type=jnp.float32,
                 precision=jax.lax.Precision.HIGHEST).astype(jnp.uint32)
    # sum over the k-chunk axis C (C <= 2^10 keeps lo < 2^31)
    return jnp.sum(lo, axis=0, dtype=jnp.uint32), \
        jnp.sum(hi, axis=0, dtype=jnp.uint32)


@zjit
def _mm_finish(cols_lo, cols_hi):
    w = 2 * FR.n + 3
    Ls = _resolve8(cols_lo, w)
    Hs = _resolve8(cols_hi, w)
    Hs = jnp.concatenate([jnp.zeros_like(Hs[..., :1]), Hs[..., :-1]],
                         axis=-1)
    rows, _ = add_base16(Ls, Hs)
    return FR.reduce_wide(rows, w)


def field_matmul(A, B, n_chunk: int = 1 << 14):
    """A [M, K, n] x B [K, N, n] -> [M, N, n] (Montgomery), exact.

    K is chunked at 256 for f32 exactness (and must satisfy
    K <= 2^10 * 256 = 2^18 per call for the uint32 chunk sum); N is
    chunked at n_chunk to bound the [M, N, 1024] f32 tile."""
    M, K, _ = A.shape
    _, N, _ = B.shape
    T = 256
    C = -(-K // T)
    assert C <= 1 << 10, "K too large for single-pass accumulation"
    if K != C * T:
        A = jnp.pad(A, ((0, 0), (0, C * T - K), (0, 0)))
        B = jnp.pad(B, ((0, C * T - K), (0, 0), (0, 0)))
    a8 = _split8(A).reshape(M, C, T, 2 * FR.n)
    M8 = jnp.asarray(_shift_matrix8_flat(2 * FR.n, 4 * FR.n))
    outs = []
    for s in range(0, N, n_chunk):
        e = min(N, s + n_chunk)
        b8 = _split8(B[:, s:e]).reshape(C, T, e - s, 2 * FR.n)
        lo, hi = _mm_tile(a8, b8, M8)
        outs.append(_mm_finish(lo, hi))
    return jnp.concatenate(outs, axis=1) if len(outs) > 1 else outs[0]


@register_factory("field.matmul._bmm_tile")
@lru_cache(maxsize=32)
def _bmm_tile(M: int, C: int, N: int):
    """Batched-matmul tile program, keyed by (M, k-chunks, N) -- a
    stable factory so the warm manifest can replay it (the previous
    inner closure re-traced on every field_batched_matmul call and
    could not be warmed)."""
    Tc = 256

    def tile(a, b, M8):
        a8 = _split8(a).reshape(-1, M, C, Tc, 2 * FR.n)
        b8 = _split8(b).reshape(-1, C, Tc, N, 2 * FR.n)
        O = jnp.einsum("bmcti,bctnj->bcmnij",
                       a8.astype(jnp.bfloat16), b8.astype(jnp.bfloat16),
                       preferred_element_type=jnp.float32)
        O = O.astype(jnp.uint32)
        n8 = O.shape[-1]
        Of = O.reshape(*O.shape[:-2], n8 * n8)
        lo = jnp.dot((Of & jnp.uint32(0xFFFF)).astype(jnp.float32), M8,
                     preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST).astype(jnp.uint32)
        hi = jnp.dot((Of >> 16).astype(jnp.float32), M8,
                     preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST).astype(jnp.uint32)
        lo = jnp.sum(lo, axis=1, dtype=jnp.uint32)
        hi = jnp.sum(hi, axis=1, dtype=jnp.uint32)
        return _mm_finish(lo, hi)

    return zjit(tile, key="field.matmul._bmm_tile",
                factory_args=(M, C, N))


def field_batched_matmul(A, B, t_chunk: int = 64):
    """A [T, M, K, n] x B [T, K, N, n] -> [T, M, N, n]: independent
    field matmuls per leading batch index (the DOT_PROD witness is one
    [pic, ci] x [ci, co] product per frequency t)."""
    T = A.shape[0]
    M, K = A.shape[1], A.shape[2]
    N = B.shape[2]
    Tc = 256
    C = -(-K // Tc)
    if K != C * Tc:
        A = jnp.pad(A, ((0, 0), (0, 0), (0, C * Tc - K), (0, 0)))
        B = jnp.pad(B, ((0, 0), (0, C * Tc - K), (0, 0), (0, 0)))
    M8 = jnp.asarray(_shift_matrix8_flat(2 * FR.n, 4 * FR.n))
    tile = _bmm_tile(M, C, N)
    outs = []
    for s in range(0, T, t_chunk):
        e = min(T, s + t_chunk)
        outs.append(tile(A[s:e], B[s:e], M8))
    return jnp.concatenate(outs, axis=0) if len(outs) > 1 else outs[0]
