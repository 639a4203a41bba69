"""Batched radix-2 field NTT over Fr.

TPU-native replacement for the reference's recursive scalar `fft`
(src/utils.cpp:105-145): the same Cooley-Tukey bit-reversed iterative
schedule, but vectorized over a batch of transforms (one per
(picture, channel) slot of the conv pipeline) and over the butterfly
index, as logN fused stage passes of batched field ops.

Used both for witness generation (calcFFTLayer semantics,
src/neuralNetwork.cpp:950-965: forward transforms zero-pad a
half-length input; inverse transforms keep the first half and multiply
by 1/N) and as the convolution workhorse.
"""

from functools import partial, lru_cache

import numpy as np
import jax
import jax.numpy as jnp

from ..field import FR, root_of_unity
from ..field.params import FR_P
from ..warm import zjit


@lru_cache(maxsize=32)
def _plan(logn: int, inverse: bool):
    N = 1 << logn
    # bit-reversal permutation
    rev = np.zeros(N, np.int32)
    for i in range(1, N):
        rev[i] = (rev[i >> 1] >> 1) | ((i & 1) << (logn - 1))
    w = root_of_unity(logn)
    if inverse:
        w = pow(w, FR_P - 2, FR_P)
    pows = [1] * (N // 2 if N > 1 else 1)
    for i in range(1, len(pows)):
        pows[i] = pows[i - 1] * w % FR_P
    return rev, np.asarray(FR.pack_mont_host(pows))


@partial(zjit, static_argnums=(1, 2))
def _ntt_core(x, logn: int, inverse: bool, rev, tw):
    """x: [batch, N, n_limbs] -> same shape, DFT along axis 1."""
    N = 1 << logn
    b = x.shape[0]
    x = x[:, rev, :]
    for s in range(1, logn + 1):
        half = 1 << (s - 1)
        stride = N >> s               # number of blocks
        # view as [b, blocks, 2, half, n]
        v = x.reshape(b, stride, 2, half, FR.n)
        u = v[:, :, 0]
        t = FR.mul(v[:, :, 1], tw[None, None, ::stride, :])
        x = jnp.stack([FR.add(u, t), FR.sub(u, t)], axis=2).reshape(
            b, N, FR.n)
    if inverse:
        x = FR.mul(x, jnp.broadcast_to(
            jnp.asarray(FR.to_mont_host(pow(N, FR_P - 2, FR_P))), x.shape))
    return x


def ntt(x, logn: int):
    """Forward DFT of size 2^logn along axis -2 of [batch, N, n_limbs]."""
    rev, tw = _plan(logn, False)
    return _ntt_core(x, logn, False, jnp.asarray(rev), jnp.asarray(tw))


def intt(x, logn: int):
    """Inverse DFT (including the 1/N factor, like the reference fft
    with flag=true, src/utils.cpp:139-144)."""
    rev, tw = _plan(logn, True)
    return _ntt_core(x, logn, True, jnp.asarray(rev), jnp.asarray(tw))
