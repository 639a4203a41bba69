"""Witness evaluation: replay gate tensors against layer values.

TPU-native equivalents of calcNormalLayer / calcDotProdLayer /
calcFFTLayer (reference src/neuralNetwork.cpp:918-965): gathers +
per-gate field muls + one exact modular segment-sum per layer, all
batched; FFT layers use the batched NTT.

All index arrays here are PRE-subset (original ids), exactly like the
reference, which evaluates witnesses before initSubset runs.
"""

from functools import partial, lru_cache

import jax
import jax.numpy as jnp

from ..field import FR
from ..field.ops import segment_sum_field
from ..ntt import ntt, intt
from .ir import Layer, LayerType, UNI_G, UNI_U, UNI_LU, UNI_SC, \
    BIN_G, BIN_U, BIN_V, BIN_SC, BIN_L


@lru_cache(maxsize=1)
def two_mul_table(q_bit_size: int = 220):
    """[2(q+1), n] device table of the +-2^k gate constants."""
    from ..circuit.ir import Circuit
    tm = Circuit.init(q_bit_size, 1).two_mul
    return jnp.asarray(FR.pack_mont_host(tm))


@partial(jax.jit, static_argnums=(6,))
def _eval_gates(val0, val_prev, uni, bin_, tm, scale_pack, out_pow2: int):
    """uni: [Nu,4] int32-safe int64; bin_: [Nb,5]. Returns [out_pow2, n]."""
    parts = []
    segs = []
    if uni.shape[0]:
        u_src = jnp.where((uni[:, UNI_LU] == 0)[:, None],
                          val0[uni[:, UNI_U]], val_prev[uni[:, UNI_U]])
        c = FR.mul(u_src, tm[uni[:, UNI_SC]])
        parts.append(c)
        segs.append(uni[:, UNI_G])
    if bin_.shape[0]:
        lu_in = (bin_[:, BIN_L] == 0)[:, None]
        lv_in = ((bin_[:, BIN_L] & 1) == 0)[:, None]
        a = jnp.where(lu_in, val0[bin_[:, BIN_U]], val_prev[bin_[:, BIN_U]])
        b = jnp.where(lv_in, val0[bin_[:, BIN_V]], val_prev[bin_[:, BIN_V]])
        c = FR.mul(FR.mul(a, b), tm[bin_[:, BIN_SC]])
        parts.append(c)
        segs.append(bin_[:, BIN_G])
    vals = jnp.concatenate(parts) if len(parts) > 1 else parts[0]
    seg = jnp.concatenate(segs) if len(segs) > 1 else segs[0]
    out = segment_sum_field(vals, seg, out_pow2)
    return FR.mul(out, jnp.broadcast_to(scale_pack, out.shape))


def eval_normal_layer(layer: Layer, val0, val_prev):
    """calcNormalLayer (reference src/neuralNetwork.cpp:918-935); output
    padded to 2^bit_length.

    Gate tensors are padded to power-of-two buckets (kernels.py
    padding contract: sentinel rows scatter out of range and are
    dropped) so the jitted program's signature repeats across layers
    and models."""
    from ..gkr.kernels import pad_pow2
    out_pow2 = 1 << max(layer.bit_length, 0)
    tm = two_mul_table()
    scale_pack = jnp.asarray(FR.to_mont_host(layer.scale))
    if val_prev is None:
        val_prev = val0[:1]  # unused placeholder
    return _eval_gates(val0, val_prev,
                       jnp.asarray(pad_pow2(layer.uni)),
                       jnp.asarray(pad_pow2(layer.bin)),
                       tm, scale_pack, out_pow2)


def eval_dot_prod_layer(layer: Layer, val_prev, pic_parallel: int,
                        channel_out: int, channel_in: int):
    """calcDotProdLayer (reference src/neuralNetwork.cpp:937-948) but
    computed structurally: out[p,co,t] = sum_ci x^[p,ci,t] * w^[co,ci,t]
    is one field matmul [pic, ci] x [ci, co] per frequency t, batched on
    the MXU (field_batched_matmul).  val_prev is the FFT layer output,
    layout [ (pic | pic+co) * channel_in, fft_len, n ] row-major."""
    from ..field.matmul import field_batched_matmul
    L = 1 << layer.fft_bit_length
    cnt = pic_parallel + channel_out
    x = val_prev[: cnt * channel_in * L].reshape(cnt, channel_in, L, FR.n)
    x_hat = jnp.transpose(x[:pic_parallel], (2, 0, 1, 3))  # [L, pic, ci]
    w_hat = jnp.transpose(x[pic_parallel:], (2, 1, 0, 3))  # [L, ci, co]
    t_chunk = max(1, min(L, 2 ** 24 // max(
        1, pic_parallel * channel_in * channel_out * 4)))
    out = field_batched_matmul(x_hat, w_hat, t_chunk=t_chunk)
    out = jnp.transpose(out, (1, 2, 0, 3)).reshape(
        pic_parallel * channel_out * L, FR.n)
    pad = (1 << layer.bit_length) - out.shape[0]
    if pad:
        out = jnp.pad(out, ((0, pad), (0, 0)))
    return out


def eval_fft_layer(layer: Layer, val_prev):
    """calcFFTLayer (reference src/neuralNetwork.cpp:950-965).

    FFT: slots of lenh values zero-padded to len, forward NTT.
    IFFT: slots of len values, inverse NTT, keep first half.
    """
    fb = layer.fft_bit_length
    L = 1 << fb
    Lh = L >> 1
    if layer.ty == LayerType.FFT:
        n_slots = layer.size >> fb
        x = val_prev[: n_slots * Lh].reshape(n_slots, Lh, FR.n)
        x = jnp.pad(x, ((0, 0), (0, Lh), (0, 0)))
        y = ntt(x, fb)
        out = y.reshape(n_slots * L, FR.n)
    else:
        n_slots = layer.size >> (fb - 1)
        x = val_prev[: n_slots * L].reshape(n_slots, L, FR.n)
        y = intt(x, fb)
        out = y[:, :Lh].reshape(n_slots * Lh, FR.n)
    pad = (1 << layer.bit_length) - out.shape[0]
    if pad:
        out = jnp.pad(out, ((0, pad), (0, 0)))
    return out
