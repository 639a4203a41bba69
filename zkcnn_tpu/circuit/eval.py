"""Witness evaluation: replay gate tensors against layer values.

TPU-native equivalents of calcNormalLayer / calcDotProdLayer /
calcFFTLayer (reference src/neuralNetwork.cpp:918-965): gathers +
per-gate field muls + one exact modular segment-sum per layer, all
batched; FFT layers use the batched NTT.

All index arrays here are PRE-subset (original ids), exactly like the
reference, which evaluates witnesses before initSubset runs.
"""

from functools import partial, lru_cache

import numpy as np
import jax
import jax.numpy as jnp

from ..field import FR
from ..field.ops import segment_sum_field
from ..ntt import ntt, intt
from .ir import Layer, LayerType, UNI_G, UNI_U, UNI_LU, UNI_SC, \
    BIN_G, BIN_U, BIN_V, BIN_SC, BIN_L
from ..warm import zjit


@lru_cache(maxsize=1)
def two_mul_table(q_bit_size: int = 220):
    """[2(q+1), n] device table of the +-2^k gate constants."""
    from ..circuit.ir import Circuit
    tm = Circuit.init(q_bit_size, 1).two_mul
    return jnp.asarray(FR.pack_mont_host(tm))


EVAL_CHUNK = 1 << 19    # gate rows per device program: the f32
                        # shift-matmul field mul materializes
                        # [rows, 2*n*n] f32 (~1GB at 2^19), so vgg-scale
                        # layers (2^25+ gates) stream through HBM
                        # instead of OOMing on one giant mul/gather


@partial(zjit, donate_argnums=(0,), static_argnums=(5,))
def _eval_uni_chunk(acc, table, uni, tm, n0, out_pow2: int):
    """acc[g] += table[src(u)] * two_mul[sc] for one uni-gate chunk.
    table = [val0 ; val_prev]; lu != 0 selects the val_prev half via a
    single offset gather (one materialized gather, not a two-branch
    where).  Sentinel pad rows scatter to g >= out_pow2 and drop."""
    idx = uni[:, UNI_U] + jnp.where(uni[:, UNI_LU] == 0, 0, n0)
    c = FR.mul(table[idx], tm[jnp.clip(uni[:, UNI_SC], 0,
                                       tm.shape[0] - 1)])
    return FR.add(acc, segment_sum_field(c, uni[:, UNI_G], out_pow2))


@partial(zjit, donate_argnums=(0,), static_argnums=(5,))
def _eval_bin_chunk(acc, table, bin_, tm, n0, out_pow2: int):
    """acc[g] += table[src(u)] * table[src(v)] * two_mul[sc] for one
    bin-gate chunk (2-bit l field: bit1 selects u's source, bit0 v's;
    reference circuit.h:24-33)."""
    a = table[bin_[:, BIN_U] + jnp.where(bin_[:, BIN_L] == 0, 0, n0)]
    b = table[bin_[:, BIN_V]
              + jnp.where((bin_[:, BIN_L] & 1) == 0, 0, n0)]
    c = FR.mul(FR.mul(a, b), tm[jnp.clip(bin_[:, BIN_SC], 0,
                                         tm.shape[0] - 1)])
    return FR.add(acc, segment_sum_field(c, bin_[:, BIN_G], out_pow2))


@zjit
def _scale_out(out, scale_pack):
    return FR.mul(out, jnp.broadcast_to(scale_pack, out.shape))


def eval_normal_layer(layer: Layer, val0, val_prev):
    """calcNormalLayer (reference src/neuralNetwork.cpp:918-935); output
    padded to 2^bit_length.

    Gate tensors are padded to power-of-two buckets under EVAL_CHUNK
    rows and to chunk multiples above it (kernels.py padding contract:
    sentinel rows scatter out of range and are dropped), and streamed
    chunk-by-chunk into a donated accumulator -- constant peak memory
    regardless of layer gate count."""
    from ..gkr.kernels import pad_chunk_rows
    out_pow2 = 1 << max(layer.bit_length, 0)
    tm = two_mul_table()
    scale_pack = jnp.asarray(FR.to_mont_host(layer.scale))
    if val_prev is None:
        val_prev = val0[:1]  # unused placeholder
    n0 = jnp.asarray(val0.shape[0], jnp.int32)
    table = jnp.concatenate([val0, val_prev])
    acc = jnp.zeros((out_pow2, FR.n), jnp.uint32)
    for arr, fn in ((layer.uni, _eval_uni_chunk),
                    (layer.bin, _eval_bin_chunk)):
        if arr.shape[0] == 0:
            continue
        padded = pad_chunk_rows(arr, EVAL_CHUNK).astype(np.int32)
        for start in range(0, padded.shape[0], EVAL_CHUNK):
            chunk = jnp.asarray(padded[start: start + EVAL_CHUNK])
            acc = fn(acc, table, chunk, tm, n0, out_pow2)
    return _scale_out(acc, scale_pack)


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


def _witness_ntt(x, fb: int, inverse: bool):
    """NTT dispatch for the witness path: under an active mesh, small
    batches of large transforms route to the stage-sharded NTT (one
    all_to_all transpose between butterfly stage groups -- SURVEY.md
    section 2 parallelism inventory); big batches keep the batched
    kernel (GSPMD shards the slot axis).  Both are bit-identical."""
    from ..parallel.context import active_mesh
    mesh = active_mesh()
    if mesh is not None:
        D = mesh.devices.size
        if (D & (D - 1)) == 0 and (1 << fb) >= D * D \
                and x.shape[0] < 2 * D:
            from ..parallel.sharding import stage_sharded_ntt
            return stage_sharded_ntt(mesh, fb, inverse)(x)
    return intt(x, fb) if inverse else ntt(x, fb)


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
        y = _witness_ntt(x, fb, False)
        out = y.reshape(n_slots * L, FR.n)
    else:
        n_slots = layer.size >> (fb - 1)
        x = val_prev[: n_slots * L].reshape(n_slots, L, FR.n)
        y = _witness_ntt(x, fb, True)
        out = y[:, :Lh].reshape(n_slots * Lh, FR.n)
    pad = (1 << layer.bit_length) - out.shape[0]
    if pad:
        out = jnp.pad(out, ((0, pad), (0, 0)))
    return out
