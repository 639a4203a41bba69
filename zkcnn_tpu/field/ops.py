"""Device-side helpers on top of the limb field: signed views, bit
decomposition, gate scatter-accumulation.

These replace the reference's per-scalar mcl calls used in witness
generation and the sumcheck inits:
  * `Fr::isNegative` / `getInt64` (reference src/neuralNetwork.cpp:899-916)
    become batched sign/magnitude extraction over limb tensors;
  * the per-gate `mult_array[u] += beta_g[g] * ...` scatter loops
    (reference src/prover.cpp:224-233,286-305) become `segment_sum_field`,
    an exact modular segment-sum built from 8-bit limb planes so the
    uint32 accumulators can never overflow for fan-in < 2^16.
"""

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from .params import LIMB_BITS, LIMB_MASK
from .limbs import FR, add_base16, resolve
from ..warm import zjit

_MASK8 = np.uint32(0xFF)  # host constant (see limbs.py _MASK note)


def to_plain(f, x):
    """Montgomery limbs -> plain (standard form) limbs, same shape."""
    return f.mont_redc(x, f.n)


def _ge_limbs(a, b_const):
    """a >= b for base-2^16 limb tensors (b_const is a [n] numpy array).

    Lexicographic compare from the top limb down, fully vectorized.
    """
    b = jnp.asarray(b_const)
    gt = a > b
    lt = a < b
    # highest differing limb decides; scan from top
    res = jnp.zeros(a.shape[:-1], jnp.bool_)
    decided = jnp.zeros(a.shape[:-1], jnp.bool_)
    for i in range(a.shape[-1] - 1, -1, -1):
        res = jnp.where(~decided & gt[..., i], True, res)
        decided = decided | gt[..., i] | lt[..., i]
    return jnp.where(decided, res, True)  # equal -> >=


class SignedView:
    """Batched (sign, |v|) decomposition of field elements that encode
    small signed integers (|v| < p/2), mirroring mcl's isNegative/getInt64
    semantics (x is negative iff its standard form >= (p+1)/2)."""

    def __init__(self, f):
        self.f = f
        half = (f.p + 1) >> 1
        from .params import to_limbs
        self.half_limbs = np.array(to_limbs(half, f.n), np.uint32)

    @partial(zjit, static_argnums=0)
    def split(self, x_mont):
        """-> (neg [...] bool, abs_plain [..., n] plain-form limbs)."""
        f = self.f
        plain = to_plain(f, x_mont)
        neg = _ge_limbs(plain, self.half_limbs)
        # p - plain, via two's complement style: (R - plain) + (p - R) ... do
        # direct: p - v. Use add of (~v) + 1 + p - 2^(16n) won't fit; instead
        # subtract with borrow chain via add_base16 of complement.
        p_limbs = jnp.asarray(f.p_limbs)
        comp = plain ^ np.uint32(LIMB_MASK)
        p_minus, _ = add_base16(jnp.broadcast_to(p_limbs, plain.shape), comp,
                                extra_one=True)
        return neg, jnp.where(neg[..., None], p_minus, plain)

    @partial(zjit, static_argnums=0)
    def to_hilo(self, x_mont):
        """-> (neg, hi32, lo32): |v| as two uint32 words (exact for
        |v| < 2^64)."""
        neg, a = self.split(x_mont)
        lo = a[..., 0] | (a[..., 1] << 16)
        hi = a[..., 2] | (a[..., 3] << 16)
        return neg, hi, lo

    def bit(self, abs_plain, shift: int):
        """(|v| >> shift) & 1 from plain limbs -> uint32 0/1."""
        return (abs_plain[..., shift // LIMB_BITS]
                >> (shift % LIMB_BITS)) & np.uint32(1)

    def bits_range(self, abs_plain, shifts):
        """Gather several bit positions: returns [..., len(shifts)]."""
        idx = np.asarray([s // LIMB_BITS for s in shifts], np.int32)
        off = np.asarray([s % LIMB_BITS for s in shifts], np.uint32)
        return (abs_plain[..., idx] >> jnp.asarray(off)) & np.uint32(1)


SIGNED_FR = SignedView(FR)

from ..warm import register_static  # noqa: E402
register_static("SIGNED_FR", SIGNED_FR)


def bits_to_mont(bits):
    """0/1 uint32 tensor [...] -> Montgomery limbs [..., n] (0 -> 0,
    1 -> R mod p), with a single select (no general conversion)."""
    one = jnp.asarray(FR.one_mont)
    out = jnp.where(bits[..., None] > 0, one,
                    jnp.zeros(bits.shape + (FR.n,), jnp.uint32))
    return out


@partial(zjit, static_argnums=(2,))
def _segment_sum_raw(vals, seg_ids, num_segments: int):
    """The exact 8-bit-plane segment sums (slo, shi) [S, n] uint32."""
    lo8 = (vals & _MASK8).astype(jnp.uint32)
    hi8 = ((vals >> 8) & _MASK8).astype(jnp.uint32)
    slo = jax.ops.segment_sum(lo8, seg_ids, num_segments=num_segments)
    shi = jax.ops.segment_sum(hi8, seg_ids, num_segments=num_segments)
    return slo, shi


@zjit
def _segment_sum_finish(slo, shi):
    """Renormalize the plane sums and Montgomery-reduce -> [S, n]."""
    f = FR
    # slo, shi < count*255 <= 2^16*255 < 2^24.  The exact value is
    # sum_j slo_j*2^(16j) + shi_j*2^(16j+8); combine as two base-2^16
    # numbers so no column ever exceeds 2^32:
    w = f.n + 1
    a = resolve(slo, w)
    shi_lo = (shi << 8) & np.uint32(LIMB_MASK)
    shi_hi = shi >> 8                              # < 2^16
    cols2 = jnp.zeros(shi.shape[:-1] + (shi.shape[-1] + 1,), jnp.uint32)
    cols2 = cols2.at[..., : shi.shape[-1]].add(shi_lo)
    cols2 = cols2.at[..., 1 : shi.shape[-1] + 1].add(shi_hi)
    b = resolve(cols2, w)
    s, _ = add_base16(a, b)
    red = f.mont_redc(s, w)
    r2 = jnp.asarray(f.r2_limbs)
    return f.mul(red, jnp.broadcast_to(r2, red.shape))


# beyond this many output segments the finish stage runs in row blocks:
# its REDC shift-matmul temporaries are ~40x the output size, which at
# S = 2^24 requested 20 GB of HLO temps in one program (the vgg11 Liu
# OOM, results/vgg11_pic1_tpu_r4_nopcs3.log)
_FINISH_BLOCK = 1 << 20


def segment_sum_field(vals, seg_ids, num_segments: int):
    """Exact modular scatter-add: out[s] = sum of vals[i] with
    seg_ids[i] == s.  vals: [G, n] Montgomery limbs; out [S, n].

    Strategy: split 16-bit limbs into 8-bit planes so a uint32
    segment_sum is exact for up to 2^16 values per segment (max column
    value 2^16 * 255 * 2 < 2^32 after the recombine), then renormalize
    and Montgomery-reduce like `Field.sum` -- blockwise when S is
    large (see _FINISH_BLOCK).
    """
    slo, shi = _segment_sum_raw(vals, seg_ids, num_segments)
    if num_segments <= _FINISH_BLOCK:
        return _segment_sum_finish(slo, shi)
    outs = [_segment_sum_finish(slo[s: s + _FINISH_BLOCK],
                                shi[s: s + _FINISH_BLOCK])
            for s in range(0, num_segments, _FINISH_BLOCK)]
    return jnp.concatenate(outs)
