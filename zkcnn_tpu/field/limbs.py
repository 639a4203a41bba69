"""Batched prime-field arithmetic in 16-bit limb planes (TPU-native).

Replaces the reference's scalar mcl `Fr`/`Fp` bignums (used throughout
src/prover.cpp, src/utils.cpp) with tensors of shape [..., n_limbs]
(dtype uint32, base-2^16 little-endian limbs, values in Montgomery form).

Design rules for TPU/XLA:
  * No data-dependent control flow: carries resolve in O(log n) via a
    Kogge-Stone generate/propagate prefix scan (lax.associative_scan).
  * All ops are pure elementwise/VPU work over arbitrary leading batch
    dims, so XLA fuses chains of them into single kernels.
  * uint32 only.  A 16x16-bit product fits uint32 exactly; schoolbook
    column sums stay < 2^22 for <= 2*24 partial products per column.

Montgomery form: a tensor holds a*R mod p with R = 2^(16*n).  Host-side
protocol scalars are plain Python ints; `Field.to_mont_host` /
`Field.from_mont_host` convert at the boundary.
"""

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from .params import LIMB_BITS, LIMB_MASK, n_limbs_for, to_limbs, from_limbs

# numpy (host) constant, NOT jnp: a module-level device scalar would be
# captured as a jax.Array constant in every traced function that uses
# it, and MLIR lowering then fetches it device->host -- over the axon
# tunnel the first such fetch costs ~70s per process (measured).
_MASK = np.uint32(LIMB_MASK)


def ml_bfloat16():
    import ml_dtypes
    return ml_dtypes.bfloat16


def add_base16(a, b, extra_one: bool = False):
    """Exact add of two base-2^16 numbers (limbs < 2^16, same width).

    Returns (limbs, carry_out) with carry_out in {0,1} (uint32 [...]).
    If extra_one, adds 1 at limb 0 (used by two's-complement subtract).

    Carry resolution is a hand-unrolled Kogge-Stone prefix over
    generate/propagate bits packed into one uint32 word (bit0 = g,
    bit1 = p) — ~2.4x faster than lax.associative_scan on TPU.
    """
    s = a + b
    if extra_one:
        s = s.at[..., 0].add(np.uint32(1))
    g = (s >> LIMB_BITS).astype(jnp.uint32)
    p = ((s & _MASK) == _MASK).astype(jnp.uint32)
    gp = g | (p << 1)
    n = a.shape[-1]
    pad = [(0, 0)] * (a.ndim - 1)
    d = 1
    while d < n:
        prev = jnp.pad(gp, pad + [(d, 0)])[..., :n]
        gl, pl = prev & 1, (prev >> 1) & 1
        gr, pr = gp & 1, (gp >> 1) & 1
        gp = (gr | (gl & pr)) | ((pl & pr) << 1)
        d <<= 1
    carry = gp & 1
    carry_in = jnp.pad(carry, pad + [(1, 0)])[..., :n]
    out = (s + carry_in) & _MASK
    return out, carry[..., -1]


def resolve(cols, out_len: int):
    """Normalize columns (each < 2^32, weight 2^(16k)) to base-2^16 limbs.

    The caller guarantees the value fits in out_len limbs (overflow limbs
    are dropped).  One lo/hi split turns the columns into two proper
    base-2^16 numbers, then a single carry-add finishes exactly.
    """
    k = cols.shape[-1]
    lo = cols & _MASK
    hi = cols >> LIMB_BITS
    if k < out_len:
        pad = [(0, 0)] * (cols.ndim - 1) + [(0, out_len - k)]
        lo = jnp.pad(lo, pad)
        hi = jnp.pad(hi, pad)
    else:
        lo = lo[..., :out_len]
        hi = hi[..., :out_len]
    hi_shift = jnp.concatenate(
        [jnp.zeros_like(hi[..., :1]), hi[..., : out_len - 1]], axis=-1)
    out, _ = add_base16(lo, hi_shift)
    return out


from functools import lru_cache


import os

# Limb-product strategy:
#   "f32":  16-bit limb products in uint32, lo/hi split to f32, one
#           shift-matmul at Precision.HIGHEST (6-pass bf16 on the MXU).
#   "bf16": split operands to 8-bit planes first; every operand is
#           bf16-exact, so a single DEFAULT-precision bf16 matmul pass
#           is exact (f32 accumulation, all values < 2^22 < 2^24).
#           3x fewer MXU passes and less re-read traffic.
# Measured on v5e: f32/HIGHEST reaches ~33M field-muls/s in the fused
# sumcheck round vs ~19M for the bf16 split (the 4x larger partial
# product tensor is the bottleneck — the path is HBM-traffic-bound).
# Fusing the outer product + shift-reduce in a Pallas kernel is the
# planned fix; until then f32 is the default.
MUL_BACKEND = os.environ.get("ZKCNN_TPU_MUL", "f32")


@lru_cache(maxsize=32)
def _shift_matrix8(na8: int, nb8: int, out8: int):
    """[2*na8*nb8, out8] 0/1 matrix: row (plane, k, l) routes the
    lo/hi 8-bit half of the plane product a8_k*b8_l to base-2^8 column
    k+l (+1 for hi)."""
    M = np.zeros((2 * na8 * nb8, out8), np.float32)
    for k in range(na8):
        for l in range(nb8):
            if k + l < out8:
                M[k * nb8 + l, k + l] = 1.0
            if k + l + 1 < out8:
                M[na8 * nb8 + k * nb8 + l, k + l + 1] = 1.0
    return M


def _split8(a):
    """[..., n] 16-bit limbs -> [..., 2n] 8-bit planes (base 256)."""
    lo = a & np.uint32(0xFF)
    hi = (a >> 8) & np.uint32(0xFF)
    return jnp.stack([lo, hi], axis=-1).reshape(*a.shape[:-1],
                                                a.shape[-1] * 2)


@lru_cache(maxsize=8)
def _shift_matrix8_flat(n8: int, out8: int):
    """[n8*n8, out8] 0/1 matrix: row k*n8+l -> base-2^8 column k+l."""
    M = np.zeros((n8 * n8, out8), np.float32)
    for k in range(n8):
        for l in range(n8):
            if k + l < out8:
                M[k * n8 + l, k + l] = 1.0
    return M


def _resolve8(cols8, out_len: int):
    """Base-2^8 columns (each < 2^32) -> normalized base-2^16 limbs."""
    even = cols8[..., 0::2]
    odd = cols8[..., 1::2]
    A = resolve(even, out_len)
    B = resolve(odd, out_len)
    sh = (B << 8) & _MASK
    carry = B >> 8
    carry = jnp.concatenate([jnp.zeros_like(carry[..., :1]),
                             carry[..., :-1]], axis=-1)
    C = resolve(sh + carry, out_len)
    out, _ = add_base16(A, C)
    return out


def _mul_cols_bf16(a, b, out_len: int):
    """Single-pass MXU variant: operands split to 8-bit planes, plane
    products (< 2^16, exact in uint32) split again to 8-bit halves, so
    every matmul operand is bf16-exact and ONE default-precision bf16
    pass is exact (f32 accumulation; columns < 2^15)."""
    a8 = _split8(a)
    b8 = _split8(b)
    na8, nb8 = a8.shape[-1], b8.shape[-1]
    out8 = 2 * out_len
    prods = a8[..., :, None] * b8[..., None, :]            # < 2^16
    lo = (prods & np.uint32(0xFF)).astype(jnp.bfloat16)
    hi = (prods >> 8).astype(jnp.bfloat16)
    flat = jnp.concatenate(
        [lo.reshape(*a8.shape[:-1], na8 * nb8),
         hi.reshape(*a8.shape[:-1], na8 * nb8)], axis=-1)
    M = jnp.asarray(_shift_matrix8(na8, nb8, out8)).astype(jnp.bfloat16)
    cols8 = jnp.dot(flat, M, preferred_element_type=jnp.float32)
    cols8 = cols8.astype(jnp.uint32)                        # < 2^15
    return cols8[..., 0::2] + (cols8[..., 1::2] << 8)       # base 2^16


@lru_cache(maxsize=32)
def _shift_matrix(na: int, nb: int, out_len: int):
    """[2*na*nb, out_len] 0/1 f32 matrix routing lo/hi halves of the
    schoolbook partial products to their weight-2^(16k) column.

    Turning column accumulation into one dense f32 matmul keeps the XLA
    graph tiny (fast compiles) and runs on the MXU on TPU.  Exactness:
    every operand is an integer < 2^16 and each column sums at most
    2*min(na,nb) of them, so all f32 values stay far below 2^24.
    """
    M = np.zeros((2 * na * nb, out_len), np.float32)
    for i in range(na):
        for j in range(nb):
            if i + j < out_len:
                M[i * nb + j, i + j] = 1.0
            if i + j + 1 < out_len:
                M[na * nb + i * nb + j, i + j + 1] = 1.0
    return M


def _mul_cols(a, b, out_len: int):
    if MUL_BACKEND == "bf16":
        return _mul_cols_bf16(a, b, out_len)
    na, nb = a.shape[-1], b.shape[-1]
    prods = a[..., :, None] * b[..., None, :]
    lo = (prods & _MASK).astype(jnp.float32).reshape(*prods.shape[:-2],
                                                     na * nb)
    hi = (prods >> LIMB_BITS).astype(jnp.float32).reshape(*prods.shape[:-2],
                                                          na * nb)
    flat = jnp.concatenate([lo, hi], axis=-1)
    # precision=HIGHEST: on TPU the MXU computes f32 matmuls via bf16
    # multi-pass decomposition; the default 3-pass drops low-order
    # cross terms and would corrupt >16-bit integer columns.  HIGHEST
    # (6-pass) is exact for f32, which our < 2^24 integers require.
    cols = jnp.dot(flat, jnp.asarray(_shift_matrix(na, nb, out_len)),
                   preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)
    return cols.astype(jnp.uint32)


def mul_wide(a, b):
    """Schoolbook product columns: [..., na] x [..., nb] -> [..., na+nb]."""
    return _mul_cols(a, b, a.shape[-1] + b.shape[-1])


def mul_low(a, b, n: int):
    """Low n columns of the schoolbook product (i.e. product mod 2^(16n))."""
    return _mul_cols(a, b, n)


class Field:
    """A prime field with batched device ops and host scalar helpers."""

    def __init__(self, p: int, name: str):
        self.p = p
        self.name = name
        self.n = n_limbs_for(p)
        self.R = 1 << (LIMB_BITS * self.n)
        self.R_inv = pow(self.R, -1, p)
        self.R2 = (self.R * self.R) % p
        self.p_prime = (-pow(p, -1, self.R)) % self.R
        # numpy constants (moved to device lazily by jnp broadcasting)
        self.p_limbs = np.array(to_limbs(p, self.n), np.uint32)
        self.negp_limbs = np.array(to_limbs(self.R - p, self.n), np.uint32)
        self.pp_limbs = np.array(to_limbs(self.p_prime, self.n), np.uint32)
        self.r2_limbs = np.array(to_limbs(self.R2, self.n), np.uint32)
        self.zero = np.zeros(self.n, np.uint32)
        self.one_mont = self.to_mont_host(1)

    # ---------- host scalar <-> limb conversion ----------

    def to_mont_host(self, x: int) -> np.ndarray:
        return np.array(to_limbs((x % self.p) * self.R % self.p, self.n),
                        np.uint32)

    def from_mont_host(self, limbs) -> int:
        return from_limbs(np.asarray(limbs)) * self.R_inv % self.p

    def pack_mont_host(self, xs) -> np.ndarray:
        """[k] python ints -> [k, n] Montgomery limbs."""
        out = np.empty((len(xs), self.n), np.uint32)
        for i, x in enumerate(xs):
            out[i] = self.to_mont_host(x)
        return out

    def unpack_mont_host(self, arr) -> list:
        arr = np.asarray(arr).reshape(-1, self.n)
        return [self.from_mont_host(a) for a in arr]

    # ---------- device ops (jit-friendly, arbitrary batch dims) ----------

    def cond_sub_p(self, x):
        negp = jnp.asarray(self.negp_limbs)
        s, carry = add_base16(x, jnp.broadcast_to(negp, x.shape))
        return jnp.where((carry > 0)[..., None], s, x)

    def add(self, a, b):
        a, b = jnp.broadcast_arrays(a, b)
        s, _ = add_base16(a, b)  # a+b < 2p < R, no overflow
        return self.cond_sub_p(s)

    def sub(self, a, b):
        a, b = jnp.broadcast_arrays(a, b)
        s, carry = add_base16(a, b ^ _MASK, extra_one=True)
        s2, _ = add_base16(s, jnp.broadcast_to(jnp.asarray(self.p_limbs),
                                               s.shape))
        return jnp.where((carry > 0)[..., None], s, s2)

    def neg(self, a):
        return self.sub(jnp.zeros_like(a), a)

    def mont_redc(self, limbs, width: int):
        """(value * R^-1) mod p for a base-2^16 value < R*p of `width` limbs."""
        n = self.n
        lo_n = limbs[..., :n] if width >= n else jnp.pad(
            limbs, [(0, 0)] * (limbs.ndim - 1) + [(0, n - width)])
        m_cols = mul_low(lo_n, jnp.asarray(self.pp_limbs), n)
        m = resolve(m_cols, n)
        u_cols = mul_wide(m, jnp.asarray(self.p_limbs))  # 2n cols
        pad = 2 * n - width
        t_full = limbs if pad == 0 else (
            jnp.pad(limbs, [(0, 0)] * (limbs.ndim - 1) + [(0, pad)])
            if pad > 0 else limbs[..., : 2 * n])
        u = resolve(u_cols + t_full, 2 * n)
        return self.cond_sub_p(u[..., n:])

    def mul(self, a, b):
        """Montgomery product: (a*b*R^-1) mod p, inputs/outputs Montgomery."""
        a, b = jnp.broadcast_arrays(a, b)
        t_cols = mul_wide(a, b)
        t = resolve(t_cols, 2 * self.n)
        return self.mont_redc(t, 2 * self.n)

    def mul_const(self, a, c_int: int):
        """Multiply by a host scalar (plain int, converted here)."""
        return self.mul_scalar(a, jnp.asarray(self.to_mont_host(c_int)))

    def _toeplitz8(self, r8, out8: int):
        """[2n, out8] banded matrix T[i, m] = r8[m - i] (else 0):
        multiplying 8-bit planes by T yields the base-2^8 product
        columns of x * r."""
        n8 = 2 * self.n
        i = jnp.arange(n8)[:, None]
        m = jnp.arange(out8)[None, :]
        d = m - i
        valid = (d >= 0) & (d < n8)
        return jnp.where(valid, r8[jnp.clip(d, 0, n8 - 1)],
                         0).astype(jnp.bfloat16)

    def mul_scalar(self, x, r_pack):
        """x * r for a SINGLE Montgomery scalar r broadcast over the
        whole tensor — the sumcheck fold's workhorse.

        Because r is shared, the limb convolution is a matmul against
        a banded (Toeplitz) matrix built from r's 8-bit planes: the MXU
        contracts the limb axis and no per-element partial-product
        tensor is ever materialized.  All operands are < 2^8 (bf16
        exact); every column stays < 2^23 (f32-exact accumulation).
        """
        x8 = _split8(x).astype(jnp.bfloat16)              # [..., 2n]
        r8 = _split8(r_pack.reshape(-1))                  # [2n]
        T1 = self._toeplitz8(r8, 4 * self.n)
        t8 = jnp.dot(x8, T1, preferred_element_type=jnp.float32)
        return self._redc_cols8(t8.astype(jnp.uint32))    # < 2^21

    def lincomb2_scalar(self, x, y, rx_pack, ry_pack):
        """x*rx + y*ry for two shared Montgomery scalars, with a single
        fused Montgomery reduction — the fold kernel
        X' = (1-r)*even + r*odd uses this (one reduction instead of
        sub + mul + add: 3 carry resolutions instead of 7)."""
        out8 = 4 * self.n
        x8 = _split8(x).astype(jnp.bfloat16)
        y8 = _split8(y).astype(jnp.bfloat16)
        Tx = self._toeplitz8(_split8(rx_pack.reshape(-1)), out8)
        Ty = self._toeplitz8(_split8(ry_pack.reshape(-1)), out8)
        t8 = jnp.dot(x8, Tx, preferred_element_type=jnp.float32) \
            + jnp.dot(y8, Ty, preferred_element_type=jnp.float32)
        return self._redc_cols8(t8.astype(jnp.uint32))    # < 2^22

    def _redc_cols8(self, t8):
        """Montgomery-reduce base-2^8 product columns (< 2^23) of a
        value t < 2*R*p: returns t*R^-1 mod p canonical limbs."""
        n = self.n
        n8 = 2 * n
        out8 = 2 * n8
        # m = (t mod R) * p' mod R, fed as three 8-bit digit planes of
        # the base-2^8 columns (values < 2^23 -> 3 planes)
        u0 = t8 & np.uint32(0xFF)
        u1 = (t8 >> 8) & np.uint32(0xFF)
        u2 = t8 >> 16                                      # < 2^5
        # position-shifted concat: plane j contributes at column k + j;
        # only columns < 2n matter (mod R)
        def shifted(u, off):
            z = u[..., : n8 - off]
            if off:
                z = jnp.concatenate(
                    [jnp.zeros_like(u[..., :off]), z], axis=-1)
            return z
        planes = jnp.concatenate(
            [shifted(u0, 0), shifted(u1, 1), shifted(u2, 2)],
            axis=-1).astype(jnp.bfloat16)                  # [..., 3*2n]
        pp8 = jnp.asarray(self._pp8_const())
        m8 = jnp.dot(planes, pp8, preferred_element_type=jnp.float32)
        m8 = m8.astype(jnp.uint32)                         # < 2^23
        m16 = m8[..., 0::2] + (m8[..., 1::2] << 8)         # < 2^31
        m = resolve(m16, n)                                # canonical < R

        # u = t + m*p; u/R < 2p
        mp8 = jnp.dot(_split8(m).astype(jnp.bfloat16),
                      jnp.asarray(self._p8_const(out8)),
                      preferred_element_type=jnp.float32).astype(jnp.uint32)
        tot8 = mp8 + t8                                    # < 2^22
        tot16 = tot8[..., 0::2] + (tot8[..., 1::2] << 8)   # < 2^30.1
        u = resolve(tot16, n8 + 1)
        # u = (t + m*p) < 1.5*R*p, so u/R < 1.5p fits n limbs (top is 0)
        return self.cond_sub_p(u[..., n: n8])

    @staticmethod
    def _toeplitz8_np(limbs16: np.ndarray, out8: int) -> np.ndarray:
        v8 = []
        for l in limbs16:
            v8 += [int(l) & 0xFF, (int(l) >> 8) & 0xFF]
        n8 = len(v8)
        M = np.zeros((n8, out8), np.float32)
        for i in range(n8):
            for mm in range(i, min(out8, i + n8)):
                M[i, mm] = v8[mm - i]
        return M

    def _pp8_const(self):
        if not hasattr(self, "_pp8_cache"):
            T = self._toeplitz8_np(self.pp_limbs, 2 * self.n)
            full = np.concatenate([T, T, T], axis=0)
            # convert on host: caching a traced astype would leak tracers
            self._pp8_cache = np.asarray(full, dtype=ml_bfloat16())
        return jnp.asarray(self._pp8_cache)

    def _p8_const(self, out8: int):
        key = "_p8_cache_%d" % out8
        if not hasattr(self, key):
            T = self._toeplitz8_np(self.p_limbs, out8)
            setattr(self, key, np.asarray(T, dtype=ml_bfloat16()))
        return jnp.asarray(getattr(self, key))

    # ---------- lazy-reduction inner products ----------
    #
    # The sumcheck round kernels are dominated by sums of products.
    # Montgomery-reducing every product is wasteful: instead we keep the
    # raw schoolbook columns (one f32 matmul per pair), accumulate them
    # exactly in uint32 with chunked renormalization, and run TWO
    # generalized Montgomery steps + one constant mul at the very end.
    # This cuts both the op count (XLA compile time) and the arithmetic
    # per element by ~3x versus reduce-then-sum.

    def redc_step(self, limbs, width: int):
        """One Montgomery division step on an exact base-2^16 integer of
        `width` limbs: returns (V + m*p)/R as limbs of width
        max(width, 2n) + 1 - n.  Exact for any V; low n limbs of the sum
        are provably zero and dropped."""
        n = self.n
        t_lo = limbs[..., :n] if width >= n else jnp.pad(
            limbs, [(0, 0)] * (limbs.ndim - 1) + [(0, n - width)])
        m1 = resolve(mul_low(t_lo, jnp.asarray(self.pp_limbs), n), n)
        u_cols = mul_wide(m1, jnp.asarray(self.p_limbs))       # 2n cols
        W2 = max(width, 2 * n) + 1
        padw = [(0, 0)] * (limbs.ndim - 1)
        u_cols = jnp.pad(u_cols, padw + [(0, W2 - 2 * n)])
        t_cols = jnp.pad(limbs, padw + [(0, W2 - width)])
        u = resolve(u_cols + t_cols, W2)
        return u[..., n:]

    def reduce_wide(self, limbs, width: int):
        """Exact integer V (< 2^(16*width), width <= 2n+4) -> Montgomery
        form of V * R^-2 * R = canonical residue trajectory used by
        dot_mont; see caller."""
        x = self.redc_step(limbs, width)            # V/R-ish
        w2 = max(width, 2 * self.n) + 1 - self.n
        x = self.redc_step(x, w2)                   # V/R^2-ish, < 2p
        x = self.cond_sub_p(x[..., : self.n])
        r2 = jnp.asarray(self.r2_limbs)
        return self.mul(x, jnp.broadcast_to(r2, x.shape))

    def dot_mont(self, a, b, axis: int = -2):
        """Exact modular sum_i a_i*b_i for Montgomery inputs; returns
        Montgomery limbs with the summed axis removed.

        MXU formulation: sum_i a_i (x) b_i == A^T B — the element axis
        is CONTRACTED on the systolic array, so no per-element partial
        products ever touch HBM.  8-bit operand planes are bf16-exact
        and chunks of 256 elements keep the f32 accumulators < 2^24.
        """
        if axis != -2:
            a = jnp.moveaxis(a, axis, -2)
            b = jnp.moveaxis(b, axis, -2)
        a, b = jnp.broadcast_arrays(a, b)
        m = a.shape[-2]
        T = 256                              # f32-exact contraction depth
        k = -(-m // T)
        if m != k * T:
            padw = [(0, 0)] * (a.ndim - 2) + [(0, k * T - m), (0, 0)]
            a = jnp.pad(a, padw)
            b = jnp.pad(b, padw)
        a8 = _split8(a).reshape(*a.shape[:-2], k, T, 2 * self.n)
        b8 = _split8(b).reshape(*b.shape[:-2], k, T, 2 * self.n)
        O = jnp.einsum("...cti,...ctj->...cij",
                       a8.astype(jnp.bfloat16), b8.astype(jnp.bfloat16),
                       preferred_element_type=jnp.float32)
        O = O.astype(jnp.uint32)             # [..., k, 2n8, 2n8] < 2^24
        # route plane products to base-2^8 columns: two f32-exact
        # passes over the 16-bit halves of O
        n8 = 2 * self.n
        out8 = 2 * n8                        # 64 base-2^8 columns
        M = jnp.asarray(_shift_matrix8_flat(n8, out8))
        Of = O.reshape(*O.shape[:-2], n8 * n8)
        lo = jnp.dot((Of & np.uint32(0xFFFF)).astype(jnp.float32), M,
                     preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST)
        hi = jnp.dot((Of >> 16).astype(jnp.float32), M,
                     preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST)
        cols_lo = lo.astype(jnp.uint32)      # [..., k, 64] < 2^21
        cols_hi = hi.astype(jnp.uint32)      # < 2^13, weight 2^16 extra

        def chunk_sum(c, ch):
            mm = c.shape[-2]
            kk = -(-mm // ch)
            if mm != kk * ch:
                pw = [(0, 0)] * (c.ndim - 2) + [(0, kk * ch - mm), (0, 0)]
                c = jnp.pad(c, pw)
            c = c.reshape(c.shape[:-2] + (kk, ch, c.shape[-1]))
            return jnp.sum(c, axis=-2, dtype=jnp.uint32)

        # one uint32-safe chunked sum over the contraction chunks
        # (same chunking for both so the row counts line up)
        cols_lo = chunk_sum(cols_lo, 1 << 10)   # 2^21 * 2^10 < 2^32
        cols_hi = chunk_sum(cols_hi, 1 << 10)   # far below overflow
        # per remaining row: exact base-2^16 limbs, combine lo + hi<<16
        w = 2 * self.n + 3
        Ls = _resolve8(cols_lo, w)
        Hs = _resolve8(cols_hi, w)
        Hs = jnp.concatenate(
            [jnp.zeros_like(Hs[..., :1]), Hs[..., :-1]], axis=-1)
        rows, _ = add_base16(Ls, Hs)            # [..., k2, w] exact rows
        # base-2^16 ladder over the remaining rows (like Field.sum)
        width = w
        limbs = rows
        while limbs.shape[-2] > 1:
            limbs = chunk_sum(limbs, 1 << 11)
            width += 1
            limbs = resolve(limbs, width)
        return self.reduce_wide(limbs[..., 0, :], width)

    def sum(self, x, axis: int = -2):
        """Exact modular sum along `axis` (x in Montgomery form, [..., n]).

        Strategy: group <=2^11 values per level and accumulate raw uint32
        columns (< 2^11 * 2^16 = 2^27, overflow-free), renormalize to
        width+1 limbs, repeat.  The final wide value V = sum of Montgomery
        residues satisfies V < M*p << R*p, so one Montgomery reduction gives
        V/R mod p = plain sum; multiplying by R^2 restores Montgomery form.
        """
        if axis != -2:
            x = jnp.moveaxis(x, axis, -2)
        CH = 1 << 11
        limbs = x
        width = self.n
        while limbs.shape[-2] > 1:
            m = limbs.shape[-2]
            k = -(-m // CH)
            if m != k * CH:
                padw = [(0, 0)] * (limbs.ndim - 2) + [(0, k * CH - m), (0, 0)]
                limbs = jnp.pad(limbs, padw)
            limbs = limbs.reshape(limbs.shape[:-2] + (k, CH, width))
            cols = jnp.sum(limbs, axis=-2, dtype=jnp.uint32)
            width = width + 1
            assert width <= 2 * self.n, "sum width overflow (impossible sizes)"
            limbs = resolve(cols, width)
        limbs = limbs[..., 0, :]
        red = self.mont_redc(limbs, width)
        r2 = jnp.asarray(self.r2_limbs)
        return self.mul(red, jnp.broadcast_to(r2, red.shape))

    def dot(self, a, b, axis: int = -2):
        return self.dot_mont(a, b, axis=axis)

    # ---------- conversions for witness data ----------

    def from_int64(self, v):
        """Signed int64 numpy array -> Montgomery limbs (device).

        Exact for |v| < 2^63.  Negative values map to p - |v|.
        """
        v = np.asarray(v, np.int64)
        a = np.abs(v).astype(np.uint64)
        plain = np.zeros(v.shape + (self.n,), np.uint32)
        for i in range(4):  # 64 bits = 4 limbs
            plain[..., i] = ((a >> (16 * i)) & np.uint64(LIMB_MASK)).astype(
                np.uint32)
        neg = v < 0
        if neg.any():
            # p - a, big-int subtract with borrow (host, vectorized)
            borrow = np.zeros(v.shape, np.int64)
            out = np.zeros_like(plain)
            for i in range(self.n):
                d = (np.int64(self.p_limbs[i]) - plain[..., i].astype(np.int64)
                     - borrow)
                borrow = (d < 0).astype(np.int64)
                out[..., i] = (d + (borrow << 16)).astype(np.uint32)
            plain = np.where(neg[..., None], out, plain)
        # to-Montgomery multiply in jitted chunks: one eager whole-array
        # mul materializes [N, 2*n*n] f32 shift-matmul operands (~10GB
        # at vgg's 10^7-element input witness); 2^19-row pieces bound
        # the working set to ~0.5GB
        if not hasattr(self, "_to_mont_jit"):
            self._to_mont_jit = _to_mont_prog(self.name)
        r2 = jnp.asarray(self.r2_limbs)
        flat = plain.reshape(-1, self.n)
        ch = 1 << 19
        if flat.shape[0] <= ch:
            out = self._to_mont_jit(jnp.asarray(flat), r2)
        else:
            out = jnp.concatenate(
                [self._to_mont_jit(jnp.asarray(flat[s: s + ch]), r2)
                 for s in range(0, flat.shape[0], ch)])
        return out.reshape(v.shape + (self.n,))

    def to_int_host(self, limbs) -> np.ndarray:
        """Montgomery limbs -> python-int objects array (host, exact)."""
        arr = np.asarray(limbs)
        flat = arr.reshape(-1, self.n)
        out = np.empty(flat.shape[0], object)
        for i in range(flat.shape[0]):
            out[i] = self.from_mont_host(flat[i])
        return out.reshape(arr.shape[:-1])

    def from_bigint(self, v):
        """Object array of python ints (any size, any sign) -> Montgomery
        limbs (device).  Values are reduced mod p; exactness does not
        depend on magnitude (unlike from_int64)."""
        v = np.asarray(v, object)
        rem = v % self.p                       # object elementwise mod
        plain = np.zeros(v.shape + (self.n,), np.uint32)
        for i in range(self.n):
            plain[..., i] = (rem & 0xFFFF).astype(np.uint32)
            rem = rem >> 16
        if not hasattr(self, "_to_mont_jit"):
            self._to_mont_jit = _to_mont_prog(self.name)
        r2 = jnp.asarray(self.r2_limbs)
        flat = plain.reshape(-1, self.n)
        ch = 1 << 19
        if flat.shape[0] <= ch:
            out = self._to_mont_jit(jnp.asarray(flat), r2)
        else:
            out = jnp.concatenate(
                [self._to_mont_jit(jnp.asarray(flat[s: s + ch]), r2)
                 for s in range(0, flat.shape[0], ch)])
        return out.reshape(v.shape + (self.n,))

    def to_signed_host(self, limbs) -> np.ndarray:
        """Like to_int_host but mapped to (-p/2, p/2] (mcl getInt64 semantics,
        reference src/neuralNetwork.cpp:900,913)."""
        vals = self.to_int_host(limbs)
        half = self.p >> 1
        flat = vals.reshape(-1)
        for i in range(flat.shape[0]):
            if flat[i] > half:
                flat[i] -= self.p
        return vals


from .params import FR_P, FP_P  # noqa: E402

FR = Field(FR_P, "Fr")
FP = Field(FP_P, "Fp")

from ..warm import zjit, register_factory  # noqa: E402


@register_factory("field.limbs._to_mont_prog")
@lru_cache(maxsize=4)
def _to_mont_prog(field_name: str):
    """Jitted chunked to-Montgomery multiply for a named field
    (warm-replayable; `self`-closures would not resolve from a
    manifest)."""
    fld = {"Fr": FR, "Fp": FP}[field_name]
    return zjit(lambda x, r2: fld.mul(x, jnp.broadcast_to(r2, x.shape)),
                key="field.limbs._to_mont_prog",
                factory_args=(field_name,))


