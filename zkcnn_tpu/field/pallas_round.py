"""Pallas TPU kernel for the fused sumcheck round step.

One round of sumcheck over a 2m-entry operand pair (A, V) needs
(reference per-gate form src/prover.cpp:396-426; XLA form mle/fold.py):

  * the four pair inner products D_xy = sum_i A_{2i+x} * V_{2i+y}
    (the round message's quadratic coefficients are small host
    combinations of these), and
  * the folds A' = (1-r)*A_even + r*A_odd, V' likewise.

The XLA path materializes every matmul boundary (8-bit plane splits,
partial-product columns, Montgomery-reduction planes) in HBM -- ~10-30x
more traffic than the information content.  This kernel reads each
(A, V) tile from HBM ONCE, keeps all intermediates in VMEM/registers,
and writes only the folded halves plus a [64, 64] column-sum scratch
for the dots:

  HBM bytes/element: 128 read + 64 written  vs  ~1.5 KB for XLA.

Layout notes:
  * Tiles are [T, 16] uint32 limbs; the even/odd pair split is a FREE
    reshape to [T/2, 32] (row pairs are adjacent in memory).
  * 8-bit planes use BLOCK order (lanes 0..15 = lo bytes of limbs
    0..15, lanes 16..31 = hi bytes) -- no interleave shuffles; all
    host-built matrices are row-permuted to match (_perm_block).
  * The dots accumulate as one [64, 64] f32 MXU product per tile
    (rows = a0|a1 planes, cols = v0|v1 planes, giving all four D_xy
    blocks at once), split into lo/hi uint32 scratches so the exact
    integer survives up to 2^25 elements; the tiny Montgomery finish
    runs in XLA afterwards.
  * The folds are Toeplitz matmuls against per-round scalar matrices
    (built outside the kernel) followed by an in-kernel Montgomery
    reduction (field/limbs.py::_redc_cols8 math, block-order planes).
"""

from functools import lru_cache, partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .limbs import FR, add_base16, _resolve8
from .params import LIMB_BITS
from ..warm import zjit

N = 16                      # FR limbs
NP = 32                     # 8-bit planes per element
TILE = 512                  # rows per grid step ([T/2, 64] plane tiles)

# block-order plane k -> base-2^8 digit position
_PERM = np.array([2 * k if k < N else 2 * (k - N) + 1
                  for k in range(NP)])


def _perm_block(M_nat: np.ndarray) -> np.ndarray:
    """Row-permute a natural-digit-order [32, C] matrix to block order."""
    return M_nat[_PERM]


@lru_cache(maxsize=4)
def _pp8_block():
    """[96, 32] Montgomery p' planes for m = t*p' mod R (natural column
    digit order on both sides -- inputs are column planes, not limb
    planes, so no permute)."""
    T = FR._toeplitz8_np(FR.pp_limbs, 2 * N)
    return np.concatenate([T, T, T], axis=0).astype(np.float32)


@lru_cache(maxsize=4)
def _p8_nat():
    """[32, 64] p Toeplitz, natural digit order (rows = digit
    positions of the multiplier m's canonical digits)."""
    return FR._toeplitz8_np(FR.p_limbs, 4 * N).astype(np.float32)


def _split8_block(a):
    """[..., 16] uint32 limbs -> [..., 32] 8-bit planes, block order.
    Literal masks only (Pallas kernels may not capture array consts)."""
    return jnp.concatenate([a & 0xFF, (a >> 8) & 0xFF], axis=-1)


def _bf16(x):
    """uint32 (values < 2^16) -> bfloat16, via int32/f32 (Mosaic has no
    direct uint32->bf16 cast)."""
    return x.astype(jnp.int32).astype(jnp.float32).astype(jnp.bfloat16)


def _u32(xf):
    """f32 integral (< 2^31) -> uint32 via int32 (Mosaic-supported)."""
    return xf.astype(jnp.int32).astype(jnp.uint32)


def _shift_lanes(x, d: int):
    """Shift a [..., L] array right by d lanes, zero-filling."""
    if d == 0:
        return x
    return jnp.concatenate(
        [jnp.zeros_like(x[..., :d]), x[..., :-d]], axis=-1)


def _carry_kogge_stone(s, base_bits: int):
    """Resolve carries of per-lane sums s (each < 2*base) exactly:
    hand-unrolled Kogge-Stone generate/propagate prefix (limbs.py
    add_base16 math, any base).  -> (digits, carry_out [.., 1])."""
    mask = (1 << base_bits) - 1
    g = s >> base_bits
    p = ((s & mask) == mask).astype(jnp.uint32)
    gp = g | (p << 1)
    n = s.shape[-1]
    d = 1
    while d < n:
        prev = _shift_lanes(gp, d)
        gl, pl = prev & 1, (prev >> 1) & 1
        gr, pr = gp & 1, (gp >> 1) & 1
        gp = (gr | (gl & pr)) | ((pl & pr) << 1)
        d <<= 1
    carry = gp & 1
    out = (s + _shift_lanes(carry, 1)) & mask
    return out, carry[..., -1:]


def _add16_k(a, b, extra_one: bool = False):
    """Kernel-local exact base-2^16 add: -> (limbs, carry_out [.., 1])."""
    s = a + b
    if extra_one:
        lane = jax.lax.broadcasted_iota(jnp.uint32, s.shape, s.ndim - 1)
        s = s + (lane == 0).astype(jnp.uint32)
    return _carry_kogge_stone(s, LIMB_BITS)


def _sub16_k(a, b, p_row):
    """Kernel-local field subtract (limbs.Field.sub math): a - b with
    +p fixup on borrow; p_row broadcastable [.., 16]."""
    s, carry = _add16_k(a, b ^ 0xFFFF, extra_one=True)
    s2, _ = _add16_k(s, jnp.broadcast_to(p_row, s.shape))
    return jnp.where(carry > 0, s, s2)


def _pad_lanes(x, w: int):
    if x.shape[-1] >= w:
        return x[..., :w]
    z = jnp.zeros(x.shape[:-1] + (w - x.shape[-1],), x.dtype)
    return jnp.concatenate([x, z], axis=-1)


def _shifted_pad(x, d: int, w: int):
    """Place x at digit offset d inside width w (value * 2^(8d))."""
    return _pad_lanes(_shift_lanes(_pad_lanes(x, w), d), w)


def _resolve8_k(cols, out_len: int):
    """Kernel-local normalization of base-2^8 columns (each < 2^31) to
    canonical 8-bit digits [.., out_len].  Digit-domain only -- no
    strided lane slices (Mosaic lowers those as unsupported gathers)."""
    planes = [
        _shifted_pad(cols & 0xFF, 0, out_len),
        _shifted_pad((cols >> 8) & 0xFF, 1, out_len),
        _shifted_pad((cols >> 16) & 0xFF, 2, out_len),
        _shifted_pad(cols >> 24, 3, out_len),
    ]
    x = planes[0] + planes[1] + planes[2] + planes[3]   # < 2^10
    x = (x & 0xFF) + _shift_lanes(x >> 8, 1)            # < 259
    out, _ = _carry_kogge_stone(
        (x & 0xFF) + _shift_lanes(x >> 8, 1), 8)
    return out


def _digits_to_limbs(d):
    """[.., 32] canonical 8-bit digits -> [.., 16] base-2^16 limbs via
    a tiny in-trace bf16 matmul (lane-compaction without gathers)."""
    j = jax.lax.broadcasted_iota(jnp.int32, (NP, N), 0)
    l = jax.lax.broadcasted_iota(jnp.int32, (NP, N), 1)
    w = jnp.where(j % 2 == 0, 1.0, 256.0)
    C = jnp.where(j // 2 == l, w, 0.0).astype(jnp.bfloat16)
    return _u32(jnp.dot(_bf16(d), C,
                        preferred_element_type=jnp.float32))


def _redc_block(t8, pp8, p8n, consts8):
    """In-kernel Montgomery reduction of base-2^8 product columns
    (values < 2^23) -> canonical [.., 16] limbs.  Mirrors
    limbs.Field._redc_cols8, kept in the digit domain throughout.
    consts8: [2, 32] rows (2^256 - p, p) as 8-bit digits."""
    u0 = t8 & 0xFF
    u1 = (t8 >> 8) & 0xFF
    u2 = t8 >> 16

    planes = _bf16(jnp.concatenate(
        [_shift_lanes(u0, 0)[..., :NP], _shift_lanes(u1, 1)[..., :NP],
         _shift_lanes(u2, 2)[..., :NP]], axis=-1))     # [.., 96]
    m8 = _u32(jnp.dot(planes, pp8.astype(jnp.bfloat16),
                      preferred_element_type=jnp.float32))
    m_dig = _resolve8_k(m8, NP)                        # digits of m < R
    # m * p columns: natural-digit Toeplitz (rows = digit positions)
    mp8 = _u32(jnp.dot(_bf16(m_dig), p8n.astype(jnp.bfloat16),
                       preferred_element_type=jnp.float32))
    tot8 = mp8 + t8                                    # < 2^23
    u = _resolve8_k(tot8, 2 * NP + 2)                  # u = t + m*p
    x = u[..., NP: 2 * NP]                             # u / R < 2p
    # conditional subtract p: x + (2^256 - p), keep if it carried out
    s, carry = _carry_kogge_stone(
        x + jnp.broadcast_to(consts8[0:1], x.shape), 8)
    return _digits_to_limbs(jnp.where(carry > 0, s, x))


def _round_kernel(a_ref, v_ref, txy_ref, pp8_ref, p8_ref, consts_ref,
                  a2_ref, v2_ref, slo_ref, shi_ref):
    i = pl.program_id(0)
    a = a_ref[:]                                       # [T/2, 32] even|odd
    v = v_ref[:]
    ap = jnp.concatenate([_split8_block(a[:, :N]),
                          _split8_block(a[:, N:])], axis=-1)  # [T/2, 64]
    vp = jnp.concatenate([_split8_block(v[:, :N]),
                          _split8_block(v[:, N:])], axis=-1)

    # ---- dots: all four D_xy blocks in one MXU pass ----
    d = jax.lax.dot_general(
        _bf16(ap), _bf16(vp),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)            # [64, 64] < 2^24
    du = _u32(d)

    @pl.when(i == 0)
    def _():
        slo_ref[:] = jnp.zeros_like(slo_ref)
        shi_ref[:] = jnp.zeros_like(shi_ref)

    slo_ref[:] = slo_ref[:] + (du & np.uint32(0xFFFF))
    shi_ref[:] = shi_ref[:] + (du >> 16)

    # ---- folds: Toeplitz matmul + in-kernel Montgomery reduction ----
    txy = txy_ref[:].astype(jnp.bfloat16)              # [64, 64]
    pp8 = pp8_ref[:]
    p8n = p8_ref[:]
    consts8 = consts_ref[0:2]                          # digit rows
    t8a = _u32(jnp.dot(_bf16(ap), txy,
                       preferred_element_type=jnp.float32))
    t8v = _u32(jnp.dot(_bf16(vp), txy,
                       preferred_element_type=jnp.float32))
    a2_ref[:] = _redc_block(t8a, pp8, p8n, consts8)
    v2_ref[:] = _redc_block(t8v, pp8, p8n, consts8)


@lru_cache(maxsize=32)
def _round_call(m: int, interpret: bool):
    grid = m // TILE
    return pl.pallas_call(
        _round_kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((TILE // 2, 2 * N), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE // 2, 2 * N), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * NP, 4 * N), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3 * NP, NP), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((NP, 4 * N), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, 2 * N), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((TILE // 2, N), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE // 2, N), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4 * N, 4 * N), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4 * N, 4 * N), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((m // 2, N), jnp.uint32),
            jax.ShapeDtypeStruct((m // 2, N), jnp.uint32),
            jax.ShapeDtypeStruct((4 * N, 4 * N), jnp.uint32),
            jax.ShapeDtypeStruct((4 * N, 4 * N), jnp.uint32),
        ],
        interpret=interpret,
    )


@lru_cache(maxsize=2)
def _block_routing():
    """One-hot routing [32, 32, 128] uint32: plane-product entry (i, j)
    (both block order) lands at base-2^8 digit d(i)+d(j)."""
    R = np.zeros((NP, NP, 4 * NP), np.uint32)
    for i in range(NP):
        for j in range(NP):
            R[i, j, _PERM[i] + _PERM[j]] = 1
    return R


def _blocks_to_mont(slo, shi, blocks):
    """Reduce [32, 32] lo/hi scratch blocks (exact integer split as
    lo + hi*2^16) to Montgomery [len(blocks), 16].  Tiny XLA epilogue."""
    R = jnp.asarray(_block_routing())
    cls, chs = [], []
    for (r0, c0) in blocks:
        sl = slo[r0: r0 + NP, c0: c0 + NP]
        sh = shi[r0: r0 + NP, c0: c0 + NP]
        cls.append(jnp.sum(sl[:, :, None] * R, axis=(0, 1)))    # [128]
        chs.append(jnp.sum(sh[:, :, None] * R, axis=(0, 1)))
    cl = jnp.stack(cls)
    ch = jnp.stack(chs)
    w = 2 * N + 3
    Ls = _resolve8(cl, w)
    Hs = _resolve8(ch, w)
    Hs = jnp.concatenate([jnp.zeros_like(Hs[..., :1]), Hs[..., :-1]],
                         axis=-1)
    rows, _ = add_base16(Ls, Hs)
    return FR.reduce_wide(rows, w)                     # [k, 16] Montgomery


def _finish_dots(slo, shi):
    """[64, 64] scratches -> [4, 16] Montgomery (D00, D01, D10, D11)."""
    return _blocks_to_mont(slo, shi,
                           [(0, 0), (0, NP), (NP, 0), (NP, NP)])


def _toeplitz_block(r_pack):
    """Per-round [64, 64] f32 fold matrix: rows 0..31 = Toeplitz((1-r)),
    rows 32..63 = Toeplitz(r), block plane order."""
    one = jnp.asarray(FR.one_mont)
    s0 = FR.sub(one, r_pack.reshape(-1))
    t0 = FR._toeplitz8(_split8_interleave(s0), 4 * N)
    t1 = FR._toeplitz8(_split8_interleave(r_pack.reshape(-1)), 4 * N)
    perm = jnp.asarray(_PERM)
    return jnp.concatenate([t0[perm], t1[perm]]).astype(jnp.float32)


def _split8_interleave(a):
    """[..., 16] -> [..., 32] interleaved planes (limbs.py _split8)."""
    lo = a & np.uint32(0xFF)
    hi = (a >> 8) & np.uint32(0xFF)
    return jnp.stack([lo, hi], axis=-1).reshape(*a.shape[:-1],
                                                a.shape[-1] * 2)


@lru_cache(maxsize=2)
def _consts_np():
    def dig(limbs):
        out = np.zeros(2 * N, np.uint32)
        out[0::2] = limbs & 0xFF
        out[1::2] = limbs >> 8
        return out
    pad = np.zeros(N, np.uint32)
    return np.stack([
        dig(FR.negp_limbs), dig(FR.p_limbs),
        np.concatenate([FR.negp_limbs, pad]),
        np.concatenate([FR.p_limbs, pad]),
    ]).astype(np.uint32)


def _consts():
    """[4, 32] kernel constant rows: (2^256-p, p) as 8-bit digits, then
    (R-p, p) as 16-bit limbs (zero-padded)."""
    return jnp.asarray(_consts_np())


def supported(m: int) -> bool:
    """Kernel constraints: whole tiles, scratch-exactness bound."""
    return m % TILE == 0 and m <= (1 << 25)


# ---------------------------------------------------------------------
# cubic (DOT_PROD) round: h(x) = sum_i (m0+x dm)_i (a+x da)_i (b+x db)_i
# (engine.DotProdPhase1 / reference sumcheckDotProdUpdate1,
# src/prover.cpp:103-144).  Needs three elementwise field muls
# (e0 = a*b, e1 = da*b + a*db, e2 = da*db) before the plane dots, so
# the in-kernel fusion saves even more HBM traffic than the quadratic
# form (the XLA path materializes three [K, 16] products plus their
# partial-product tensors).

def _to_natural_digits(b8):
    """Block-order planes [.., 32] -> natural digit lanes [.., 64]
    (cols >= 32 zero) via an in-trace one-hot bf16 matmul (lane
    permutations lower as gathers otherwise)."""
    li = jax.lax.broadcasted_iota(jnp.int32, (NP, 4 * N), 0)
    ci = jax.lax.broadcasted_iota(jnp.int32, (NP, 4 * N), 1)
    nat = jnp.where(li < N, 2 * li, 2 * (li - N) + 1)
    P = (ci == nat).astype(jnp.bfloat16)
    return _u32(jnp.dot(_bf16(b8), P,
                        preferred_element_type=jnp.float32))


def _mul_cols_k(a, b):
    """Kernel-local big-int product columns: [.., 16] x [.., 16] ->
    [.., 64] base-2^8 columns (< 2^21), via 32 shifted multiply-adds
    (no 3D reshapes -- Mosaic rejects those shape casts)."""
    a8 = _split8_block(a)
    b_nat = _to_natural_digits(_split8_block(b))       # [.., 64]
    out = jnp.zeros(a.shape[:-1] + (4 * N,), jnp.uint32)
    for k in range(NP):
        out = out + a8[..., k: k + 1] * _shift_lanes(b_nat, int(_PERM[k]))
    return out


def _cubic_kernel(m_reps: int,
                  v1_ref, v0_ref, m_ref, txy_ref, pp8_ref, p8_ref,
                  consts_ref,
                  v12_ref, v02_ref, slo_ref, shi_ref):
    i = pl.program_id(0)
    consts8 = consts_ref[0:2]
    p_row = consts_ref[3:4, :N]
    pp8 = pp8_ref[:]
    p8n = p8_ref[:]

    v1 = v1_ref[:]                                     # [T/2, 32]
    v0 = v0_ref[:]
    mm = m_ref[:]
    if m_reps > 1:
        mm = jnp.concatenate([mm] * m_reps, axis=0)    # tile to [T/2, 32]

    a, ao = v1[:, :N], v1[:, N:]
    b, bo = v0[:, :N], v0[:, N:]
    m0, mo = mm[:, :N], mm[:, N:]
    da = _sub16_k(ao, a, p_row)
    db = _sub16_k(bo, b, p_row)
    dm = _sub16_k(mo, m0, p_row)

    # e0 = a*b, e1 = da*b + a*db, e2 = da*db (Montgomery products)
    e0 = _redc_block(_mul_cols_k(a, b), pp8, p8n, consts8)
    c1 = _mul_cols_k(da, b) + _mul_cols_k(a, db)       # < 2^22
    e1 = _redc_block(c1, pp8, p8n, consts8)
    e2 = _redc_block(_mul_cols_k(da, db), pp8, p8n, consts8)

    # dots: rows = m0|dm planes [T/2, 64], cols = e0|e1|e2 [T/2, 96]
    mp = jnp.concatenate([_split8_block(m0), _split8_block(dm)], axis=-1)
    ep = jnp.concatenate([_split8_block(e0), _split8_block(e1),
                          _split8_block(e2)], axis=-1)
    d = jax.lax.dot_general(
        _bf16(mp), _bf16(ep),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)            # [64, 96] < 2^24
    du = _u32(d)

    @pl.when(i == 0)
    def _():
        slo_ref[:] = jnp.zeros_like(slo_ref)
        shi_ref[:] = jnp.zeros_like(shi_ref)

    slo_ref[:] = slo_ref[:] + (du & np.uint32(0xFFFF))
    shi_ref[:] = shi_ref[:] + (du >> 16)

    # folds of the two V operands
    txy = txy_ref[:].astype(jnp.bfloat16)
    v1p = jnp.concatenate([_split8_block(a), _split8_block(ao)], axis=-1)
    v0p = jnp.concatenate([_split8_block(b), _split8_block(bo)], axis=-1)
    t81 = _u32(jnp.dot(_bf16(v1p), txy,
                       preferred_element_type=jnp.float32))
    t80 = _u32(jnp.dot(_bf16(v0p), txy,
                       preferred_element_type=jnp.float32))
    v12_ref[:] = _redc_block(t81, pp8, p8n, consts8)
    v02_ref[:] = _redc_block(t80, pp8, p8n, consts8)


@lru_cache(maxsize=32)
def _cubic_call(K: int, M: int, interpret: bool):
    grid = K // TILE
    TP = TILE // 2
    Mp = M // 2
    if Mp >= TP:
        nmb = Mp // TP
        m_spec = pl.BlockSpec((TP, 2 * N), lambda i: (i % nmb, 0),
                              memory_space=pltpu.VMEM)
        m_reps = 1
    else:
        m_spec = pl.BlockSpec((Mp, 2 * N), lambda i: (0, 0),
                              memory_space=pltpu.VMEM)
        m_reps = TP // Mp
    return pl.pallas_call(
        partial(_cubic_kernel, m_reps),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((TP, 2 * N), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TP, 2 * N), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            m_spec,
            pl.BlockSpec((2 * NP, 4 * N), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3 * NP, NP), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((NP, 4 * N), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, 2 * N), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((TP, N), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TP, N), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * NP, 3 * NP), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * NP, 3 * NP), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((K // 2, N), jnp.uint32),
            jax.ShapeDtypeStruct((K // 2, N), jnp.uint32),
            jax.ShapeDtypeStruct((2 * NP, 3 * NP), jnp.uint32),
            jax.ShapeDtypeStruct((2 * NP, 3 * NP), jnp.uint32),
        ],
        interpret=interpret,
    )


def cubic_supported(K: int, M: int) -> bool:
    """K = V-operand length, M = fft beta-table length (both pow2)."""
    return (K % TILE == 0 and K <= (1 << 25) and 2 <= M <= K
            and (M >= TILE or TILE % M == 0))


@partial(zjit, static_argnames=("interpret",))
def cubic_round_step(m, V0, V1, r_pack, interpret: bool = False):
    """One fused DOT_PROD cubic round:
    -> (coeffs [4, 16] Montgomery (c0..c3), m2, V02, V12).

    Matches engine._cubic_terms + folds bit-for-bit; m folds on the XLA
    kernel (tiny), V0/V1 fold in-kernel."""
    K, M = V0.shape[0], m.shape[0]
    assert cubic_supported(K, M), (K, M)
    txy = _toeplitz_block(r_pack)
    pp8 = jnp.asarray(_pp8_block())
    p8n = jnp.asarray(_p8_nat())
    V1p = V1.reshape(K // 2, 2 * N)
    V0p = V0.reshape(K // 2, 2 * N)
    mp = m.reshape(M // 2, 2 * N)
    V12, V02, slo, shi = _cubic_call(K, M, interpret)(
        V1p, V0p, mp, txy, pp8, p8n, _consts())
    d6 = _blocks_to_mont(slo, shi,
                         [(0, 0), (0, NP), (0, 2 * NP),
                          (NP, 0), (NP, NP), (NP, 2 * NP)])
    from . import limbs
    c0 = d6[0]
    c1 = limbs.FR.add(d6[3], d6[1])
    c2 = limbs.FR.add(d6[4], d6[2])
    c3 = d6[5]
    from ..mle import fold as _fold
    m2 = _fold(m, r_pack)
    return jnp.stack([c0, c1, c2, c3]), m2, V02, V12


@partial(zjit, static_argnames=("interpret",))
def round_step(A, V, r_pack, interpret: bool = False):
    """One fused sumcheck round on [m, 16] Montgomery operands:
    -> (dots [4, 16] (D00, D01, D10, D11), A2 [m/2, 16], V2 [m/2, 16]).

    Drop-in for (mle.fold.coeffs_quadratic_dots, fold) with identical
    outputs; requires supported(m)."""
    m = A.shape[0]
    assert supported(m), m
    txy = _toeplitz_block(r_pack)
    pp8 = jnp.asarray(_pp8_block())
    p8n = jnp.asarray(_p8_nat())
    # free reshape: row pairs are adjacent, so even|odd limbs sit in
    # one [m/2, 32] row
    Ap = A.reshape(m // 2, 2 * N)
    Vp = V.reshape(m // 2, 2 * N)
    A2, V2, slo, shi = _round_call(m, interpret)(Ap, Vp, txy, pp8, p8n,
                                                 _consts())
    return _finish_dots(slo, shi), A2, V2
