"""Carry-free Pallas sumcheck round kernel (v2, bf16-plane form).

v1 (pallas_round.py) produces canonical limbs every round and is
VPU-bound on its Kogge-Stone carry chains.  v2 removes ALL carry
propagation from the round loop AND all input-side plane preparation
by keeping operands in a redundant byte-plane representation between
rounds:

  REDP form: an Fr residue as 80 bfloat16 lanes -- lanes 0..39 the low
  bytes, lanes 40..79 the high bytes of 40 base-2^8 columns c_k
  (value = sum c_k 2^(8k)), with the invariant c_k < 2^16 (STRICT, so
  every byte plane is < 2^8 and bf16-exact).  Residues are
  non-canonical (value < ~2^267, the fold recursion's fixed point; see
  bound notes inline) but every consumer only needs the byte planes,
  which are the storage format itself -- the kernel feeds its reads
  STRAIGHT to the MXU.

One round, per [TILE2=2048]-element tile (1024 even/odd pairs; the
dots contract in 256-pair chunks -- the depth that keeps f32
accumulation of 2^16-bounded plane products exact: 256 * 255^2 < 2^24):
  * dots: one batched [4, 160, 256] x [4, 256, 160] MXU pass per tile
    accumulates all four pair inner products D_xy over the byte planes
    into lo/hi uint32 scratches (exact up to 2^25 elements);
    Montgomery finish in XLA;
  * fold t = a_even*(1-r) + a_odd*r: ONE Toeplitz matmul
    [256, 160] x [160, 72] -> base-2^8 columns t8 < 128*255^2 < 2^23;
  * Montgomery divide-by-R without carries: m = t_lo * p' mod R via a
    3-plane matmul, u = t + m*p, and exact-integer
    c = u_low / R  (R | u) from an f32 dot with power-of-two weights
    (all terms exact, total rounding < 0.25 < 1/2);
  * one split pass (x & 0xFF) + shift(x >> 8) restores c_k < 2^16
    (255 + 2^23.6/2^8 < 2^16), then two masks re-emit the bf16 planes.

No Kogge-Stone anywhere; the only VPU work is ~15 cheap mask/shift ops
on the half-size fold output.

Value bounds (for the XLA epilogue widths): m' (redundant Montgomery
multiplier, one split pass) < 2^263.7, fold fixed point
B* = (m'p/R + p)/(1 - 2p/R) < 2^266.5, dot values
< 2^24 * B*^2 < 2^557 -> DOT_W = 35 base-2^16 limbs (Field.reduce_wide
caps at 36).

Boundary conversions (XLA, cheap): to_red for canonical inputs,
red_to_mont for sub-kernel-size tail rounds and final claims.
"""

from functools import lru_cache, partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .limbs import FR, _resolve8
from .pallas_round import _bf16, _u32, _shift_lanes
from ..warm import zjit

N = 16                      # FR limbs (base 2^16)
RW = 40                     # RED columns (base 2^8)
PL = 2 * RW                 # byte-plane lanes per element (80)
TILE2 = 2048                # elements per grid step (1024 pairs)
DOT_W = 35                  # dot value < 2^557 -> 35 limbs


def to_red(X):
    """[m, 16] canonical limbs -> [m, 80] bf16 REDP planes."""
    m = X.shape[0]
    lo = X & np.uint32(0xFF)
    hi = (X >> 8) & np.uint32(0xFF)
    cols = jnp.stack([lo, hi], axis=-1).reshape(m, 2 * N)  # < 2^8
    cols = jnp.pad(cols, ((0, 0), (0, RW - 2 * N)))
    # high-byte planes of canonical columns are zero
    return jnp.concatenate(
        [cols, jnp.zeros_like(cols)], axis=-1).astype(jnp.bfloat16)


def _red_cols(Xp):
    """[.., 80] bf16 planes -> [.., 40] uint32 columns."""
    xi = Xp.astype(jnp.float32).astype(jnp.int32).astype(jnp.uint32)
    return xi[..., :RW] + (xi[..., RW:] << 8)


@zjit
def red_to_mont(Xp):
    """[.., 80] REDP -> [.., 16] canonical Montgomery limbs."""
    limbs = _resolve8(_red_cols(Xp), 20)     # value < 2^267 -> 17 limbs
    plain = FR.reduce_wide(limbs, 20)        # value * R^-1 mod p
    r2 = jnp.asarray(FR.r2_limbs)
    return FR.mul(plain, jnp.broadcast_to(r2, plain.shape))


def red_value_host(row) -> int:
    """Debug: REDP planes -> integer value."""
    r = np.asarray(row, np.float32).astype(np.uint32)
    return sum((int(r[k]) + (int(r[RW + k]) << 8)) << (8 * k)
               for k in range(RW))


# ---------------------------------------------------------------------
# constant matrices

def _p_digits():
    d = np.zeros(2 * N, np.uint32)
    d[0::2] = FR.p_limbs & 0xFF
    d[1::2] = FR.p_limbs >> 8
    return d


@lru_cache(maxsize=2)
def _pp3_np():
    """[96, 32] f32: 3-plane Toeplitz of p' = -p^-1 mod R.  Row (j, k)
    = byte plane j of t's column k (digit k+j); column c keeps only
    digits < 32 (mod R)."""
    d = np.zeros(2 * N, np.uint32)
    d[0::2] = FR.pp_limbs & 0xFF
    d[1::2] = FR.pp_limbs >> 8
    M = np.zeros((96, 2 * N), np.float32)
    for j in range(3):
        for k in range(2 * N):
            for c in range(2 * N):
                s = c - k - j
                if 0 <= s < 2 * N:
                    M[j * 2 * N + k, c] = float(d[s])
    return M


@lru_cache(maxsize=2)
def _p2_np():
    """[64, 64] f32: 2-plane Toeplitz of p (m' < 2^15 after its split
    pass, so two byte planes suffice)."""
    d = _p_digits()
    M = np.zeros((64, 4 * N), np.float32)
    for j in range(2):
        for k in range(2 * N):
            for c in range(4 * N):
                s = c - k - j
                if 0 <= s < 2 * N:
                    M[j * 2 * N + k, c] = float(d[s])
    return M


@lru_cache(maxsize=2)
def _cweights_np():
    """[1, 32] f32 weights 2^(8(k-32)) for the exact u_low/R dot."""
    return np.asarray([[2.0 ** (8 * (k - 2 * N)) for k in range(2 * N)]],
                      np.float32)


@zjit
def _scalar_T(s_mont):
    """[16] canonical Montgomery scalar -> [80, 72] f32 fold-Toeplitz:
    row (j*40+k) = byte plane j of input column k (digit k+j), column
    c = output digit; entry = s_digit[c-k-j]."""
    lo = s_mont & np.uint32(0xFF)
    hi = (s_mont >> 8) & np.uint32(0xFF)
    sd = jnp.stack([lo, hi], axis=-1).reshape(2 * N)        # [32]
    row = jnp.arange(PL)
    j = row // RW
    k = row % RW
    c = jnp.arange(72)
    d = c[None, :] - (k + j)[:, None]
    valid = (d >= 0) & (d < 2 * N)
    return jnp.where(valid, sd[jnp.clip(d, 0, 2 * N - 1)],
                     0).astype(jnp.float32)


# ---------------------------------------------------------------------
# kernel

def _round2_kernel(a_ref, v_ref, t_ref, pp3_ref, p2_ref, w_ref,
                   a2_ref, v2_ref, slo_ref, shi_ref):
    i = pl.program_id(0)
    a = a_ref[:]                             # [1024, 160] bf16 even|odd
    v = v_ref[:]

    # ---- dots: four 256-pair chunks (f32-exact), uint32-combined ----
    TP = a.shape[0]
    ac = a.reshape(TP // 256, 256, 2 * PL)
    vc = v.reshape(TP // 256, 256, 2 * PL)
    d = jax.lax.dot_general(
        ac, vc, dimension_numbers=(((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)  # [4, 160, 160] <= 2^24
    du = jnp.sum(d.astype(jnp.int32), axis=0).astype(jnp.uint32)  # < 2^26

    @pl.when(i == 0)
    def _():
        slo_ref[:] = jnp.zeros_like(slo_ref)
        shi_ref[:] = jnp.zeros_like(shi_ref)

    slo_ref[:] = slo_ref[:] + (du & np.uint32(0xFFFF))
    shi_ref[:] = shi_ref[:] + (du >> 16)     # lo < 2^16+2 bits: see note

    # ---- folds ----
    T2 = t_ref[:].astype(jnp.bfloat16)       # [160, 72]
    pp3 = pp3_ref[:].astype(jnp.bfloat16)
    p2 = p2_ref[:].astype(jnp.bfloat16)
    w = w_ref[:]                             # [1, 32] f32

    def fold_one(planes, out_ref):
        # t columns < 128*255^2 < 2^23 (f32-exact matmul)
        t8 = _u32(jnp.dot(planes, T2,
                          preferred_element_type=jnp.float32))
        tl = t8[..., : 2 * N]
        p3in = jnp.concatenate([tl & 0xFF, (tl >> 8) & 0xFF, tl >> 16],
                               axis=-1)      # 3 planes of t_low
        m8 = _u32(jnp.dot(_bf16(p3in), pp3,
                          preferred_element_type=jnp.float32))
        # split pass: m' columns < 255 + 2^14.6 < 2^15 -> 2 planes
        m8 = (m8 & 0xFF) + _shift_lanes(m8 >> 8, 1)
        m2in = jnp.concatenate([m8 & 0xFF, m8 >> 8], axis=-1)
        mp = _u32(jnp.dot(_bf16(m2in), p2,
                          preferred_element_type=jnp.float32))
        # u = t + m*p: columns < 2^23 + 2^22 < 2^23.6 (c-dot exact)
        z = jnp.zeros(mp.shape[:-1] + (72 - 4 * N,), jnp.uint32)
        u = t8 + jnp.concatenate([mp, z], axis=-1)
        # exact integer c = (u mod R) / R  (R | u by construction)
        c = jnp.sum(u[..., : 2 * N].astype(jnp.int32).astype(jnp.float32)
                    * w, axis=-1, keepdims=True)
        out = u[..., 2 * N:]                 # u >> 256: 40 cols
        lane = jax.lax.broadcasted_iota(jnp.int32, out.shape,
                                        out.ndim - 1)
        out = out + jnp.where(lane == 0, _u32(jnp.round(c)), 0)
        # split pass restores c_k < 255 + 2^15.6 < 2^16 STRICT
        out = (out & 0xFF) + _shift_lanes(out >> 8, 1)
        out_ref[:] = jnp.concatenate([_bf16(out & 0xFF),
                                      _bf16(out >> 8)], axis=-1)

    fold_one(a, a2_ref)
    fold_one(v, v2_ref)


@lru_cache(maxsize=16)
def _round2_call(m: int, interpret: bool):
    grid = m // TILE2
    TP = TILE2 // 2
    return pl.pallas_call(
        _round2_kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((TP, 2 * PL), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TP, 2 * PL), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((PL * 2, 72), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((96, 2 * N), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((64, 4 * N), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2 * N), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((TP, PL), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TP, PL), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * PL, 2 * PL), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * PL, 2 * PL), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((m // 2, PL), jnp.bfloat16),
            jax.ShapeDtypeStruct((m // 2, PL), jnp.bfloat16),
            jax.ShapeDtypeStruct((2 * PL, 2 * PL), jnp.uint32),
            jax.ShapeDtypeStruct((2 * PL, 2 * PL), jnp.uint32),
        ],
        interpret=interpret,
    )


# ---------------------------------------------------------------------
# dots epilogue (XLA)

@lru_cache(maxsize=2)
def _routing2_np():
    """One-hot [80, 80, 96] uint32: plane-product (r1, r2) lands at
    base-2^8 digit (j1+k1)+(j2+k2) <= 80."""
    row_dig = np.array([(r // RW) + (r % RW) for r in range(PL)])
    R = np.zeros((PL, PL, 96), np.uint32)
    for i in range(PL):
        for j in range(PL):
            R[i, j, row_dig[i] + row_dig[j]] = 1
    return R


def _finish_dots2(slo, shi):
    """[160, 160] scratches -> [4, 16] Montgomery (D00, D01, D10, D11)."""
    from .limbs import add_base16
    R = jnp.asarray(_routing2_np())
    cls, chs = [], []
    for x in (0, 1):
        for y in (0, 1):
            sl = slo[x * PL:(x + 1) * PL, y * PL:(y + 1) * PL]
            sh = shi[x * PL:(x + 1) * PL, y * PL:(y + 1) * PL]
            cls.append(jnp.sum(sl[:, :, None] * R, axis=(0, 1)))
            chs.append(jnp.sum(sh[:, :, None] * R, axis=(0, 1)))
    cl = jnp.stack(cls)
    ch = jnp.stack(chs)
    Ls = _resolve8(cl, DOT_W)
    Hs = _resolve8(ch, DOT_W)
    Hs = jnp.concatenate([jnp.zeros_like(Hs[..., :1]), Hs[..., :-1]],
                         axis=-1)
    rows, _ = add_base16(Ls, Hs)
    return FR.reduce_wide(rows, DOT_W)


def supported2(m: int) -> bool:
    return m % TILE2 == 0 and m <= (1 << 25)


@partial(zjit, static_argnames=("interpret",))
def round_step2(A_red, V_red, r_pack, interpret: bool = False):
    """One fused round on REDP operands [m, 80] bf16:
    -> (dots [4, 16] Montgomery, A2 [m/2, 80], V2 [m/2, 80])."""
    m = A_red.shape[0]
    assert supported2(m), m
    one = jnp.asarray(FR.one_mont)
    s0 = FR.sub(one, r_pack.reshape(-1))
    T2 = jnp.concatenate([_scalar_T(s0), _scalar_T(r_pack.reshape(-1))])
    pp3 = jnp.asarray(_pp3_np())
    p2 = jnp.asarray(_p2_np())
    w = jnp.asarray(_cweights_np())
    Ap = A_red.reshape(m // 2, 2 * PL)
    Vp = V_red.reshape(m // 2, 2 * PL)
    A2, V2, slo, shi = _round2_call(m, interpret)(Ap, Vp, T2, pp3, p2, w)
    return _finish_dots2(slo, shi), A2, V2
