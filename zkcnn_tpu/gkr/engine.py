"""Sumcheck phase engines: functional re-expression of the reference's
lazy linear_poly halving arrays (reference src/prover.cpp:360-426 and
the DOT_PROD cubic variant at src/prover.cpp:103-144).

A phase holds up to two (mult, V) operand sides as device value tensors
padded to their power-of-two hypercube.  Per round it

  * emits the round message's coefficients via lazy-reduction pair
    dots (one fused kernel per side), and
  * folds with the verifier's random point.

Exhaustion semantics mirror the reference exactly: a side with 2^k
entries contributes pair-product quadratics for rounds 1..k; at round
k+1 its folded scalar product moves into `add_term`, which from then on
contributes add_term*(1-x) and decays by (1-r) per round
(prover.cpp:375-378,400-404).
"""

from typing import Optional, List

import numpy as np
import jax
import jax.numpy as jnp

from ..field import FR
from ..field.params import FR_P
from ..mle import fold, coeffs_quadratic_dots, coeffs_from_dots
from ..warm import zjit


def _host(x) -> int:
    return FR.from_mont_host(np.asarray(x))


def _pack(r: int):
    return jnp.asarray(FR.to_mont_host(r))


class Side:
    """One (mult, V) operand pair over a 2^nb hypercube.

    Under an active mesh (parallel/context.py) the operands are placed
    with their leading dim (high index bits) sharded across chips: the
    pair fold stays local, the coefficient dots psum over ICI."""

    def __init__(self, A, V, nb: int):
        m = 1 << nb
        assert A.shape[0] == V.shape[0]
        if A.shape[0] < m:
            pad = ((0, m - A.shape[0]), (0, 0))
            A, V = jnp.pad(A, pad), jnp.pad(V, pad)
        from ..parallel.context import shard_rows
        self.A, self.V = shard_rows(A[:m]), shard_rows(V[:m])
        self.nb = nb
        self.folds = 0
        self.collapsed = False

    @property
    def active(self):
        return self.folds < self.nb

    def final_V(self) -> int:
        return _host(self.V[0])

    def final_A(self) -> int:
        return _host(self.A[0])

    def final_V_dev(self):
        """Device [n] Montgomery claim (no host round trip)."""
        return self.V[0]


class PhaseEngine:
    """Drives one sumcheck phase (phase 1, phase 2, or the Liu input
    consolidation when include_add_term=False)."""

    def __init__(self, sides: List[Optional[Side]], add_term=0,
                 include_add_term: bool = True):
        self.sides = sides
        # add_term may arrive as a device [n] Montgomery scalar (the
        # fetch-free phase-2 init path); the host-int view is realized
        # lazily, only by the per-round (Fiat-Shamir) path.
        if isinstance(add_term, int):
            self._add_dev = None
            self.add_term = add_term % FR_P
        else:
            self._add_dev = add_term
            self.add_term = None
        self.include_add_term = include_add_term

    def _add_host(self) -> int:
        if self.add_term is None:
            self.add_term = _host(self._add_dev)
        return self.add_term

    def round_poly(self):
        """Quadratic (c0, c1, c2) for the current round (host ints)."""
        self._add_host()
        c0 = c1 = c2 = 0
        for s in self.sides:
            if s is None:
                continue
            if s.nb == s.folds and not s.collapsed:
                # side exhausted: its scalar product joins add_term
                # (reference prover.cpp:400-404)
                self.add_term = (self.add_term
                                 + s.final_A() * s.final_V()) % FR_P
                s.collapsed = True
            if s.active:
                q0, q1, q2 = coeffs_from_dots(coeffs_quadratic_dots(s.A,
                                                                    s.V))
                c0 = (c0 + q0) % FR_P
                c1 = (c1 + q1) % FR_P
                c2 = (c2 + q2) % FR_P
        if self.include_add_term:
            # + add_term * (1 - x)   (reference prover.cpp:378)
            c0 = (c0 + self.add_term) % FR_P
            c1 = (c1 - self.add_term) % FR_P
        return c0, c1, c2

    def receive(self, r: int):
        """Fold with the verifier's random point; decay add_term."""
        if getattr(self, "_ran_all", False):
            return          # run_all already folded everything on device
        if self.include_add_term:
            self.add_term = self._add_host() * (1 - r) % FR_P
        rp = _pack(r)
        for s in self.sides:
            if s is not None and s.active:
                # fold A and V in one fused kernel call
                st = fold(jnp.stack([s.A, s.V]), rp)
                s.A, s.V = st[0], st[1]
                s.folds += 1

    def _run_all_steps(self, rs):
        """Per-round fallback with run_all's contract (identical math;
        small per-shape kernels -- the CPU test path).  Returns the
        polys as a host numpy [R, 3, n] Montgomery stack so the caller
        contract matches the fused path (device/NumPy stacks)."""
        polys = []
        for r in rs:
            polys.append(self.round_poly())
            self.receive(r)
        flat = [c for p in polys for c in p]
        return [np.asarray(FR.pack_mont_host(flat)).reshape(
            len(polys), 3, FR.n)]

    def run_all(self, rs):
        """All rounds on device; returns the round polys as a list of
        [*, 3, n] Montgomery stacks (device arrays -- the caller
        batches the host fetch; rows past len(rs) in a ladder stack
        are padding) and leaves the sides in their fully-folded state
        (subsequent receive() calls are no-ops).

        Default build: the ladder decomposition (fused.py), whose
        program set is keyed per SIZE, not per (layer, phase) -- the
        program-count collapse that removes the TPU-tunnel
        compile/load floor.  ZKCNN_TPU_LADDER=0 falls back to the
        chunked whole-phase runners."""
        from .fused import _fused_quad, pack_challenges, \
            _pallas_version, _fused_enabled, _ladder_enabled, \
            run_quad_phase_ladder, CHUNK, RMAX
        R = len(rs)
        if R == 0:
            return []
        if not _fused_enabled():
            return self._run_all_steps(rs)
        if _ladder_enabled() and R <= RMAX:
            add = self._add_dev if self._add_dev is not None \
                else _pack(self.add_term)
            polys, finals = run_quad_phase_ladder(
                self.sides, add, list(rs), self.include_add_term)
            for b, s in enumerate(self.sides):
                if s is not None:
                    s.A, s.V = finals[b]
                    s.folds = s.nb
                    s.collapsed = True
            self._ran_all = True
            return [polys]
        pv = _pallas_version()
        dummy = jnp.zeros((1, FR.n), jnp.uint32)
        nbs, arrs = [], []
        for s in self.sides:
            if s is None:
                nbs.append(-1)
                arrs += [dummy, dummy]
            else:
                nbs.append(s.nb)
                arrs += [s.A, s.V]
        add = self._add_dev if self._add_dev is not None \
            else _pack(self.add_term)
        rs_dev = pack_challenges(rs)
        polys = []
        for start in range(0, R, CHUNK):
            sub = min(CHUNK, R - start)
            # nb relative to the chunk; >= sub behaves as "active all
            # chunk", so clamp for lru-key economy.  A side whose
            # collapse round fell in an earlier chunk is absent (-1).
            rel = [-1 if (nb < 0 or nb < start)
                   else min(nb - start, sub) for nb in nbs]
            fn = _fused_quad(sub, rel[0], rel[1],
                             self.include_add_term, pv)
            p, a0, v0, a1, v1, add = fn(
                arrs[0], arrs[1], arrs[2], arrs[3],
                rs_dev[start: start + sub], add)
            arrs = [a0, v0, a1, v1]
            polys.append(p)
        for b, s in enumerate(self.sides):
            if s is not None:
                s.A = arrs[2 * b][:1]
                s.V = arrs[2 * b + 1][:1]
                s.folds = s.nb
                s.collapsed = True
        self._ran_all = True
        return polys

    def final_claim(self, b: int, bit_length: int) -> int:
        """Finalize semantics (reference prover.cpp:459-485): folded
        value if the side ran, its constant if it collapsed, else 0."""
        s = self.sides[b]
        if s is None or bit_length < 0:
            return 0
        return s.final_V()

    def final_claim_dev(self, b: int, bit_length: int):
        """Device [n] variant of final_claim (fetch-free path)."""
        s = self.sides[b]
        if s is None or bit_length < 0:
            return jnp.zeros((FR.n,), jnp.uint32)
        return s.final_V_dev()


@zjit
def _cubic_terms(m, V1, V0):
    """Pair-linear triple product coefficients for the DOT_PROD phase.

    m: [M, n] (M = current fft-table size > 1), V1/V0: [K, n].
    h(x) = sum_i (m0+x dm)[i mod M/2] (a+x da)_i (b+x db)_i.
    """
    m0, dm = m[0::2], FR.sub(m[1::2], m[0::2])
    a, da = V1[0::2], FR.sub(V1[1::2], V1[0::2])
    b, db = V0[0::2], FR.sub(V0[1::2], V0[0::2])
    reps = a.shape[0] // m0.shape[0]
    m0t = jnp.tile(m0, (reps, 1))
    dmt = jnp.tile(dm, (reps, 1))
    e0 = FR.mul(a, b)
    e1 = FR.add(FR.mul(da, b), FR.mul(a, db))
    e2 = FR.mul(da, db)
    c0 = FR.dot_mont(m0t, e0)
    c1 = FR.add(FR.dot_mont(dmt, e0), FR.dot_mont(m0t, e1))
    c2 = FR.add(FR.dot_mont(dmt, e1), FR.dot_mont(m0t, e2))
    c3 = FR.dot_mont(dmt, e2)
    return c0, c1, c2, c3


class DotProdPhase1:
    """Cubic phase-1 engine for DOT_PROD layers (reference
    sumcheckDotProdInitPhase1/Update1/Finalize1, prover.cpp:57-153).

    The fft-variable factor `m` (a beta table over the fft bits) folds
    alongside the two V operands for the first fft_bl rounds, then
    persists as a scalar multiplier.
    """

    def __init__(self, m, V0, V1, fft_bl: int, nb1: int):
        from ..parallel.context import shard_rows
        self.m = shard_rows(m)
        self.V0, self.V1 = shard_rows(V0), shard_rows(V1)
        self.fft_bl = fft_bl
        self.nb1 = nb1
        self.folds = 0

    def round_poly(self):
        if self.m.shape[0] > 1:
            c = _cubic_terms(self.m, self.V1, self.V0)
            packed = np.asarray(jnp.stack(c))
            return tuple(FR.from_mont_host(packed[i]) for i in range(4))
        m0 = _host(self.m[0])
        q = coeffs_from_dots(coeffs_quadratic_dots(self.V1, self.V0))
        return tuple(m0 * qi % FR_P for qi in q) + (0,)

    def receive(self, r: int):
        rp = _pack(r)
        if self.m.shape[0] > 1:
            self.m = fold(self.m, rp)
        if self.V0.shape[0] > 1:
            self.V0 = fold(self.V0, rp)
            self.V1 = fold(self.V1, rp)
        self.folds += 1

    def _run_all_steps(self, rs):
        polys = []
        for r in rs:
            polys.append(self.round_poly())
            self.receive(r)
        flat = [c for p in polys for c in p]
        return [np.asarray(FR.pack_mont_host(flat)).reshape(
            len(polys), 4, FR.n)]

    def run_all(self, rs):
        """All rounds on device in CHUNK-round compiled pieces; returns
        a list of [sub, 4, n] Montgomery stacks (device arrays)."""
        from .fused import _fused_cubic, pack_challenges, \
            _use_pallas, _fused_enabled, CHUNK
        R = len(rs)
        if R == 0:
            return []
        if not _fused_enabled():
            return self._run_all_steps(rs)
        assert R >= self.fft_bl
        up = _use_pallas()
        rs_dev = pack_challenges(rs)
        m, V0, V1 = self.m, self.V0, self.V1
        polys = []
        for start in range(0, R, CHUNK):
            sub = min(CHUNK, R - start)
            fb_rel = max(0, min(self.fft_bl - start, sub))
            fn = _fused_cubic(sub, fb_rel, up)
            p, m, V0, V1 = fn(m, V0, V1, rs_dev[start: start + sub])
            polys.append(p)
        self.m, self.V0, self.V1 = m[:1], V0[:1], V1[:1]
        self.folds = R
        return polys

    def finalize(self):
        """-> (claim_1, V_u1) (reference prover.cpp:146-153)."""
        claim_1 = _host(self.V1[0])
        v_u1 = claim_1 * _host(self.m[0]) % FR_P
        return claim_1, v_u1

    def finalize_dev(self):
        """Device variant: (claim_1 [n], V_u1 [n]) Montgomery, no host
        round trip."""
        return self.V1[0], FR.mul(self.V1[0], self.m[0])
