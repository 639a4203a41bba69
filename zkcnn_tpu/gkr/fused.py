"""Fused whole-phase sumcheck runners.

The per-round protocol (reference src/verifier.cpp:169-194: one round
message, one check, one fold per hypercube variable) dispatches O(bits)
device kernels with a host round trip each -- over the TPU tunnel this
is latency-bound, not compute-bound.  With the seeded interactive tape
(gkr/tape.py: draws are counter-based, absorb is a no-op, exactly like
the reference's live CSPRNG at src/verifier.cpp:139/157/207) every
challenge of a phase is known before its first round, so the WHOLE
phase -- all round-message coefficients plus all folds -- runs as ONE
jitted device program; the verifier replays its per-round equality
checks host-side from the returned coefficient tensor afterwards.

Shapes halve per round, so the loop is unrolled at trace time (static
shapes; no masking waste).  One compile per (rounds, side-bits)
signature; signatures repeat heavily across layers and models and land
in the persistent compile cache.

The Fiat-Shamir tape's challenges DO depend on absorbed round messages,
so FS mode keeps the per-round path (engine.py); the math is identical.
"""

import os
from functools import lru_cache
from typing import List, Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..field import FR
from ..mle import fold, coeffs_quadratic_dots


def _pallas_version() -> int:
    """Pallas round-kernel routing on real TPU hardware:
    0 = off (pure XLA), 1 = canonical-form kernels (pallas_round.py),
    2 = carry-free RED-form kernels (pallas_round2.py, default)."""
    v = os.environ.get("ZKCNN_TPU_PALLAS", "2")
    if v not in ("0", "1", "2"):
        v = "2"
    try:
        if jax.default_backend() != "tpu":
            return 0
    except Exception:
        return 0
    return int(v)


def _use_pallas() -> bool:
    return _pallas_version() > 0


def _fused_enabled() -> bool:
    """Whether run_all builds the ONE-program unrolled phase.

    The big unrolled programs pay off on TPU (dispatch-latency-bound
    over the tunnel) but compile slowly on the CPU test backend, so CPU
    defaults to the mathematically identical per-round step loop.
    ZKCNN_TPU_FORCE_FUSED=1/0 overrides (tests use 1)."""
    env = os.environ.get("ZKCNN_TPU_FORCE_FUSED")
    if env is not None:
        return env == "1"
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def _combine_dots(d0, d1, d2, d3):
    """(c0, c1, c2) from the four pair dots (mle/fold.py convention)."""
    c0 = d0
    c1 = FR.sub(FR.add(d1, d2), FR.add(d0, d0))
    c2 = FR.add(FR.sub(FR.sub(d3, d1), d2), d0)
    return c0, c1, c2


def _quad_coeffs(A, V):
    """(c0, c1, c2) Montgomery [n] vectors for one quadratic side."""
    d = coeffs_quadratic_dots(A, V)
    return _combine_dots(d[0], d[1], d[2], d[3])


CHUNK = 8   # rounds per compiled program: bounds compile time/size
            # (full-phase programs crash the local XLA:CPU compiler
            # and take minutes on the tunnel); state flows on device


@lru_cache(maxsize=256)
def _fused_quad(R: int, nb0: int, nb1: int, inc_add: bool,
                pallas_v: int):
    """One CHUNK of rounds of a (<=2)-side quadratic phase as a single
    program; engine.run_all chains chunks with device-resident state.

    Side b participates in rounds 0..nb_b-1; at round nb_b its folded
    scalar product collapses into add_term (engine.py exhaustion
    semantics, reference src/prover.cpp:375-378,400-404).
    Absent sides have nb_b < 0 and receive [1, n] dummies.

    With pallas_v > 0, rounds on large operands run the single fused
    Pallas kernel (dots + fold in one HBM pass); small tails stay on
    the XLA kernels.  v2 keeps operands in the redundant RED column
    form between consecutive kernel rounds (carry-free Montgomery),
    converting back to canonical limbs at the kernel/XLA boundary.
    """
    from ..field.pallas_round import round_step, supported
    from ..field.pallas_round2 import (round_step2, supported2, to_red,
                                       red_to_mont, TILE2)
    # CPU test hook: run the Pallas kernels in interpreter mode
    interp = os.environ.get("ZKCNN_TPU_PALLAS_INTERPRET") == "1"

    def run(A0, V0, A1, V1, rs, add0):
        sides = [[A0, V0, nb0], [A1, V1, nb1]]
        red = [False, False]
        add = add0
        zero = jnp.zeros(FR.n, jnp.uint32)
        polys = []

        def to_canon(b):
            if red[b]:
                s = sides[b]
                s[0], s[1] = red_to_mont(s[0]), red_to_mont(s[1])
                red[b] = False

        for j in range(R):
            c0 = c1 = c2 = zero
            pre_folded = [False, False]
            for b, s in enumerate(sides):
                if s[2] < 0:
                    continue
                if j < s[2]:
                    m = s[0].shape[0]
                    if pallas_v == 2 and m >= 2 * TILE2 \
                            and supported2(m):
                        if not red[b]:
                            s[0], s[1] = to_red(s[0]), to_red(s[1])
                            red[b] = True
                        d, A2, V2 = round_step2(s[0], s[1], rs[j],
                                                interpret=interp)
                        q0, q1, q2 = _combine_dots(d[0], d[1], d[2],
                                                   d[3])
                        s[0], s[1] = A2, V2
                        pre_folded[b] = True
                    elif pallas_v == 1 and m >= 1024 and supported(m):
                        d, A2, V2 = round_step(s[0], s[1], rs[j],
                                               interpret=interp)
                        q0, q1, q2 = _combine_dots(d[0], d[1], d[2],
                                                   d[3])
                        s[0], s[1] = A2, V2
                        pre_folded[b] = True
                    else:
                        to_canon(b)
                        q0, q1, q2 = _quad_coeffs(s[0], s[1])
                    c0, c1, c2 = FR.add(c0, q0), FR.add(c1, q1), \
                        FR.add(c2, q2)
                elif j == s[2]:
                    to_canon(b)
                    add = FR.add(add, FR.mul(s[0][0], s[1][0]))
            if inc_add:
                c0 = FR.add(c0, add)
                c1 = FR.sub(c1, add)
            polys.append(jnp.stack([c0, c1, c2]))
            r = rs[j]
            for b, s in enumerate(sides):
                if s[2] >= 0 and j < s[2] and not pre_folded[b]:
                    st = fold(jnp.stack([s[0], s[1]]), r)
                    s[0], s[1] = st[0], st[1]
            if inc_add:
                add = FR.mul(add, FR.sub(jnp.asarray(FR.one_mont), r))
        # canonical form at the chunk boundary (uniform interface; the
        # next chunk re-enters RED form if its rounds are still large)
        for b in (0, 1):
            to_canon(b)
        return (jnp.stack(polys), sides[0][0], sides[0][1],
                sides[1][0], sides[1][1], add)

    return jax.jit(run)


@lru_cache(maxsize=64)
def _fused_cubic(R: int, fft_bl: int, use_pallas: bool):
    """One CHUNK of rounds of the DOT_PROD cubic phase 1
    (engine.DotProdPhase1; reference sumcheckDotProdUpdate1,
    src/prover.cpp:103-144); engine.run_all chains chunks.  fft_bl is
    RELATIVE to this chunk (rounds below it fold the m factor)."""
    from .engine import _cubic_terms
    from ..field.pallas_round import cubic_round_step, cubic_supported

    def run(m, V0, V1, rs):
        polys = []
        for j in range(R):
            K, M = V0.shape[0], m.shape[0]
            pre_folded = False
            if j < fft_bl:
                if use_pallas and K >= 1024 and cubic_supported(K, M):
                    c, m, V0, V1 = cubic_round_step(m, V0, V1, rs[j])
                    c0, c1, c2, c3 = c[0], c[1], c[2], c[3]
                    pre_folded = True
                else:
                    c0, c1, c2, c3 = _cubic_terms(m, V1, V0)
            else:
                # tail rounds past the fft variables are small (the
                # count dims); the XLA kernels are fine and avoid the
                # v1 kernel's slow per-shape Mosaic compile
                m0 = m[0]
                q0, q1, q2 = _quad_coeffs(V1, V0)
                c0, c1, c2 = FR.mul(m0, q0), FR.mul(m0, q1), \
                    FR.mul(m0, q2)
                c3 = jnp.zeros(FR.n, jnp.uint32)
            polys.append(jnp.stack([c0, c1, c2, c3]))
            if not pre_folded:
                r = rs[j]
                if j < fft_bl:
                    m = fold(m, r)
                st = fold(jnp.stack([V0, V1]), r)
                V0, V1 = st[0], st[1]
        return jnp.stack(polys), m, V0, V1

    return jax.jit(run)


@lru_cache(maxsize=64)
def _fused_mle_eval(R: int):
    """All R folds of an MLE evaluation in one program (prover::Vres
    semantics, reference src/prover.cpp:434-457)."""

    def run(X, rs):
        for j in range(R):
            X = fold(X, rs[j])
        return X[0]

    return jax.jit(run)


def pack_challenges(rs: List[int]):
    """Host ints -> [R, n] Montgomery device array."""
    return jnp.asarray(FR.pack_mont_host(rs))


def mle_eval_fused(X, rs: List[int]) -> int:
    m = 1 << len(rs)
    if X.shape[0] < m:
        X = jnp.pad(X, ((0, m - X.shape[0]), (0, 0)))
    out = _fused_mle_eval(len(rs))(X[:m], pack_challenges(rs))
    return FR.from_mont_host(np.asarray(out))


def _polys_host(polys_mont) -> List[tuple]:
    """[R, k, n] Montgomery -> list of k-tuples of host ints."""
    arr = np.asarray(polys_mont)
    R, k, _ = arr.shape
    return [tuple(FR.from_mont_host(arr[j, i]) for i in range(k))
            for j in range(R)]
