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
from ..warm import zjit, register_factory


def _pallas_version() -> int:
    """Pallas round-kernel routing on real TPU hardware:
    0 = off (pure XLA), 1 = canonical-form kernels (pallas_round.py),
    2 = carry-free RED-form kernels (pallas_round2.py, default).
    Under an active mesh the pure-XLA kernels are used: GSPMD
    partitions them across chips; the Pallas kernels are single-device
    programs (parallel/context.py design note)."""
    from ..parallel.context import active_mesh
    if active_mesh() is not None:
        return 0
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


# ---------------------------------------------------------------------
# Ladder runners: the program-count-collapsed quadratic phase.
#
# The chunked runners above are keyed by (rounds, nb0, nb1, ...) --
# every layer/phase shape combination is a distinct program, and over
# the TPU tunnel each distinct program costs ~0.5 s to load (warm
# persistent cache) or tens of seconds to compile (cold).  A LeNet
# proof dispatches hundreds of distinct chunk programs; that -- not
# compute -- was the round-1 latency floor.
#
# The ladder decomposition splits a phase into per-SIZE pieces shared
# by every layer, phase, and model:
#
#   * _quad_ladder(k): 4 rounds of one side's pair dots + folds at
#     size 2^k -> 2^(k-4).  Keyed by k ONLY; a side of nb rounds
#     chains ladders at k = nb, nb-4, ... (the program set across a
#     whole model is the ~20 distinct k values, not ~20 per layer).
#   * _quad_tail(k), k in 1..3: the final sub-ladder rounds.
#   * _combine(inc_add): ONE universal program (lax.scan over RMAX
#     round slots) that assembles the per-round coefficient triples
#     from both sides' dot stacks, handles each side's collapse into
#     add_term at its exhaustion round (nb as a DEVICE scalar -- no
#     shape key), and applies the add_term*(1-x) decay chain
#     (reference prover.cpp:375-378,400-404).
#
# Round polys come back as a fixed [RMAX, 3, n] stack; the verifier's
# replay reads the first R rows.

LSTEP = 4     # rounds per ladder program
RMAX = 26     # max sumcheck rounds of any supported phase (vgg16
              # input MLE is 2^24; +2 slack)


def _ladder_enabled() -> bool:
    return os.environ.get("ZKCNN_TPU_LADDER", "1") == "1"


@register_factory("gkr.fused._quad_ladder")
@lru_cache(maxsize=64)
def _quad_ladder(k: int, pallas_v: int):
    """One side, LSTEP rounds at size 2^k: (A, V, rs [LSTEP, n]) ->
    (dots [LSTEP, 4, n], A' [2^(k-LSTEP), n], V').  Keyed by k only --
    shared across every layer, phase and model.  v2 Pallas rounds when
    large (RED form held across the in-program rounds); XLA otherwise."""
    from ..field.pallas_round2 import (round_step2, supported2, to_red,
                                       red_to_mont, TILE2)
    interp = os.environ.get("ZKCNN_TPU_PALLAS_INTERPRET") == "1"

    def run(A, V, rs):
        red = False
        dots = []
        for j in range(LSTEP):
            m = A.shape[0]
            if pallas_v == 2 and m >= 2 * TILE2 and supported2(m):
                if not red:
                    A, V = to_red(A), to_red(V)
                    red = True
                d, A, V = round_step2(A, V, rs[j], interpret=interp)
            else:
                if red:
                    A, V = red_to_mont(A), red_to_mont(V)
                    red = False
                d = coeffs_quadratic_dots(A, V)
                st = fold(jnp.stack([A, V]), rs[j])
                A, V = st[0], st[1]
            dots.append(d)
        if red:
            A, V = red_to_mont(A), red_to_mont(V)
        return jnp.stack(dots), A, V

    return zjit(run, key="gkr.fused._quad_ladder", factory_args=(k, pallas_v))


@register_factory("gkr.fused._quad_tail")
@lru_cache(maxsize=16)
def _quad_tail(k: int):
    """The final k (< LSTEP) rounds of a side (tiny sizes; XLA)."""

    def run(A, V, rs):
        dots = []
        for j in range(k):
            d = coeffs_quadratic_dots(A, V)
            st = fold(jnp.stack([A, V]), rs[j])
            A, V = st[0], st[1]
            dots.append(d)
        return jnp.stack(dots), A, V

    return zjit(run, key="gkr.fused._quad_tail", factory_args=(k,))


@lru_cache(maxsize=64)
def _quad_ladder_sharded(mesh, k: int, interp: bool):
    """Mesh variant of _quad_ladder: LSTEP rounds at global size 2^k,
    operands sharded on the leading dim (high index bits) over the
    mesh's hyper axis.  The v2 Pallas round kernel runs PER SHARD under
    shard_map (the single-device Pallas programs GSPMD cannot
    partition); the four pair dots are all_gather + FR.sum exact
    modular reductions, so the result is bit-identical to the unsharded
    kernel; folds stay shard-local (pairing touches index bit 0, inside
    a contiguous block).  Rounds whose local shard drops below the
    kernel tile fall back to the XLA kernels inside the same region.

    This is the sharded path's performance leg (round-3 review: under
    an active mesh the ladder previously always fell back to pure-XLA
    kernels)."""
    from jax.sharding import PartitionSpec as P
    from ..field.pallas_round2 import (round_step2, supported2, to_red,
                                       red_to_mont, TILE2)
    from ..parallel.context import HYPER_AXIS
    try:
        from jax import shard_map
    except ImportError:
        from jax.experimental.shard_map import shard_map

    def body(A, V, rs):
        red = False
        dots = []
        for j in range(LSTEP):
            m_loc = A.shape[0]
            if m_loc >= 2 * TILE2 and supported2(m_loc):
                if not red:
                    A, V = to_red(A), to_red(V)
                    red = True
                d, A, V = round_step2(A, V, rs[j], interpret=interp)
            else:
                if red:
                    A, V = red_to_mont(A), red_to_mont(V)
                    red = False
                d = coeffs_quadratic_dots(A, V)
                st = fold(jnp.stack([A, V]), rs[j])
                A, V = st[0], st[1]
            # exact cross-chip reduction: gather the per-shard
            # Montgomery partials, one modular sum (psum on raw limbs
            # would not be a field reduction)
            parts = jax.lax.all_gather(d, HYPER_AXIS)
            dots.append(FR.sum(parts, axis=0))
        if red:
            A, V = red_to_mont(A), red_to_mont(V)
        return jnp.stack(dots), A, V

    f = shard_map(body, mesh=mesh,
                  in_specs=(P(HYPER_AXIS, None), P(HYPER_AXIS, None),
                            P(None, None)),
                  out_specs=(P(None, None, None),
                             P(HYPER_AXIS, None), P(HYPER_AXIS, None)),
                  check_vma=False)
    return jax.jit(f)


def _sharded_kernel_ok(mesh, m: int) -> bool:
    """Whether the shard_map Pallas ladder applies at global size m."""
    if os.environ.get("ZKCNN_TPU_PALLAS", "2") != "2":
        return False
    interp = os.environ.get("ZKCNN_TPU_PALLAS_INTERPRET") == "1"
    try:
        if jax.default_backend() != "tpu" and not interp:
            return False
    except Exception:
        return False
    from ..field.pallas_round2 import TILE2, supported2
    D = mesh.devices.size
    loc = m // D
    return m % D == 0 and loc >= 2 * TILE2 and supported2(loc)


# rows per ladder program above which the step runs as row-chunk calls
# of the 2^LADDER_CHUNK_BL program: the RED-form conversion holds
# ~[m, 80] bf16 copies of both operands plus scratch in ONE program,
# which at the vgg11 Liu side (m = 2^24) exhausted HBM at execution
# (results/vgg11_pic1_tpu_r4_nopcs5.log).  Chunk dots add exactly
# (canonical Montgomery partials mod p); folds are chunk-local because
# chunks are contiguous even-sized blocks.
LADDER_CHUNK_BL = 22


def _run_side_ladder(A, V, nb: int, rs_dev, pv: int):
    """Chain ladder programs down a side's 2^nb hypercube; returns the
    per-round dot stacks and the fully-folded [1, n] operands."""
    from ..parallel.context import active_mesh
    mesh = active_mesh()
    interp = os.environ.get("ZKCNN_TPU_PALLAS_INTERPRET") == "1"
    stacks = []
    j = 0
    while nb - j >= LSTEP:
        k = nb - j
        if mesh is not None and _sharded_kernel_ok(mesh, 1 << k):
            d, A, V = _quad_ladder_sharded(mesh, k, interp)(
                A, V, rs_dev[j: j + LSTEP])
        elif mesh is None and k > LADDER_CHUNK_BL:
            M = 1 << LADDER_CHUNK_BL
            fn = _quad_ladder(LADDER_CHUNK_BL, pv)
            sync = os.environ.get("ZKCNN_TPU_STREAM_SYNC") == "1"
            d, As, Vs = None, [], []
            for s in range(0, 1 << k, M):
                dc, a2, v2 = fn(A[s: s + M], V[s: s + M],
                                rs_dev[j: j + LSTEP])
                d = dc if d is None else FR.add(d, dc)
                As.append(a2)
                Vs.append(v2)
                if sync:
                    # streaming mode: bound the pending graph -- the
                    # tunnel runtime reclaims transient buffers only at
                    # sync points, and an async vgg-scale chain
                    # accumulates past HBM
                    jax.block_until_ready(a2)
            A, V = jnp.concatenate(As), jnp.concatenate(Vs)
        else:
            d, A, V = _quad_ladder(k, pv)(A, V, rs_dev[j: j + LSTEP])
        stacks.append(d)
        j += LSTEP
    if nb - j:
        d, A, V = _quad_tail(nb - j)(A, V, rs_dev[j: nb])
        stacks.append(d)
    return stacks, A, V


@register_factory("gkr.fused._prep_side")
@lru_cache(maxsize=256)
def _prep_side(parts: tuple):
    """Concat a side's dot stacks, zero-pad to RMAX rounds, and form
    the collapse product A[0]*V[0].  Keyed by the stack partition
    (one tiny program per distinct nb)."""
    total = sum(parts)

    def run(*args):
        stacks, (A, V) = args[: len(parts)], args[len(parts):]
        if parts:
            d = jnp.concatenate(stacks) if len(stacks) > 1 else stacks[0]
            d = jnp.pad(d, ((0, RMAX - total), (0, 0), (0, 0)))
        else:
            d = jnp.zeros((RMAX, 4, FR.n), jnp.uint32)
        return d, FR.mul(A[0], V[0])

    return zjit(run, key="gkr.fused._prep_side", factory_args=(parts,))


@register_factory("gkr.fused._combine_prog")
@lru_cache(maxsize=4)
def _combine_prog(inc_add: bool):
    """THE universal round-poly assembler: one lax.scan over RMAX round
    slots.  Side activity/collapse rounds (nb0, nb1) are DEVICE scalars
    -- no shape specialization, one compile serves every phase of every
    model.  Exhaustion semantics as the reference (prover.cpp:375-378,
    400-404): side b contributes pair-dot quadratics for rounds < nb_b;
    at round nb_b its folded product joins add_term, which decays by
    (1-r) per round and contributes add*(1-x) to each message."""
    one = FR.one_mont

    def run(d0, d1, p0, p1, add0, rs, nb0, nb1):
        js = jnp.arange(RMAX, dtype=jnp.int32)
        zero = jnp.zeros((FR.n,), jnp.uint32)

        def body(add, xs):
            j, dd0, dd1, r = xs
            add = jnp.where(j == nb0, FR.add(add, p0), add)
            add = jnp.where(j == nb1, FR.add(add, p1), add)
            q0 = _combine_dots(dd0[0], dd0[1], dd0[2], dd0[3])
            q1 = _combine_dots(dd1[0], dd1[1], dd1[2], dd1[3])
            a0, a1 = j < nb0, j < nb1
            c = [FR.add(jnp.where(a0, x, zero), jnp.where(a1, y, zero))
                 for x, y in zip(q0, q1)]
            if inc_add:
                c[0] = FR.add(c[0], add)
                c[1] = FR.sub(c[1], add)
                add = FR.mul(add, FR.sub(jnp.asarray(one), r))
            return add, jnp.stack(c)

        add_out, polys = jax.lax.scan(body, add0, (js, d0, d1, rs))
        return polys, add_out

    return zjit(run, key="gkr.fused._combine_prog", factory_args=(inc_add,))


def run_quad_phase_ladder(sides, add_dev, rs, include_add_term: bool):
    """Whole quadratic phase via the ladder decomposition; returns the
    [RMAX, 3, n] round-poly stack (first len(rs) rows are real) and the
    per-side folded finals."""
    pv = _pallas_version()
    R = len(rs)
    assert R <= RMAX
    rs_all = pack_challenges(list(rs) + [0] * (RMAX - R))
    dstacks, prods, nbs, finals = [], [], [], []
    for s in sides:
        if s is None:
            dstacks.append(jnp.zeros((RMAX, 4, FR.n), jnp.uint32))
            prods.append(jnp.zeros((FR.n,), jnp.uint32))
            nbs.append(-1)
            finals.append(None)
            continue
        stacks, A1, V1 = _run_side_ladder(s.A, s.V, s.nb, rs_all, pv)
        parts = tuple(int(st.shape[0]) for st in stacks)
        d, prod = _prep_side(parts)(*stacks, A1, V1)
        dstacks.append(d)
        prods.append(prod)
        nbs.append(s.nb)
        finals.append((A1, V1))
    polys, _ = _combine_prog(include_add_term)(
        dstacks[0], dstacks[1], prods[0], prods[1], add_dev, rs_all,
        jnp.asarray(nbs[0], jnp.int32), jnp.asarray(nbs[1], jnp.int32))
    return polys, finals


@register_factory("gkr.fused._fused_quad")
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

    return zjit(run, key="gkr.fused._fused_quad", factory_args=(R, nb0, nb1, inc_add, pallas_v))


@register_factory("gkr.fused._fused_cubic")
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

    return zjit(run, key="gkr.fused._fused_cubic", factory_args=(R, fft_bl, use_pallas))


@register_factory("gkr.fused._fused_mle_eval")
@lru_cache(maxsize=64)
def _fused_mle_eval(R: int):
    """All R folds of an MLE evaluation in one program (prover::Vres
    semantics, reference src/prover.cpp:434-457)."""

    def run(X, rs):
        for j in range(R):
            X = fold(X, rs[j])
        return X[0]

    return zjit(run, key="gkr.fused._fused_mle_eval", factory_args=(R,))


def pack_challenges(rs: List[int]):
    """Host ints -> [R, n] Montgomery device array."""
    return jnp.asarray(FR.pack_mont_host(rs))


def mle_eval_dev(X, rs: List[int]):
    """MLE fold at rs, result left on device ([n] Montgomery)."""
    m = 1 << len(rs)
    if X.shape[0] < m:
        X = jnp.pad(X, ((0, m - X.shape[0]), (0, 0)))
    return _fused_mle_eval(len(rs))(X[:m], pack_challenges(rs))


def mle_eval_fused(X, rs: List[int]) -> int:
    return FR.from_mont_host(np.asarray(mle_eval_dev(X, rs)))


def _polys_host(polys_mont) -> List[tuple]:
    """[R, k, n] Montgomery -> list of k-tuples of host ints."""
    arr = np.asarray(polys_mont)
    R, k, _ = arr.shape
    return [tuple(FR.from_mont_host(arr[j, i]) for i in range(k))
            for j in range(R)]
