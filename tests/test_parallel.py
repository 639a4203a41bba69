"""Sharded kernels must agree exactly with the replicated ones
(1-chip == N-chip transcripts; SURVEY.md section 7 step 7)."""

import pytest
import numpy as np
import jax
import jax.numpy as jnp

from zkcnn_tpu.field import FR, FR_P
from zkcnn_tpu.mle import fold, coeffs_quadratic
from zkcnn_tpu.ntt import ntt
from zkcnn_tpu.parallel import (make_mesh, sharded_fold_coeffs,
                                sharded_ntt, sharded_dot,
                                sharded_segment_sum)

RNG = np.random.default_rng(13)


def rvec(k):
    return [int.from_bytes(RNG.bytes(31), "little") % FR_P
            for _ in range(k)]


def test_sharded_fold_coeffs_matches_replicated():
    n_dev = len(jax.devices())
    mesh = make_mesh(n_dev)
    N = 1 << 8
    A = jnp.asarray(FR.pack_mont_host(rvec(N)))
    V = jnp.asarray(FR.pack_mont_host(rvec(N)))
    r = rvec(1)[0]
    rp = jnp.asarray(FR.to_mont_host(r))

    c0, c1, c2, A2, V2 = sharded_fold_coeffs(mesh)(A, V, rp)
    q0, q1, q2 = coeffs_quadratic(A, V)
    for got, want in ((c0, q0), (c1, q1), (c2, q2)):
        assert FR.from_mont_host(np.asarray(got)) == \
            FR.from_mont_host(np.asarray(want))
    fA = fold(A, rp)
    assert FR.unpack_mont_host(np.asarray(A2)) == FR.unpack_mont_host(fA)


def test_sharded_dot_and_ntt():
    n_dev = len(jax.devices())
    mesh = make_mesh(n_dev)
    N = 1 << 8
    xs, ys = rvec(N), rvec(N)
    A = jnp.asarray(FR.pack_mont_host(xs))
    B = jnp.asarray(FR.pack_mont_host(ys))
    d = FR.from_mont_host(np.asarray(sharded_dot(mesh)(A, B)))
    assert d == sum(x * y for x, y in zip(xs, ys)) % FR_P

    mesh2 = make_mesh(n_dev, "data")
    logm = 4
    batch = n_dev * 2
    x = jnp.asarray(np.stack(
        [FR.pack_mont_host(rvec(1 << logm)) for _ in range(batch)]))
    got = sharded_ntt(mesh2, logm, "data")(x)
    want = ntt(x, logm)
    assert (np.asarray(got) == np.asarray(want)).all()


def test_sharded_segment_sum():
    n_dev = len(jax.devices())
    mesh = make_mesh(n_dev)
    G, S = 1 << 7, 16
    vals = rvec(G)
    segs = RNG.integers(0, S, G)
    V = jnp.asarray(FR.pack_mont_host(vals))
    out = sharded_segment_sum(mesh, S)(V, jnp.asarray(segs))
    got = FR.unpack_mont_host(np.asarray(out))
    want = [0] * S
    for v, s in zip(vals, segs):
        want[s] = (want[s] + v) % FR_P
    assert got == want


@pytest.mark.heavy
def test_sharded_proof_transcript_equality():
    """SURVEY.md section 7 step 7: a COMPLETE proof run sharded over
    the virtual device mesh must produce a bit-identical transcript
    (proof size, input eval, every round poly and claim -- compared
    via the order-sensitive transcript digest) to the 1-chip run."""
    from zkcnn_tpu.nn import random_source
    from zkcnn_tpu.nn.models import singleConv
    from zkcnn_tpu.nn.params import ConvType
    from zkcnn_tpu.gkr import Prover, Verifier, Tape
    from zkcnn_tpu.parallel.context import use_mesh

    nn = singleConv(6, 1, 1, 3, 2, ConvType.FFT)
    C, vals = nn.create(random_source(47))

    def prove():
        p = Prover(C, vals)
        v = Verifier(p, C, Tape(b"shard-eq"))
        assert v.verify()
        return p.proof_size, v.eval_in, v.transcript_digest

    base = prove()
    mesh = make_mesh(len(jax.devices()), "hyper")
    with use_mesh(mesh):
        sharded = prove()
    assert base == sharded


@pytest.mark.heavy
def test_sharded_pallas_ladder_matches_unsharded(monkeypatch):
    """The shard_map Pallas ladder (mesh perf path) must produce
    bit-identical dots and folded operands to the unsharded XLA ladder
    (interpret mode stands in for the TPU kernel on the CPU mesh)."""
    monkeypatch.setenv("ZKCNN_TPU_PALLAS_INTERPRET", "1")
    monkeypatch.setenv("ZKCNN_TPU_PALLAS", "2")
    from zkcnn_tpu.gkr.fused import (_run_side_ladder, _quad_ladder,
                                     _sharded_kernel_ok, pack_challenges,
                                     LSTEP)
    from zkcnn_tpu.parallel.context import use_mesh

    n_dev = len(jax.devices())
    mesh = make_mesh(n_dev, "hyper")
    k = 15                       # local shard 2^12 = 2*TILE2: kernel path
    assert _sharded_kernel_ok(mesh, 1 << k)
    m = 1 << k
    A = jnp.asarray(FR.pack_mont_host(rvec(m)))
    V = jnp.asarray(FR.pack_mont_host(rvec(m)))
    rs = pack_challenges(rvec(k))

    stacks_ref, A_ref, V_ref = _run_side_ladder(A, V, k, rs, 0)

    from zkcnn_tpu.parallel.context import shard_rows
    with use_mesh(mesh):
        As, Vs = shard_rows(A), shard_rows(V)
        stacks_sh, A_sh, V_sh = _run_side_ladder(As, Vs, k, rs, 0)

    ref = np.concatenate([np.asarray(s) for s in stacks_ref])
    sh = np.concatenate([np.asarray(s) for s in stacks_sh])
    np.testing.assert_array_equal(ref, sh)
    np.testing.assert_array_equal(np.asarray(A_ref), np.asarray(A_sh))
    np.testing.assert_array_equal(np.asarray(V_ref), np.asarray(V_sh))


@pytest.mark.heavy
def test_stage_sharded_ntt_bit_identical():
    """NTT sharded WITHIN one transform (local butterfly stages +
    all_to_all transpose + cross stages; parallel/sharding.py
    stage_sharded_ntt) must be bit-identical to the batched ntt()
    (SURVEY section 2 parallelism inventory; r4 verdict item 8)."""
    import numpy as np
    import jax.numpy as jnp
    from zkcnn_tpu.field import FR
    from zkcnn_tpu.ntt import ntt, intt
    from zkcnn_tpu.parallel.sharding import make_mesh, stage_sharded_ntt

    mesh = make_mesh(8)
    rng = np.random.default_rng(3)
    for logn, inv in ((6, False), (6, True), (7, True)):
        N = 1 << logn
        x = jnp.asarray(rng.integers(0, 1 << 16, (3, N, FR.n),
                                     np.uint32))
        ref = (intt if inv else ntt)(x, logn)
        got = stage_sharded_ntt(mesh, logn, inv)(x)
        assert (np.asarray(ref) == np.asarray(got)).all(), (logn, inv)


def test_witness_ntt_routes_stage_sharded():
    """The witness FFT path picks the stage-sharded NTT under a mesh
    for small batches of large transforms, bit-identically."""
    import numpy as np
    import jax.numpy as jnp
    from zkcnn_tpu.field import FR
    from zkcnn_tpu.circuit.eval import _witness_ntt
    from zkcnn_tpu.ntt import ntt
    from zkcnn_tpu.parallel.sharding import make_mesh
    from zkcnn_tpu.parallel.context import use_mesh

    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.integers(0, 1 << 16, (4, 64, FR.n), np.uint32))
    ref = ntt(x, 6)
    with use_mesh(make_mesh(8)):
        got = _witness_ntt(x, 6, False)   # batch 4 < 2*8 -> stage path
    assert (np.asarray(ref) == np.asarray(got)).all()


@pytest.mark.heavy
def test_sharded_msm_window_partitioned():
    """Window-partitioned MSM across the mesh (sharded_msm): each
    device computes its windows' gather+tree sums, folds the radix
    weights locally, and the partials combine with an all_gather +
    padd tree.  Checked as a group element against direct Python-int
    evaluation of the same digit vector (Jacobian representation is
    not transcript-relevant; SURVEY section 2 parallelism inventory)."""
    import numpy as np
    import jax.numpy as jnp
    from zkcnn_tpu.field import FR
    from zkcnn_tpu.pcs import curve
    from zkcnn_tpu.pcs.msm import (FixedBaseMSM, _digits_of,
                                   GLV_BETA)
    from zkcnn_tpu.field.params import FP_P
    from zkcnn_tpu.parallel.sharding import make_mesh, sharded_msm

    rng = np.random.default_rng(21)
    N = 2
    aff = [curve.py_mul((curve.G1_X, curve.G1_Y), int(s))
           for s in rng.integers(1, 1 << 40, N)]
    points = jnp.asarray(np.stack(
        [curve.point_pack((x, y, 1)) for (x, y) in aff]))
    msm = FixedBaseMSM(points)           # builds the digit table
    coeffs = [int.from_bytes(rng.bytes(31), "little")
              for _ in range(N)]
    sc = jnp.asarray(np.stack([FR.to_mont_host(c)
                               for c in coeffs]))[None]
    digs = np.asarray(_digits_of(sc))    # [1, 2N, 17]

    nwin = 2                             # keep the compiled graph small
    mesh = make_mesh(8)
    out = sharded_msm(mesh, nwin=nwin)(msm.table,
                                       jnp.asarray(digs[:, :, :nwin]))

    # expected: sum_i (sum_k d_{i,k} 256^k) * B_i over Python ints,
    # with B_{N+i} = phi(B_i) = (beta*x, y)
    bases = aff + [((GLV_BETA * x) % FP_P, y) for (x, y) in aff]
    exp = None
    for i, B in enumerate(bases):
        v = sum(int(digs[0, i, k]) << (8 * k) for k in range(nwin))
        if v == 0:
            continue
        t = curve.py_mul(B, abs(v))
        if v < 0:
            t = (t[0], (-t[1]) % FP_P)
        exp = curve.py_add(exp, t)
    got = curve.to_affine_host(out[:1])[0]
    assert got == exp
