"""G1 curve ops and Hyrax PCS vs pure-Python ground truth."""

import numpy as np
import jax.numpy as jnp
import pytest

from zkcnn_tpu.field import FR
from zkcnn_tpu.field.params import FR_P
from zkcnn_tpu.pcs import curve
from zkcnn_tpu.pcs.msm import FixedBaseMSM, points_equal
from zkcnn_tpu.pcs.hyrax import HyraxPCS
from zkcnn_tpu.gkr.tape import Tape
from zkcnn_tpu.mle import beta_table, mle_eval

G_AFF = (curve.G1_X, curve.G1_Y)


def _plain(s):
    return jnp.asarray(np.array([[(s >> (16 * i)) & 0xFFFF
                                  for i in range(FR.n)]], np.uint32))


def test_add_double_vs_python():
    ks = [1, 2, 3, 5, 7, 1234567891234567]
    pts = []
    base = curve.base_point()
    for k in ks:
        dev = curve.scalar_mul(base[None], _plain(k))[0]
        pts.append(curve.to_affine_host(dev[None])[0])
        assert pts[-1] == curve.py_mul(G_AFF, k), k

    # batched add: k*G + j*G == (k+j)*G
    a = curve.scalar_mul(jnp.broadcast_to(base, (3, 3, curve.FP.n)),
                         jnp.concatenate([_plain(k) for k in (1, 2, 3)]))
    b = curve.scalar_mul(jnp.broadcast_to(base, (3, 3, curve.FP.n)),
                         jnp.concatenate([_plain(k) for k in (5, 7, 9)]))
    s = curve.padd(a, b)
    got = curve.to_affine_host(s)
    assert got == [curve.py_mul(G_AFF, k) for k in (6, 9, 12)]


def test_add_edge_cases():
    base = curve.base_point()
    inf = curve.infinity()
    # P + inf, inf + P, inf + inf
    assert curve.to_affine_host(curve.padd(base, inf)[None])[0] == G_AFF
    assert curve.to_affine_host(curve.padd(inf, base)[None])[0] == G_AFF
    assert curve.to_affine_host(curve.padd(inf, inf)[None])[0] is None
    # P + P (same-point add -> double)
    assert curve.to_affine_host(curve.padd(base, base)[None])[0] == \
        curve.py_mul(G_AFF, 2)
    # P + (-P) -> inf
    assert curve.to_affine_host(curve.padd(base, curve.pneg(base))[None])[0] \
        is None


def test_fixed_base_msm():
    rng = np.random.default_rng(3)
    N = 5
    gen_scalars = [int(rng.integers(1, 1 << 60)) for _ in range(N)]
    base = jnp.broadcast_to(curve.base_point(), (N, 3, curve.FP.n))
    plain = jnp.concatenate([_plain(k) for k in gen_scalars])
    points = curve.scalar_mul(base, plain)

    msm = FixedBaseMSM(points)
    coeffs = [int.from_bytes(rng.bytes(31), "little") for _ in range(N)]
    sc = jnp.asarray(FR.pack_mont_host(coeffs))
    got = curve.to_affine_host(msm.compute(sc[None]))[0]
    want_k = sum(c * g for c, g in zip(coeffs, gen_scalars)) % FR_P
    assert got == curve.py_mul(G_AFF, want_k)


@pytest.mark.heavy
def test_hyrax_commit_open():
    rng = np.random.default_rng(5)
    logn = 6
    vals = [int.from_bytes(rng.bytes(31), "little") % FR_P
            for _ in range(1 << logn)]
    v0 = jnp.asarray(FR.pack_mont_host(vals))
    pcs = HyraxPCS()
    tape = Tape(b"pcs-test")
    pcs.setup(logn, tape)
    com = pcs.commit(v0)
    r = [int.from_bytes(rng.bytes(31), "little") % FR_P
         for _ in range(logn)]
    ev = mle_eval(v0, r)
    assert pcs.open_and_verify(com, v0, r, ev, tape)
    # wrong eval must fail
    assert not pcs.open_and_verify(com, v0, r, (ev + 1) % FR_P, tape)


@pytest.mark.heavy
def test_hyrax_ipa_open():
    rng = np.random.default_rng(9)
    logn = 6
    vals = [int.from_bytes(rng.bytes(31), "little") % FR_P
            for _ in range(1 << logn)]
    v0 = jnp.asarray(FR.pack_mont_host(vals))
    pcs = HyraxPCS(mode="ipa")
    tape = Tape(b"ipa-test")
    pcs.setup(logn, tape)
    com = pcs.commit(v0)
    r = [int.from_bytes(rng.bytes(31), "little") % FR_P
         for _ in range(logn)]
    ev = mle_eval(v0, r)
    assert pcs.open_and_verify(com, v0, r, ev, tape)
    # commitment (rows * 48B) + logarithmic opening:
    # 2*log2(cols) points + 1 scalar
    n_rows, log_cols = 1 << (logn // 2), logn - logn // 2
    assert pcs.ps == n_rows * 48 + 2 * log_cols * 48 + 32

    # soundness: wrong eval fails
    pcs2 = HyraxPCS(mode="ipa")
    tape2 = Tape(b"ipa-test")
    pcs2.setup(logn, tape2)
    com2 = pcs2.commit(v0)
    assert not pcs2.open_and_verify(com2, v0, r, (ev + 1) % FR_P, tape2)


@pytest.mark.heavy
def test_hyrax_fs_mode_gens_and_split():
    """Fiat-Shamir mode: generators come from hash-to-curve (discrete
    logs unknown -- tape-derived s_i*G would hand the prover every
    dlog), and the verifier consumes ONLY public data via the
    open()/verify() split."""
    from zkcnn_tpu.gkr.tape import FiatShamirTape
    rng = np.random.default_rng(11)
    logn = 4
    vals = [int.from_bytes(rng.bytes(31), "little") % FR_P
            for _ in range(1 << logn)]
    v0 = jnp.asarray(FR.pack_mont_host(vals))
    r = [int.from_bytes(rng.bytes(31), "little") % FR_P
         for _ in range(logn)]
    ev = mle_eval(v0, r)

    for mode in ("sqrt", "ipa"):
        pcs = HyraxPCS(mode=mode)
        tape = FiatShamirTape(b"fs-pcs")
        pcs.setup(logn, tape)
        # every generator must be on-curve and not the base point
        # (hash-to-curve, not s*G)
        for (x, y) in curve.to_affine_host(pcs.gens):
            assert (y * y - (x ** 3 + 4)) % curve.FP_P == 0
            assert (x, y) != G_AFF
        com = pcs.commit(v0)
        proof = pcs.open(v0, r, ev, tape.clone())
        assert pcs.verify(com, r, ev, proof, tape.clone())
        assert not pcs.verify(com, r, (ev + 1) % FR_P, proof,
                              tape.clone())


def test_ipa_fs_challenges_bind_messages():
    """Bulletproofs FS requirement: tampering with an L_k changes the
    verifier's challenge stream (absorbed before each draw), so the
    proof must fail rather than verify against pre-tamper challenges."""
    from zkcnn_tpu.gkr.tape import FiatShamirTape
    rng = np.random.default_rng(13)
    logn = 4
    vals = [int.from_bytes(rng.bytes(31), "little") % FR_P
            for _ in range(1 << logn)]
    v0 = jnp.asarray(FR.pack_mont_host(vals))
    r = [int.from_bytes(rng.bytes(31), "little") % FR_P
         for _ in range(logn)]
    ev = mle_eval(v0, r)
    pcs = HyraxPCS(mode="ipa")
    tape = FiatShamirTape(b"fs-bind")
    pcs.setup(logn, tape)
    com = pcs.commit(v0)
    proof = pcs.open(v0, r, ev, tape.clone())
    proof.Ls[0] = curve.pdouble(proof.Ls[0])     # tamper one round msg
    assert not pcs.verify(com, r, ev, proof, tape.clone())


@pytest.mark.heavy
def test_msm_light_matches_fused_tiny():
    """The compile-light MSM routing (eager bucketed padd tree,
    msm._compile_light) must produce the same points as the fused
    _window_sum/_horner_step composites -- same pairing order, so
    bit-equal results.  Tiny size keeps the fused compile cheap."""
    import os
    import numpy as np
    import jax.numpy as jnp
    from zkcnn_tpu.pcs import curve
    from zkcnn_tpu.pcs.msm import FixedBaseMSM, points_equal
    from zkcnn_tpu.field import FR

    rng = np.random.default_rng(13)
    N = 4
    pts = [curve.py_mul((curve.G1_X, curve.G1_Y), int(s))
           for s in rng.integers(1, 1 << 40, N)]
    points = jnp.asarray(np.stack(
        [curve.point_pack((x, y, 1)) for (x, y) in pts]))
    coeffs = [int.from_bytes(rng.bytes(31), "little") for _ in range(N)]
    sc = jnp.asarray(np.stack([FR.to_mont_host(c) for c in coeffs]))[None]

    old = os.environ.get("ZKCNN_TPU_MSM_LIGHT")
    try:
        os.environ["ZKCNN_TPU_MSM_LIGHT"] = "1"
        out_light = FixedBaseMSM(points).compute(sc)
        os.environ["ZKCNN_TPU_MSM_LIGHT"] = "0"
        out_fused = FixedBaseMSM(points).compute(sc)
    finally:
        if old is None:
            del os.environ["ZKCNN_TPU_MSM_LIGHT"]
        else:
            os.environ["ZKCNN_TPU_MSM_LIGHT"] = old
    assert bool(np.asarray(points_equal(out_light[0], out_fused[0])))
    # and against host ground truth
    import functools
    want = functools.reduce(
        curve.py_add, [curve.py_mul(P, c) for P, c in zip(pts, coeffs)])
    got = curve.to_affine_host(out_light[:1])[0]
    assert got == want
