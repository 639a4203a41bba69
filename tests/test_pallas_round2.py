"""Carry-free (v2) Pallas round kernel vs the XLA reference kernels.

Interpreter mode on CPU; the kernel output representation is redundant
(RED columns), so comparisons convert back to canonical Montgomery
limbs, which must match the XLA fold bit-for-bit.
"""

import pytest
import numpy as np
import jax.numpy as jnp

from zkcnn_tpu.field import FR
from zkcnn_tpu.field.params import FR_P
from zkcnn_tpu.field.pallas_round2 import (round_step2, supported2,
                                           to_red, red_to_mont, TILE2)
from zkcnn_tpu.mle import fold, coeffs_quadratic_dots


def _rand_mont(rng, m):
    xs = [int.from_bytes(rng.bytes(31), "little") % FR_P for _ in range(m)]
    return jnp.asarray(FR.pack_mont_host(xs))


def test_round2_single_matches_xla():
    m = 2 * TILE2
    rng = np.random.default_rng(17)
    A = _rand_mont(rng, m)
    V = _rand_mont(rng, m)
    r = 31415926535897932384 % FR_P
    rp = jnp.asarray(FR.to_mont_host(r))

    d_ref = np.asarray(coeffs_quadratic_dots(A, V))
    A2_ref = np.asarray(fold(A, rp))
    V2_ref = np.asarray(fold(V, rp))

    d, A2r, V2r = round_step2(to_red(A), to_red(V), rp, interpret=True)
    assert [FR.from_mont_host(x) for x in np.asarray(d)] \
        == [FR.from_mont_host(x) for x in d_ref]
    np.testing.assert_array_equal(np.asarray(red_to_mont(A2r)), A2_ref)
    np.testing.assert_array_equal(np.asarray(red_to_mont(V2r)), V2_ref)


def test_round2_iterated_stays_exact():
    """Three successive RED rounds (column-invariant stability) match
    three XLA folds."""
    m = 8 * TILE2
    rng = np.random.default_rng(23)
    A = _rand_mont(rng, m)
    V = _rand_mont(rng, m)
    rs = [int.from_bytes(rng.bytes(31), "little") % FR_P
          for _ in range(3)]

    Ar, Vr = to_red(A), to_red(V)
    Ax, Vx = A, V
    for r in rs:
        rp = jnp.asarray(FR.to_mont_host(r))
        d, Ar, Vr = round_step2(Ar, Vr, rp, interpret=True)
        d_ref = np.asarray(coeffs_quadratic_dots(Ax, Vx))
        assert [FR.from_mont_host(x) for x in np.asarray(d)] \
            == [FR.from_mont_host(x) for x in d_ref]
        Ax, Vx = fold(Ax, rp), fold(Vx, rp)
    np.testing.assert_array_equal(np.asarray(red_to_mont(Ar)),
                                  np.asarray(Ax))
    np.testing.assert_array_equal(np.asarray(red_to_mont(Vr)),
                                  np.asarray(Vx))


def test_supported2():
    assert supported2(TILE2)
    assert not supported2(TILE2 + 8)
    assert not supported2(1 << 26)


@pytest.mark.heavy
def test_fused_quad_pallas_v2_integration(monkeypatch):
    """The whole-phase runner with v2 RED-form rounds (+ XLA tail and
    boundary conversions) must emit the same polys and finals as the
    pure-XLA build."""
    monkeypatch.setenv("ZKCNN_TPU_PALLAS_INTERPRET", "1")
    from zkcnn_tpu.gkr.fused import _fused_quad, pack_challenges, \
        _polys_host
    _fused_quad.cache_clear()

    R = 13                      # 8192 -> pallas rounds, then XLA tail
    rng = np.random.default_rng(29)
    A1 = _rand_mont(rng, 1 << R)
    V1 = _rand_mont(rng, 1 << R)
    A0 = _rand_mont(rng, 1 << 5)
    V0 = _rand_mont(rng, 1 << 5)
    rs = pack_challenges([int.from_bytes(rng.bytes(31), "little") % FR_P
                          for _ in range(R)])
    add0 = jnp.asarray(FR.to_mont_host(42))

    outs = []
    for v in (0, 2):
        fn = _fused_quad(R, 5, R, True, v)
        polys, a0, v0, a1, v1, add = fn(A0, V0, A1, V1, rs, add0)
        finals = jnp.stack([a0[0], v0[0], a1[0], v1[0], add])
        outs.append(([_polys_host(polys)],
                     [FR.from_mont_host(x) for x in np.asarray(finals)]))
    _fused_quad.cache_clear()
    assert outs[0] == outs[1]
