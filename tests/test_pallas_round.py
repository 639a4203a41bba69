"""Pallas fused round kernel vs the XLA reference kernels.

Runs in interpreter mode on CPU (the kernel itself targets TPU); same
math, so outputs must be bit-identical to mle.fold's dots + fold.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from zkcnn_tpu.field import FR
from zkcnn_tpu.field.params import FR_P
from zkcnn_tpu.field.pallas_round import round_step, supported, TILE
from zkcnn_tpu.mle import fold, coeffs_quadratic_dots


def _rand_mont(rng, m):
    xs = [int.from_bytes(rng.bytes(31), "little") % FR_P for _ in range(m)]
    return jnp.asarray(FR.pack_mont_host(xs)), xs


def test_round_step_matches_xla():
    m = 2 * TILE
    rng = np.random.default_rng(7)
    A, _ = _rand_mont(rng, m)
    V, _ = _rand_mont(rng, m)
    r = 98765432123456789 % FR_P
    rp = jnp.asarray(FR.to_mont_host(r))

    d_ref = np.asarray(coeffs_quadratic_dots(A, V))
    A2_ref = np.asarray(fold(A, rp))
    V2_ref = np.asarray(fold(V, rp))

    d, A2, V2 = round_step(A, V, rp, interpret=True)
    assert [FR.from_mont_host(x) for x in np.asarray(d)] \
        == [FR.from_mont_host(x) for x in d_ref]
    # canonical limbs must agree exactly
    np.testing.assert_array_equal(np.asarray(A2), A2_ref)
    np.testing.assert_array_equal(np.asarray(V2), V2_ref)


def test_supported_bounds():
    assert supported(TILE)
    assert not supported(TILE + 1)
    assert not supported(1 << 26)


@pytest.mark.heavy
def test_cubic_round_step_matches_xla():
    from zkcnn_tpu.field.pallas_round import cubic_round_step, \
        cubic_supported
    from zkcnn_tpu.gkr.engine import _cubic_terms

    K = 2 * TILE
    for M in (64, 2 * TILE):        # in-kernel tiling and block cases
        assert cubic_supported(K, M)
        rng = np.random.default_rng(M)
        m, _ = _rand_mont(rng, M)
        V0, _ = _rand_mont(rng, K)
        V1, _ = _rand_mont(rng, K)
        r = 1234567890987654321 % FR_P
        rp = jnp.asarray(FR.to_mont_host(r))

        c_ref = np.asarray(jnp.stack(_cubic_terms(m, V1, V0)))
        m2_ref = np.asarray(fold(m, rp))
        V02_ref = np.asarray(fold(V0, rp))
        V12_ref = np.asarray(fold(V1, rp))

        c, m2, V02, V12 = cubic_round_step(m, V0, V1, rp,
                                           interpret=True)
        assert [FR.from_mont_host(x) for x in np.asarray(c)] \
            == [FR.from_mont_host(x) for x in c_ref]
        np.testing.assert_array_equal(np.asarray(m2), m2_ref)
        np.testing.assert_array_equal(np.asarray(V02), V02_ref)
        np.testing.assert_array_equal(np.asarray(V12), V12_ref)
