"""MLE tables, folds and NTT vs exact Python-int brute force."""
import numpy as np
import jax.numpy as jnp

from zkcnn_tpu.field import FR, FR_P, root_of_unity
from zkcnn_tpu.mle import beta_table, beta_table_2pt, phi_table, fold, \
    coeffs_quadratic, mle_eval
from zkcnn_tpu.ntt import ntt, intt

RNG = np.random.default_rng(7)
P = FR_P


def rint():
    return int.from_bytes(RNG.bytes(40), "little") % P


def eq_ref(i, r, init):
    v = init
    for k, rk in enumerate(r):
        v = v * (rk if (i >> k) & 1 else (1 - rk)) % P
    return v


def test_beta_table():
    r = [rint() for _ in range(5)]
    init = rint()
    got = FR.unpack_mont_host(beta_table(r, init))
    assert got == [eq_ref(i, r, init) for i in range(32)]
    assert FR.unpack_mont_host(beta_table([], 3)) == [3]
    assert FR.unpack_mont_host(beta_table(r, 0)) == [0] * 32


def test_beta_table_2pt():
    r0 = [rint() for _ in range(4)]
    r1 = [rint() for _ in range(4)]
    a, b = rint(), rint()
    got = FR.unpack_mont_host(beta_table_2pt(r0, r1, a, b))
    want = [(eq_ref(i, r0, a) + eq_ref(i, r1, b)) % P for i in range(16)]
    assert got == want
    got0 = FR.unpack_mont_host(beta_table_2pt(r0, r1, a, 0))
    assert got0 == [eq_ref(i, r0, a) for i in range(16)]


def brute_dft(x, logn, inverse=False):
    N = 1 << logn
    w = root_of_unity(logn)
    if inverse:
        w = pow(w, P - 2, P)
    out = [sum(x[j] * pow(w, i * j, P) for j in range(N)) % P
           for i in range(N)]
    if inverse:
        ninv = pow(N, P - 2, P)
        out = [v * ninv % P for v in out]
    return out


def test_ntt_roundtrip():
    logn = 4
    N = 1 << logn
    xs = [[rint() for _ in range(N)] for _ in range(3)]
    dev = jnp.asarray(np.stack([FR.pack_mont_host(x) for x in xs]))
    f = ntt(dev, logn)
    for b in range(3):
        assert FR.unpack_mont_host(f[b]) == brute_dft(xs[b], logn)
    back = intt(f, logn)
    for b in range(3):
        assert FR.unpack_mont_host(back[b]) == xs[b]


def mle_ref(vals, r):
    # little-endian MLE: fold bit 0 first
    v = list(vals) + [0] * ((1 << len(r)) - len(vals))
    for rk in r:
        v = [(v[2 * i] + rk * (v[2 * i + 1] - v[2 * i])) % P
             for i in range(len(v) // 2)]
    return v[0]


def test_mle_eval():
    vals = [rint() for _ in range(11)]  # ragged -> padded
    r = [rint() for _ in range(4)]
    dev = jnp.asarray(FR.pack_mont_host(vals))
    assert mle_eval(dev, r) == mle_ref(vals, r)


def test_fold_and_coeffs():
    k = 8
    A = [rint() for _ in range(k)]
    V = [rint() for _ in range(k)]
    dA = jnp.asarray(FR.pack_mont_host(A))
    dV = jnp.asarray(FR.pack_mont_host(V))
    c0, c1, c2 = coeffs_quadratic(dA, dV)
    c0, c1, c2 = (FR.from_mont_host(np.asarray(c)) for c in (c0, c1, c2))
    # h(0)+h(1) must equal sum A_i V_i
    total = sum(a * v for a, v in zip(A, V)) % P
    assert (c0 + (c0 + c1 + c2)) % P == total
    # h(r) must equal sum over folded pairs
    r = rint()
    fA = FR.unpack_mont_host(fold(dA, jnp.asarray(FR.to_mont_host(r))))
    fV = FR.unpack_mont_host(fold(dV, jnp.asarray(FR.to_mont_host(r))))
    hr = (c0 + c1 * r + c2 * r * r) % P
    assert hr == sum(a * v for a, v in zip(fA, fV)) % P


def test_phi_table_forward_contract():
    # sum_u phi[u]*x[u] == MLE of DFT(pad(x)) at r   (FFT layer predicate)
    n = 4
    scale = 1
    x = [rint() for _ in range(1 << (n - 1))]
    r = [rint() for _ in range(n)]
    phi = phi_table(r, scale, n, inverse=False)
    xs = jnp.asarray(FR.pack_mont_host(x))
    got = FR.from_mont_host(np.asarray(FR.sum(FR.mul(phi, xs), axis=-2)))
    f = brute_dft(x + [0] * (1 << (n - 1)), n)
    want = mle_ref(f, r)
    assert got == want


def test_phi_table_inverse_contract():
    # sum_t phi[t]*y[t] == MLE of first half of IDFT(y) at r (IFFT layer)
    n = 4
    x = [rint() for _ in range(1 << n)]
    r = [rint() for _ in range(n - 1)]
    ninv = pow(1 << n, P - 2, P)
    phi = phi_table(r, ninv, n, inverse=True)
    xs = jnp.asarray(FR.pack_mont_host(x))
    got = FR.from_mont_host(np.asarray(FR.sum(FR.mul(phi, xs), axis=-2)))
    inv = brute_dft(x, n, inverse=True)[: 1 << (n - 1)]
    want = mle_ref(inv, r)
    assert got == want
