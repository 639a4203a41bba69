"""Field limb arithmetic vs exact Python-int ground truth."""
import numpy as np
import jax.numpy as jnp
import pytest

from zkcnn_tpu.field import FR, FP, root_of_unity, FR_P


RNG = np.random.default_rng(0)


def rand_ints(f, k):
    return [int.from_bytes(RNG.bytes(40), "little") % f.p for _ in range(k)]


@pytest.mark.parametrize("f", [FR, FP], ids=["Fr", "Fp"])
def test_mont_roundtrip(f):
    xs = rand_ints(f, 7) + [0, 1, f.p - 1]
    arr = f.pack_mont_host(xs)
    back = f.unpack_mont_host(arr)
    assert back == [x % f.p for x in xs]


@pytest.mark.parametrize("f", [FR, FP], ids=["Fr", "Fp"])
def test_add_sub_neg(f):
    xs = rand_ints(f, 33) + [0, 1, f.p - 1]
    ys = rand_ints(f, 33) + [f.p - 1, 0, 1]
    a = jnp.asarray(f.pack_mont_host(xs))
    b = jnp.asarray(f.pack_mont_host(ys))
    assert f.unpack_mont_host(f.add(a, b)) == [(x + y) % f.p
                                               for x, y in zip(xs, ys)]
    assert f.unpack_mont_host(f.sub(a, b)) == [(x - y) % f.p
                                               for x, y in zip(xs, ys)]
    assert f.unpack_mont_host(f.neg(a)) == [(-x) % f.p for x in xs]


@pytest.mark.parametrize("f", [FR, FP], ids=["Fr", "Fp"])
def test_mul(f):
    xs = rand_ints(f, 40) + [0, 1, f.p - 1, f.p - 1]
    ys = rand_ints(f, 40) + [f.p - 1, f.p - 1, f.p - 1, 0]
    a = jnp.asarray(f.pack_mont_host(xs))
    b = jnp.asarray(f.pack_mont_host(ys))
    got = f.unpack_mont_host(f.mul(a, b))
    assert got == [(x * y) % f.p for x, y in zip(xs, ys)]


@pytest.mark.parametrize("m", [1, 2, 5, 2048, 2049, 6000])
def test_sum(m):
    f = FR
    xs = [int.from_bytes(RNG.bytes(40), "little") % f.p for _ in range(m)]
    a = jnp.asarray(f.pack_mont_host(xs))
    got = f.unpack_mont_host(f.sum(a, axis=-2))[0]
    assert got == sum(xs) % f.p


def test_from_int64():
    f = FR
    v = np.array([0, 1, -1, 123456789, -987654321, 2**62, -(2**62)], np.int64)
    got = f.unpack_mont_host(f.from_int64(v))
    assert got == [int(x) % f.p for x in v]


def test_root_of_unity():
    for n in [1, 2, 5, 11, 32]:
        w = root_of_unity(n)
        assert pow(w, 1 << (n - 1), FR_P) == FR_P - 1
        assert pow(w, 1 << n, FR_P) == 1
    assert root_of_unity(0) == 1


def test_mul_const_and_dot():
    f = FR
    xs = rand_ints(f, 9)
    a = jnp.asarray(f.pack_mont_host(xs))
    got = f.unpack_mont_host(f.mul_const(a, 3))
    assert got == [x * 3 % f.p for x in xs]
    ys = rand_ints(f, 9)
    b = jnp.asarray(f.pack_mont_host(ys))
    d = f.unpack_mont_host(f.dot(a, b))[0]
    assert d == sum(x * y for x, y in zip(xs, ys)) % f.p
