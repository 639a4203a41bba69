"""Chunked-kernel equivalence tests: the vgg-scale streaming paths
(GATE_CHUNK / EVAL_CHUNK pieces, composed beta tables, chunked
from_int64) must be bit-identical to the single-program paths they
replace.  Chunk thresholds are monkeypatched small so the streaming
code runs at test sizes."""

import numpy as np
import jax.numpy as jnp
import pytest

from zkcnn_tpu.field import FR
from zkcnn_tpu.field.params import FR_P


def _rand_fields(rng, k):
    return [int.from_bytes(rng.bytes(31), "little") % FR_P
            for _ in range(k)]


def test_from_int64_chunk_boundary_exact():
    rng = np.random.default_rng(0)
    n = (1 << 19) + 777          # crosses the 2^19 conversion chunk
    v = rng.integers(-2 ** 62, 2 ** 62, size=n, dtype=np.int64)
    out = FR.from_int64(v)
    for i in (0, 1, (1 << 19) - 1, (1 << 19), n - 1):
        assert FR.from_mont_host(np.asarray(out[i])) == int(v[i]) % FR_P


def test_beta_table_composed_matches_direct(monkeypatch):
    import zkcnn_tpu.mle.beta as beta_mod
    rng = np.random.default_rng(1)
    r = _rand_fields(rng, 7)
    direct = np.asarray(beta_mod.beta_table(r, 5))
    monkeypatch.setattr(beta_mod, "_BETA_JIT_MAX", 3)
    composed = np.asarray(beta_mod.beta_table(r, 5))
    assert (direct == composed).all()


def _rand_gates(rng, n_bin, out_bits, u_bits, v_max):
    from zkcnn_tpu.circuit.ir import BIN_G, BIN_U, BIN_V, BIN_SC, BIN_L
    g = np.zeros((n_bin, 5), np.int64)
    g[:, BIN_G] = rng.integers(0, 1 << out_bits, n_bin)
    g[:, BIN_U] = rng.integers(0, 1 << u_bits, n_bin)
    g[:, BIN_V] = rng.integers(0, v_max, n_bin)
    g[:, BIN_SC] = rng.integers(0, 4, n_bin)
    g[:, BIN_L] = 3
    return g


def test_p1_mult_chunked_matches_fused(monkeypatch):
    import zkcnn_tpu.gkr.kernels as K
    from zkcnn_tpu.circuit.eval import two_mul_table
    rng = np.random.default_rng(2)
    out_bits, u_bits = 5, 4
    prev_rows = 1 << u_bits
    bg = jnp.asarray(FR.pack_mont_host(_rand_fields(rng, 1 << out_bits)))
    prev = jnp.asarray(FR.pack_mont_host(_rand_fields(rng, prev_rows)))
    val0 = jnp.asarray(FR.pack_mont_host(_rand_fields(rng, 8)))
    tm = two_mul_table()
    gates = _rand_gates(rng, 200, out_bits, u_bits, prev_rows)
    empty = np.zeros((0, 4), np.int64)
    ori = jnp.zeros((1,), jnp.int32)

    def run(chunk):
        monkeypatch.setattr(K, "GATE_CHUNK", chunk)
        padded = jnp.asarray(
            K.pad_chunk_rows(gates, chunk).astype(np.int32))
        return np.asarray(K.p1_mult_chunked(
            1 << u_bits, (True, True, False), bg, tm,
            jnp.asarray(K.pad_chunk_rows(empty, chunk).astype(np.int32)),
            jnp.zeros((0, 5), jnp.int32), padded, ori, val0, prev))

    fused = run(1 << 19)         # single p1_mult program
    chunked = run(64)            # 4 streamed pieces
    assert (fused == chunked).all()


def test_eval_normal_layer_chunked_matches(monkeypatch):
    """Streamed witness eval == single-shot on a layer whose gate count
    crosses the (patched) chunk size; ground truth = exact host ints."""
    import zkcnn_tpu.circuit.eval as ev
    from zkcnn_tpu.circuit.ir import Layer, LayerType, \
        UNI_G, UNI_U, UNI_LU, UNI_SC, BIN_G, BIN_U, BIN_V, BIN_SC, BIN_L
    rng = np.random.default_rng(3)
    n0, nprev, out_bits = 16, 16, 5
    val0_i = _rand_fields(rng, n0)
    prev_i = _rand_fields(rng, nprev)
    val0 = jnp.asarray(FR.pack_mont_host(val0_i))
    prev = jnp.asarray(FR.pack_mont_host(prev_i))

    n_uni, n_bin = 150, 250
    uni = np.zeros((n_uni, 4), np.int64)
    uni[:, UNI_G] = rng.integers(0, 1 << out_bits, n_uni)
    uni[:, UNI_U] = rng.integers(0, n0, n_uni)
    uni[:, UNI_LU] = rng.integers(0, 2, n_uni)
    uni[:, UNI_SC] = rng.integers(0, 3, n_uni)
    bins = np.zeros((n_bin, 5), np.int64)
    bins[:, BIN_G] = rng.integers(0, 1 << out_bits, n_bin)
    bins[:, BIN_U] = rng.integers(0, min(n0, nprev), n_bin)
    bins[:, BIN_V] = rng.integers(0, min(n0, nprev), n_bin)
    bins[:, BIN_SC] = rng.integers(0, 3, n_bin)
    bins[:, BIN_L] = rng.integers(0, 4, n_bin)

    layer = Layer(LayerType.NCONV)
    layer.bit_length = out_bits
    layer.size = 1 << out_bits
    layer.scale = 3
    layer.uni, layer.bin = uni, bins

    # exact ground truth
    from zkcnn_tpu.circuit.ir import Circuit
    tmv = Circuit.init(220, 1).two_mul
    want = [0] * (1 << out_bits)
    for g, u, lu, sc in uni:
        src = val0_i[u] if lu == 0 else prev_i[u]
        want[g] = (want[g] + src * tmv[sc]) % FR_P
    for g, u, v, sc, l in bins:
        a = val0_i[u] if l == 0 else prev_i[u]
        b = val0_i[v] if (l & 1) == 0 else prev_i[v]
        want[g] = (want[g] + a * b % FR_P * tmv[sc]) % FR_P
    want = [w * 3 % FR_P for w in want]

    monkeypatch.setattr(ev, "EVAL_CHUNK", 64)   # force streaming
    out = ev.eval_normal_layer(layer, val0, prev)
    got = [FR.from_mont_host(np.asarray(out[i]))
           for i in range(1 << out_bits)]
    assert got == want


@pytest.mark.heavy
def test_ladder_row_chunking_matches(monkeypatch):
    """Row-chunked big-ladder steps (vgg HBM path) must emit identical
    dot stacks and folded operands to the one-shot ladder program."""
    import numpy as np
    import jax.numpy as jnp
    from zkcnn_tpu.field import FR
    from zkcnn_tpu.field.params import FR_P
    from zkcnn_tpu.gkr import fused
    from zkcnn_tpu.gkr.fused import _run_side_ladder, pack_challenges

    rng = np.random.default_rng(5)
    k = 9
    m = 1 << k
    vals_a = [int.from_bytes(rng.bytes(31), "little") % FR_P
              for _ in range(m)]
    vals_v = [int.from_bytes(rng.bytes(31), "little") % FR_P
              for _ in range(m)]
    A = jnp.asarray(FR.pack_mont_host(vals_a))
    V = jnp.asarray(FR.pack_mont_host(vals_v))
    rs = pack_challenges([int.from_bytes(rng.bytes(31), "little") % FR_P
                          for _ in range(k)])

    ref_stacks, ref_A, ref_V = _run_side_ladder(A, V, k, rs, 0)
    monkeypatch.setattr(fused, "LADDER_CHUNK_BL", 6)
    got_stacks, got_A, got_V = _run_side_ladder(A, V, k, rs, 0)

    ref = np.concatenate([np.asarray(s) for s in ref_stacks])
    got = np.concatenate([np.asarray(s) for s in got_stacks])
    np.testing.assert_array_equal(ref, got)
    np.testing.assert_array_equal(np.asarray(ref_A), np.asarray(got_A))
    np.testing.assert_array_equal(np.asarray(ref_V), np.asarray(got_V))


@pytest.mark.heavy
def test_liu_streaming_matches_oneshot(monkeypatch):
    """The vgg-scale Liu-init streaming accumulate (donated 8-bit plane
    accumulators + one blockwise finish) must produce a transcript
    bit-identical to the oneshot segment-sum path (r5: the r4 vgg11
    OOM fix must not change the math)."""
    from zkcnn_tpu.nn import random_source
    from zkcnn_tpu.nn.models import ccnn
    from zkcnn_tpu.nn.params import PoolType
    from zkcnn_tpu.gkr import Prover, Verifier, Tape
    from zkcnn_tpu.gkr import prover as prover_mod

    nn = ccnn(8, 8, 1, 1, PoolType.MAX)
    C, vals = nn.create(random_source(9))

    def run():
        p = Prover(C, vals)
        v = Verifier(p, C, Tape(b"liu-stream"))
        ok = v.verify()
        return ok, v.transcript_digest

    ok1, d1 = run()
    assert ok1
    # force the streaming path (tiny threshold + tiny chunks so several
    # donated accumulate steps and the bounded sync actually exercise)
    monkeypatch.setattr(prover_mod.Prover, "LIU_ONESHOT_ROWS", 1)
    monkeypatch.setattr(prover_mod, "GATE_CHUNK", 64)
    monkeypatch.setattr(prover_mod.Prover, "LIU_SYNC_EVERY", 2)
    ok2, d2 = run()
    assert ok2
    assert d1 == d2
