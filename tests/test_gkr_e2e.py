"""End-to-end GKR prove+verify on small models.

The verifier is the oracle (same property as the reference,
SURVEY.md section 4): it rebuilds every wiring predicate itself and
checks every sumcheck round, so a pass means witness, prover and
circuit all agree.  We also check soundness: a corrupted witness must
fail.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from zkcnn_tpu.field import FR
from zkcnn_tpu.gkr import Prover, Verifier, Tape
from zkcnn_tpu.nn import random_source
from zkcnn_tpu.nn.models import ccnn, singleConv
from zkcnn_tpu.nn.params import PoolType, ConvType


def run_model(nn, seed, log=False):
    C, vals = nn.create(random_source(seed))
    p = Prover(C, vals)
    v = Verifier(p, C, Tape(b"test-%d" % seed),
                 log=(print if log else (lambda *a: None)))
    return p, v


def test_single_conv_naive_e2e():
    nn = singleConv(6, 1, 1, 3, 2, ConvType.NAIVE_FAST)
    p, v = run_model(nn, 21)
    assert v.verify()


def test_single_conv_naive_mul_add_e2e():
    nn = singleConv(6, 1, 1, 3, 2, ConvType.NAIVE)
    p, v = run_model(nn, 22)
    assert v.verify()


@pytest.mark.heavy
def test_single_conv_fft_e2e():
    nn = singleConv(6, 1, 1, 3, 2, ConvType.FFT)
    p, v = run_model(nn, 23)
    assert v.verify()


@pytest.mark.heavy
def test_ccnn_max_e2e():
    nn = ccnn(8, 8, 1, 1, PoolType.MAX)
    p, v = run_model(nn, 24)
    assert v.verify()


@pytest.mark.heavy
def test_ccnn_avg_e2e():
    nn = ccnn(8, 8, 1, 1, PoolType.AVG)
    p, v = run_model(nn, 25)
    assert v.verify()


def test_soundness_bad_witness():
    nn = singleConv(6, 1, 1, 3, 2, ConvType.NAIVE_FAST)
    C, vals = nn.create(random_source(26))
    # corrupt one conv output value
    bad = vals[1].at[3].set(jnp.asarray(FR.to_mont_host(12345)))
    vals = [vals[0], bad]
    p = Prover(C, vals)
    v = Verifier(p, C, Tape(b"bad"))
    assert not v.verify()


def test_transcript_determinism():
    """Same tape seed -> identical claims and proof size across runs."""
    sizes = []
    evals = []
    for _ in range(2):
        nn = singleConv(6, 1, 1, 3, 2, ConvType.NAIVE_FAST)
        C, vals = nn.create(random_source(31))
        p = Prover(C, vals)
        v = Verifier(p, C, Tape(b"det"))
        assert v.verify()
        sizes.append(p.proof_size)
        evals.append(v.eval_in)
    assert sizes[0] == sizes[1]
    assert evals[0] == evals[1]


@pytest.mark.slow
def test_ccnn_batched_pics_e2e():
    """pic_cnt=2 flips the conv to the FFT pipeline and adds the batch
    dimension to every index space (reference README.md:36)."""
    nn = ccnn(8, 8, 2, 1, PoolType.MAX)
    p, v = run_model(nn, 27)
    assert v.verify()


@pytest.mark.heavy
def test_fused_matches_per_round(monkeypatch):
    """The fused whole-phase runner (gkr/fused.py) must produce the
    exact same transcript (proof size, input eval) as the per-round
    engine path it replaces.  Forces the one-program unrolled build
    (off by default on the CPU test backend for compile time)."""
    monkeypatch.setenv("ZKCNN_TPU_FORCE_FUSED", "1")
    results = []
    for fused in (True, False):
        nn = ccnn(8, 8, 1, 1, PoolType.AVG)
        C, vals = nn.create(random_source(41))
        p = Prover(C, vals)
        tape = Tape(b"fused-eq")
        tape.precomputable = fused
        v = Verifier(p, C, tape)
        assert v.verify()
        results.append((p.proof_size, v.eval_in))
    assert results[0] == results[1]


def test_fiat_shamir_e2e():
    """Non-interactive tape: challenges derived from absorbed prover
    messages (drawn only AFTER each round poly is absorbed -- the
    interleaved schedule); proof verifies, and a tampered witness
    fails."""
    from zkcnn_tpu.gkr import FiatShamirTape
    nn = singleConv(6, 1, 1, 3, 2, ConvType.NAIVE_FAST)
    C, vals = nn.create(random_source(33))
    p = Prover(C, vals)
    v = Verifier(p, C, FiatShamirTape(b"fs"))
    assert v.verify()

    # tampering: corrupt one layer value; the FS challenge stream
    # shifts with the absorbed messages and the proof must fail
    bad = vals[1].at[2].set(jnp.asarray(FR.to_mont_host(77)))
    p2 = Prover(C, [vals[0], bad])
    v2 = Verifier(p2, C, FiatShamirTape(b"fs"))
    assert not v2.verify()


def test_liu_chunked_matches_oneshot(monkeypatch):
    """The chunked Liu-init accumulation (vgg-scale HBM path) must
    produce the same transcript as the single-program path."""
    from zkcnn_tpu.nn import random_source
    from zkcnn_tpu.nn.models import ccnn
    from zkcnn_tpu.nn.params import PoolType
    from zkcnn_tpu.gkr import Prover, Verifier, Tape

    nn = ccnn(8, 8, 1, 1, PoolType.MAX)
    C, vals = nn.create(random_source(31))

    def prove():
        p = Prover(C, vals)
        v = Verifier(p, C, Tape(b"liu-chunk"))
        assert v.verify()
        return v.transcript_digest

    base = prove()
    monkeypatch.setattr(Prover, "LIU_ONESHOT_ROWS", 1)
    assert prove() == base
