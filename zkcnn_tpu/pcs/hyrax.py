"""Hyrax polynomial commitment (square-root matrix form).

Reconstructed from the reference's call-site contract (the upstream
hyrax-bls12-381 submodule is absent; SURVEY.md section 2 "hyrax" row):

  * gens are |cols| = 2^(logn - logn//2) random G1 points drawn from
    the verifier's randomness (reference verifier.cpp:119-126);
  * the prover arranges the padded input MLE as a rows x cols matrix
    and Pedersen-commits every row (one MSM per row, batched here);
  * opening at point r: the verifier folds the row commitments with
    eq(row, r_hi) into a single commitment T'; the prover sends the
    equally-folded scalar row b; the verifier checks <b, gens> == T'
    and <b, eq(r_lo)> == eval.

This is the transparent non-ZK variant (the reference "doesn't add
complete zero-knowledge property", README.md:5).  Opening proof size
is O(sqrt N) field elements; a log-round Bulletproofs IPA compression
is the planned upgrade (tracked in pcs/ipa.py).
"""

import time
from typing import List

import numpy as np
import jax.numpy as jnp

from ..field import FR
from ..field.params import FR_P
from ..mle import beta_table
from . import curve
from .msm import FixedBaseMSM, points_equal

F_BYTE_SIZE = 32
G_BYTE_SIZE = 48


class HyraxPCS:
    """mode="sqrt": prover sends the folded row b (sqrt-size proof,
    cheapest verify).  mode="ipa": Bulletproofs-style log-round
    inner-product argument (2 log2(cols) G1 points + 1 scalar), the
    construction the reference's hyrax submodule implements."""

    def __init__(self, mode: str = "sqrt"):
        assert mode in ("sqrt", "ipa")
        self.mode = mode
        self.pt = 0.0   # prover seconds
        self.vt = 0.0   # verifier seconds
        self.ps = 0     # proof bytes

    def setup(self, bit_length: int, tape):
        """Draw sqrt-many generators from the verifier tape
        (verifier.cpp:119-126)."""
        self.logn = bit_length
        self.l_col = bit_length - (bit_length >> 1)
        self.n_cols = 1 << self.l_col
        self.n_rows = 1 << (bit_length >> 1)
        scalars = tape.fields(self.n_cols)
        plain = jnp.asarray(
            np.stack([np.array(
                [(s >> (16 * i)) & 0xFFFF for i in range(FR.n)],
                np.uint32) for s in scalars]))
        base = jnp.broadcast_to(curve.base_point(),
                                (self.n_cols, 3, curve.FP.n))
        self.gens = curve.scalar_mul(base, plain)
        self.gen_msm = FixedBaseMSM(self.gens)

    def commit(self, val0):
        """Pedersen-commit each matrix row: [n_rows] G1 points."""
        t0 = time.time()
        mat = val0[: self.n_rows * self.n_cols].reshape(
            self.n_rows, self.n_cols, FR.n)
        self.row_commits = self.gen_msm.compute(mat)
        import jax
        jax.block_until_ready(self.row_commits)
        self.pt += time.time() - t0
        self.ps += self.n_rows * G_BYTE_SIZE
        return self.row_commits

    def open_and_verify(self, commitment, val0, r: List[int],
                        eval_in: int, tape) -> bool:
        # prover side: fold rows with eq(r_hi)
        t0 = time.time()
        eq_hi = beta_table(r[self.l_col:], 1)        # [n_rows, n]
        mat = val0[: self.n_rows * self.n_cols].reshape(
            self.n_rows, self.n_cols, FR.n)
        b = FR.dot_mont(mat, eq_hi[:, None, :], axis=0)   # [n_cols, n]
        self.pt += time.time() - t0

        eq_lo = beta_table(r[: self.l_col], 1)
        if self.mode == "ipa":
            return self._open_ipa(commitment, b, eq_lo, eq_hi,
                                  eval_in, tape)

        # sqrt open: b is the proof; verifier checks both relations
        self.ps += self.n_cols * F_BYTE_SIZE
        t0 = time.time()
        eval_got = FR.from_mont_host(np.asarray(FR.dot_mont(b, eq_lo)))
        if eval_got != eval_in % FR_P:
            return False
        t_fold = FixedBaseMSM(commitment).compute(eq_hi[None])[0]
        lhs = self.gen_msm.compute(b[None])[0]
        ok = bool(np.asarray(points_equal(lhs, t_fold)))
        self.vt += time.time() - t0
        return ok

    def _open_ipa(self, commitment, b, eq_lo, eq_hi, eval_in, tape):
        from .ipa import ipa_prove, ipa_verify
        # auxiliary generator from the verifier tape
        q_scalar = tape.field()
        plain = jnp.asarray(np.array(
            [[(q_scalar >> (16 * i)) & 0xFFFF for i in range(FR.n)]],
            np.uint32))
        Q = curve.scalar_mul(curve.base_point()[None], plain)[0]
        # verifier folds the row commitments into P = <b, gens>
        t0 = time.time()
        P = FixedBaseMSM(commitment).compute(eq_hi[None])[0]
        self.vt += time.time() - t0
        # interactive rounds: prover and verifier consume the same
        # challenge sequence (tape replay)
        replay = tape.clone()
        t0 = time.time()
        proof = ipa_prove(b, eq_lo, self.gens, Q, eval_in, tape)
        self.pt += time.time() - t0
        self.ps += len(proof.Ls) * 2 * G_BYTE_SIZE + F_BYTE_SIZE
        t0 = time.time()
        ok = ipa_verify(proof, eq_lo, self.gens, Q, P, eval_in, replay)
        self.vt += time.time() - t0
        return ok
