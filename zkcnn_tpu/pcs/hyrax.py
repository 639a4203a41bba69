"""Hyrax polynomial commitment (square-root matrix form).

Reconstructed from the reference's call-site contract (the upstream
hyrax-bls12-381 submodule is absent; SURVEY.md section 2 "hyrax" row):

  * gens are |cols| = 2^(logn - logn//2) G1 points (reference
    verifier.cpp:119-126 draws them from the verifier's live CSPRNG;
    here: tape-drawn s_i*G in the interactive model, where the prover
    cannot grind the verifier's randomness, but hash-to-curve points
    with unknown discrete logs in Fiat-Shamir mode, where tape-derived
    scalars would be known to the prover and break binding);
  * the prover arranges the padded input MLE as a rows x cols matrix
    and Pedersen-commits every row (one MSM per row, batched here);
  * opening at point r: the verifier folds the row commitments with
    eq(row, r_hi) into a single commitment T'; the prover sends the
    equally-folded scalar row b (or an IPA compressing it); the
    verifier checks <b, gens> == T' and <b, eq(r_lo)> == eval.

Prover/verifier split: open() produces a self-contained SqrtProof /
IpaProof from the witness; verify() consumes ONLY public data (the
commitment, the point, the claimed eval, the proof) -- a verifier
never touches the witness.

This is the transparent non-ZK variant (the reference "doesn't add
complete zero-knowledge property", README.md:5).
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


class SqrtProof:
    """The folded matrix row b ([n_cols, n] Montgomery limbs)."""

    def __init__(self, b):
        self.b = b


class HyraxPCS:
    """mode="ipa" (default): Bulletproofs-style log-round inner-product
    argument (2 log2(cols) G1 points + 1 scalar), the construction the
    reference's hyrax submodule implements (README.md:94) -- logarithmic
    POLY_PS.  mode="sqrt": prover sends the folded row b directly
    (sqrt-size proof, cheapest verify)."""

    def __init__(self, mode: str = "ipa"):
        assert mode in ("sqrt", "ipa")
        self.mode = mode
        self.pt = 0.0   # prover seconds
        self.vt = 0.0   # verifier seconds
        self.ps = 0     # proof bytes

    def setup(self, bit_length: int, tape):
        """Generators: tape-drawn in the interactive model (reference
        verifier.cpp:119-126 parity); hash-to-curve (unknown discrete
        logs) for Fiat-Shamir tapes -- see module docstring."""
        self.logn = bit_length
        self.l_col = bit_length - (bit_length >> 1)
        self.n_cols = 1 << self.l_col
        self.n_rows = 1 << (bit_length >> 1)
        if tape.precomputable:
            scalars = tape.fields(self.n_cols)
            self.gens = self._tape_gens(scalars)
        else:
            pts = [curve.hash_to_group_host(b"zkcnn-hyrax-gen", i)
                   for i in range(self.n_cols)]
            self.gens = jnp.asarray(np.stack(
                [curve.point_pack((x, y, 1)) for (x, y) in pts]))
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

    # ------------------------------------------------------------------
    # prover side

    def open(self, val0, r: List[int], eval_in: int, tape):
        """Produce the opening proof at point r from the witness."""
        t0 = time.time()
        eq_hi = beta_table(r[self.l_col:], 1)        # [n_rows, n]
        mat = val0[: self.n_rows * self.n_cols].reshape(
            self.n_rows, self.n_cols, FR.n)
        b = FR.dot_mont(mat, eq_hi[:, None, :], axis=0)   # [n_cols, n]
        self.pt += time.time() - t0
        if self.mode == "sqrt":
            self.ps += self.n_cols * F_BYTE_SIZE
            return SqrtProof(np.asarray(b))
        from .ipa import ipa_prove
        Q = self._aux_gen(tape)
        eq_lo = beta_table(r[: self.l_col], 1)
        t0 = time.time()
        proof = ipa_prove(b, eq_lo, self.gens, Q, eval_in, tape)
        self.pt += time.time() - t0
        self.ps += len(proof.Ls) * 2 * G_BYTE_SIZE + F_BYTE_SIZE
        return proof

    @staticmethod
    def _tape_gens(scalars):
        """s_i*G for tape-drawn scalars.  On TPU: the batched device
        ladder (255-step fori).  Off-TPU: host py_mul -- identical
        POINTS with Z=1 coordinates (affine-canonical encodings and
        points_equal are representation-invariant, so transcripts
        don't change), and zero XLA:CPU compile cost -- the device
        ladder's loop body was a minutes-long single-core compile in
        the driver dryrun."""
        import jax
        try:
            on_tpu = jax.default_backend() == "tpu"
        except Exception:
            on_tpu = False
        if on_tpu:
            plain = jnp.asarray(
                np.stack([np.array(
                    [(s >> (16 * i)) & 0xFFFF for i in range(FR.n)],
                    np.uint32) for s in scalars]))
            base = jnp.broadcast_to(curve.base_point(),
                                    (len(scalars), 3, curve.FP.n))
            return curve.scalar_mul(base, plain)
        G = (curve.G1_X, curve.G1_Y)
        rows = []
        for s in scalars:
            P = curve.py_mul(G, s)
            rows.append(curve.point_pack((P[0], P[1], 1)) if P
                        else np.zeros((3, curve.FP.n), np.uint32))
        return jnp.asarray(np.stack(rows))

    def _aux_gen(self, tape):
        """The IPA's auxiliary generator Q: tape-drawn (interactive) or
        hash-to-curve (Fiat-Shamir), same rationale as setup()."""
        if tape.precomputable:
            return self._tape_gens([tape.field()])[0]
        x, y = curve.hash_to_group_host(b"zkcnn-hyrax-gen-Q", 0)
        return jnp.asarray(curve.point_pack((x, y, 1)))

    # ------------------------------------------------------------------
    # verifier side (public data only: commitment, r, eval, proof)

    def verify(self, commitment, r: List[int], eval_in: int, proof,
               tape) -> bool:
        eq_lo = beta_table(r[: self.l_col], 1)
        eq_hi = beta_table(r[self.l_col:], 1)
        if self.mode == "sqrt":
            t0 = time.time()
            b = jnp.asarray(proof.b)
            eval_got = FR.from_mont_host(
                np.asarray(FR.dot_mont(b, eq_lo)))
            if eval_got != eval_in % FR_P:
                return False
            t_fold = FixedBaseMSM(commitment).compute(eq_hi[None])[0]
            lhs = self.gen_msm.compute(b[None])[0]
            ok = bool(np.asarray(points_equal(lhs, t_fold)))
            self.vt += time.time() - t0
            return ok
        from .ipa import ipa_verify
        Q = self._aux_gen(tape)
        t0 = time.time()
        P = FixedBaseMSM(commitment).compute(eq_hi[None])[0]
        ok = ipa_verify(proof, eq_lo, self.gens, Q, P, eval_in, tape)
        self.vt += time.time() - t0
        return ok

    def open_and_verify(self, commitment, val0, r: List[int],
                        eval_in: int, tape) -> bool:
        """Prove + verify with prover and verifier consuming identical
        challenge sequences (verifier replays a tape snapshot)."""
        vtape = tape.clone()
        proof = self.open(val0, r, eval_in, tape)
        return self.verify(commitment, r, eval_in, proof, vtape)
