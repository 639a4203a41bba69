"""GKR verifier: protocol driver + independent predicate evaluation.

Mirrors the reference verifier (src/verifier.cpp) step for step: the
verifier owns all randomness (here an injectable Tape), drives the
prover layer by layer top-down, checks every sumcheck round message
against the previous claim, and independently rebuilds each layer's
wiring-predicate evaluations (betaInitPhase1/2 + predicatePhase1/2,
verifier.cpp:36-116) so the prover is never trusted.

The three stages are verify_inner_layers / verify_first_layer (the
"Liu" input consolidation) / verify_input (polynomial commitment
opening, optional here until the Hyrax PCS is wired in).
"""

import time
from typing import List, Optional

import numpy as np
import jax.numpy as jnp

from ..field import FR
from ..field.params import FR_P
from ..circuit import Circuit, LayerType
from ..circuit.eval import two_mul_table
from ..circuit.ir import UNI_G, UNI_U, UNI_SC, BIN_G, BIN_U, BIN_V, \
    BIN_SC, BIN_L
from ..mle import beta_table, beta_table_2pt, phi_table
from .engine import _host, _pack
from .kernels import (pred_uni, pred_bin, zero_region_scale,
                      mul_outer_flat, gr_term)
from .prover import Prover
from .tape import Tape


def _eval_poly(coeffs, x: int) -> int:
    acc = 0
    for c in reversed(coeffs):
        acc = (acc * x + c) % FR_P
    return acc


class Verifier:
    def __init__(self, p: Prover, C: Circuit, tape: Optional[Tape] = None,
                 pcs=None, log=lambda *a: None):
        self.p = p
        self.C = C
        self.tape = tape or Tape()
        self.pcs = pcs
        self.log = log
        n = C.size
        self.final_claim_u0 = [0] * (n + 2)
        self.final_claim_v0 = [0] * (n + 2)
        self.r_u: List[Optional[List[int]]] = [None] * (n + 2)
        self.r_v: List[Optional[List[int]]] = [None] * (n + 2)
        self.tm = two_mul_table()
        self.uni_value = [0, 0]
        self.bin_value = [0, 0, 0]
        self.vt = 0.0       # fast-path verifier time
        self.vt_slow = 0.0  # including predicate table builds

    # ------------------------------------------------------------------
    # predicate evaluation (verifier.cpp:25-116)

    def _get_final_value(self, cu0, cu1, cv0, cv1) -> int:
        return (self.bin_value[0] * (cu0 * cv0 % FR_P)
                + self.bin_value[1] * (cu1 * cv1 % FR_P)
                + self.bin_value[2] * (cu1 * cv0 % FR_P)
                + self.uni_value[0] * cu0
                + self.uni_value[1] * cu1) % FR_P

    def _beta_init_phase1(self, depth, alpha, beta, r_0, r_1, relu_rou):
        cur = self.C.layers[depth]
        bl = cur.bit_length
        fft_bl = cur.fft_bit_length
        fblh = fft_bl - 1

        if cur.ty in (LayerType.FFT, LayerType.IFFT):
            self.beta_gs = phi_table(r_0, cur.scale, fft_bl,
                                     cur.ty == LayerType.IFFT)
            self.beta_u = beta_table(self.r_u[depth][:cur.max_bl_u], 1)
            return
        if cur.ty == LayerType.PADDING:
            cnt = beta_table_2pt(
                self.r_u[depth + 2][fft_bl:fft_bl + bl - fblh],
                self.r_v[depth + 2][:bl - fblh]
                if self.r_v[depth + 2] else None, alpha, beta)
            eqf = beta_table(r_0[:fblh], 1)
            self.beta_g = mul_outer_flat(cnt, eqf)
            self.beta_u = beta_table(self.r_u[depth][:cur.max_bl_u], 1)
            return
        if cur.ty == LayerType.DOT_PROD:
            cnt_bl = bl - fft_bl
            cnt_bl2 = cur.max_bl_u - fft_bl
            self.beta_g = beta_table(
                self.r_u[depth + 2][fblh:fblh + cnt_bl], alpha)
            bu = beta_table(self.r_u[depth][fft_bl:fft_bl + cnt_bl2], 1)
            # scalar eq over the shared fft coordinates
            s = 1
            for j in range(fft_bl):
                a, b = r_0[j], self.r_u[depth][j]
                s = s * (a * b + (1 - a) * (1 - b)) % FR_P
            self.beta_u = FR.mul(bu, jnp.broadcast_to(
                jnp.asarray(FR.to_mont_host(s)), bu.shape))
            return
        a = alpha * cur.scale % FR_P
        b = beta * cur.scale % FR_P
        bg = beta_table_2pt(r_0[:bl], r_1[:bl] if r_1 else None, a, b)
        if cur.zero_start_id < cur.size:
            bg = zero_region_scale(bg, _pack(relu_rou),
                                   jnp.asarray(cur.zero_start_id))
        self.beta_g = bg
        self.beta_u = beta_table(self.r_u[depth][:cur.max_bl_u], 1)

    def _predicate_phase1(self, depth):
        cur = self.C.layers[depth]
        cache = self.p._gate_dev(cur)
        self.uni_value = [0, 0]
        self.bin_value = [0, 0, 0]
        if cur.ty in (LayerType.FFT, LayerType.IFFT):
            self.uni_value[1] = _host(FR.dot_mont(self.beta_gs, self.beta_u))
            return
        for b, key in ((0, "uni0"), (1, "uni1")):
            uni = cache[key]
            if uni.shape[0]:
                self.uni_value[b] = _host(pred_uni(
                    self.beta_g, self.beta_u, self.tm, uni,
                    cache[key + "_n"]))

    def _predicate_phase2(self, depth):
        cur = self.C.layers[depth]
        cache = self.p._gate_dev(cur)
        beta_v = beta_table(self.r_v[depth][:cur.max_bl_v], 1)
        bv0 = _host(beta_v[0])
        self.uni_value[0] = self.uni_value[0] * bv0 % FR_P
        self.uni_value[1] = self.uni_value[1] * bv0 % FR_P
        use_tm = cur.ty != LayerType.DOT_PROD
        for ub in (0, 1):
            for vb in (0, 1):
                if not cache[f"bin{ub}{vb}"].shape[0]:
                    continue
                # per-l gate groups were split at _gate_dev time
                for l in (0, 1, 2, 3):
                    key = f"bin{ub}{vb}_l{l}"
                    if key not in cache:
                        continue
                    self.bin_value[int(l)] = (
                        self.bin_value[int(l)]
                        + _host(pred_bin(use_tm, self.beta_g,
                                         self.beta_u, beta_v, self.tm,
                                         cache[key],
                                         cache[key + "_n"]))) % FR_P

    # ------------------------------------------------------------------

    def _check_rounds(self, polys, rs, previous_sum: int, what: str):
        """Replay the per-round consistency checks (verifier.cpp:
        177-194) host-side from a fused phase's coefficient list."""
        for j, poly in enumerate(polys):
            self.tape.absorb(*poly)
            if (_eval_poly(poly, 0) + _eval_poly(poly, 1)) % FR_P \
                    != previous_sum:
                self.log(f"FAIL {what} bit {j}")
                return False, previous_sum
            previous_sum = _eval_poly(poly, rs[j])
        return True, previous_sum

    def verify(self) -> bool:
        if self.pcs is not None:
            # gens are drawn from the verifier tape before anything else
            # (reference verifier.cpp:119-128), then the prover commits.
            self.pcs.setup(self.C.layers[0].bit_length, self.tape)
            self.commitment = self.pcs.commit(self.p.val[0])
            import hashlib as _hl
            dig = _hl.sha256(np.asarray(self.commitment).tobytes())
            self.tape.absorb(int.from_bytes(dig.digest(), "little"))
        ok = self.verify_inner_layers() and self.verify_first_layer() \
            and self.verify_input()
        return ok

    def verify_inner_layers(self) -> bool:
        C, p = self.C, self.p
        alpha, beta = 1, 0
        last = C.layers[C.size - 1]
        self.r_u[C.size] = self.tape.fields(last.bit_length)
        r_0 = self.r_u[C.size]
        r_1 = None

        previous_sum = p.v_res(r_0)
        self.tape.absorb(previous_sum)
        p.sumcheck_init_all(r_0)

        for i in range(C.size - 1, 0, -1):
            t_layer = time.time()
            cur = C.layers[i]
            p.sumcheck_init(alpha, beta)
            self.r_u[i] = self.tape.fields(cur.max_bl_u)
            relu_rou = self.tape.field() if cur.zero_start_id < cur.size \
                else 1

            if cur.ty == LayerType.DOT_PROD:
                p.sumcheck_dotprod_init_phase1()
            else:
                p.sumcheck_init_phase1(relu_rou)

            if self.tape.precomputable:
                # fused path: one device program for the whole phase,
                # per-round checks replayed host-side (fused.py)
                if cur.ty == LayerType.DOT_PROD:
                    polys = p.run_rounds_cubic(self.r_u[i])
                else:
                    polys = p.run_rounds_quad(self.r_u[i])
                ok, previous_sum = self._check_rounds(
                    polys, self.r_u[i], previous_sum, f"phase1 layer {i}")
                if not ok:
                    return False
            else:
                prev_r = None
                for j in range(cur.max_bl_u):
                    if cur.ty == LayerType.DOT_PROD:
                        poly = p.round_cubic(prev_r)
                    else:
                        poly = p.round_quadratic(prev_r)
                    self.tape.absorb(*poly)
                    cur_claim = (_eval_poly(poly, 0)
                                 + _eval_poly(poly, 1)) % FR_P
                    if cur_claim != previous_sum:
                        self.log(f"FAIL phase1 layer {i} bit {j}")
                        return False
                    prev_r = self.r_u[i][j]
                    previous_sum = _eval_poly(poly, prev_r)

            if cur.ty == LayerType.DOT_PROD:
                final_claim_u1 = p.dotprod_finalize1(self.r_u[i])
                self.final_claim_u0[i] = 0
            else:
                self.final_claim_u0[i], final_claim_u1 = \
                    p.finalize1(self.r_u[i])
            self.tape.absorb(self.final_claim_u0[i], final_claim_u1)

            self._beta_init_phase1(i, alpha, beta, r_0, r_1, relu_rou)
            self._predicate_phase1(i)

            final_claim_v1 = 0
            if cur.need_phase2:
                self.r_v[i] = self.tape.fields(cur.max_bl_v)
                p.sumcheck_init_phase2()
                if self.tape.precomputable:
                    polys = p.run_rounds_quad(self.r_v[i])
                    ok, previous_sum = self._check_rounds(
                        polys, self.r_v[i], previous_sum,
                        f"phase2 layer {i}")
                    if not ok:
                        return False
                else:
                    prev_r = None
                    for j in range(cur.max_bl_v):
                        poly = p.round_quadratic(prev_r)
                        self.tape.absorb(*poly)
                        cur_claim = (_eval_poly(poly, 0)
                                     + _eval_poly(poly, 1)) % FR_P
                        if cur_claim != previous_sum:
                            self.log(f"FAIL phase2 layer {i} bit {j}")
                            return False
                        prev_r = self.r_v[i][j]
                        previous_sum = _eval_poly(poly, prev_r)
                self.final_claim_v0[i], final_claim_v1 = \
                    p.finalize2(self.r_v[i])
                self.tape.absorb(self.final_claim_v0[i], final_claim_v1)
                self._predicate_phase2(i)

            test_value = self._get_final_value(
                self.final_claim_u0[i], final_claim_u1,
                self.final_claim_v0[i], final_claim_v1)
            if test_value != previous_sum:
                self.log(f"FAIL semifinal layer {i} ({cur.ty})")
                return False

            # claim linkage to the next layer down (verifier.cpp:245-255)
            if cur.ty in (LayerType.FFT, LayerType.IFFT):
                previous_sum = final_claim_u1
            else:
                alpha = self.tape.field() if cur.bit_length_u[1] >= 0 else 0
                beta = self.tape.field() if cur.bit_length_v[1] >= 0 else 0
                previous_sum = (alpha * final_claim_u1
                                + beta * final_claim_v1) % FR_P
            r_0 = self.r_u[i]
            r_1 = self.r_v[i]
            self.log(f"layer {i:3d} {cur.ty.name:9s} bl={cur.bit_length} "
                     f"ok ({time.time() - t_layer:.2f}s)")
        return True

    def verify_first_layer(self) -> bool:
        """Liu input-consolidation sumcheck (verifier.cpp:268-357)."""
        C, p = self.C, self.p
        cur = C.layers[0]
        sig_u = self.tape.fields(C.size - 1)
        sig_v = self.tape.fields(C.size - 1)
        self.r_u[0] = self.tape.fields(cur.bit_length)

        previous_sum = 0
        for i in range(1, C.size):
            if C.layers[i].bit_length_u[0] >= 0:
                previous_sum = (previous_sum
                                + sig_u[i - 1] * self.final_claim_u0[i])
            if C.layers[i].bit_length_v[0] >= 0:
                previous_sum = (previous_sum
                                + sig_v[i - 1] * self.final_claim_v0[i])
        previous_sum %= FR_P

        p.sumcheck_liu_init(sig_u, sig_v)
        if self.tape.precomputable:
            polys = p.run_rounds_quad(self.r_u[0])
            ok, previous_sum = self._check_rounds(
                polys, self.r_u[0], previous_sum, "liu")
            if not ok:
                return False
        else:
            prev_r = None
            for j in range(cur.bit_length):
                poly = p.liu_round(prev_r)
                self.tape.absorb(*poly)
                if (_eval_poly(poly, 0) + _eval_poly(poly, 1)) % FR_P \
                        != previous_sum:
                    self.log(f"FAIL liu bit {j}")
                    return False
                prev_r = self.r_u[0][j]
                previous_sum = _eval_poly(poly, prev_r)

        self.eval_in = p.liu_finalize(self.r_u[0])
        self.tape.absorb(self.eval_in)

        # gr = sum over layers of subset predicate at the bound points
        beta_g = beta_table(self.r_u[0], 1)
        gr = 0
        for i in range(1, C.size):
            ly = C.layers[i]
            cache = p._gate_dev(ly)
            if ly.bit_length_u[0] >= 0:
                bu = beta_table(self.r_u[i][:ly.bit_length_u[0]],
                                sig_u[i - 1])
                gr = (gr + _host(gr_term(
                    beta_g, cache["ori_u"], bu,
                    jnp.asarray(ly.size_u[0])))) % FR_P
            if ly.bit_length_v[0] >= 0:
                bv = beta_table(self.r_v[i][:ly.bit_length_v[0]],
                                sig_v[i - 1])
                gr = (gr + _host(gr_term(
                    beta_g, cache["ori_v"], bv,
                    jnp.asarray(ly.size_v[0])))) % FR_P

        if self.eval_in * gr % FR_P != previous_sum:
            self.log("FAIL liu semifinal")
            return False
        self.log("first layer (Liu) ok")
        return True

    def verify_input(self) -> bool:
        """Polynomial-commitment opening (verifier.cpp:359-373)."""
        if self.pcs is None:
            return True
        ok = self.pcs.open_and_verify(self.commitment, self.p.val[0],
                                      self.r_u[0], self.eval_in, self.tape)
        if not ok:
            self.log("FAIL pcs opening")
        return ok
