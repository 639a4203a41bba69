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

Execution model (TPU): with a precomputable tape (interactive seeded
randomness, like the reference's live CSPRNG) every challenge is known
up front, so the protocol runs in three passes with NO device->host
round trip inside the layer loop:

  pass 1 (prover, = reference PT):   all sumcheck inits, rounds and
      finalizes dispatched async; round polys and claims accumulate as
      device tensors; ONE batched fetch at the end.
  pass 2 (predicates, = the reference's "slow" verifier work,
      verifier.cpp:133-134,200-204): beta/phi table builds + gate
      predicate contractions for every layer, again async + one fetch.
  pass 3 (checks, = reference "fast" VT): pure host replay of every
      per-round equality, final-value and Liu consistency check.

Over the TPU tunnel each host sync costs ~50 ms and each distinct
program's first call ~0.5 s, so the fused/batched passes are what make
the protocol latency-viable; the math is identical to the per-round
path (used by the Fiat-Shamir tape, whose challenges depend on
absorbed messages and cannot be precomputed).
"""

import os
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
from .kernels import (pred_uni_chunked, pred_bin_chunked,
                      zero_region_scale, mul_outer_flat, gr_term)
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
        # set by _fetch_transcript on precomputable tapes; None on
        # interactive/Fiat-Shamir replays (ADVICE r2: runner.py printed
        # an attribute that only existed on one path)
        self.transcript_digest = None

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

    def _predicate_phase1_dev(self, depth):
        """uni_value as device [n] scalars (or int 0); no host sync."""
        cur = self.C.layers[depth]
        cache = self.p._gate_dev(cur)
        self.uni_value = [0, 0]
        self.bin_value = [0, 0, 0]
        if cur.ty in (LayerType.FFT, LayerType.IFFT):
            self.uni_value[1] = FR.dot_mont(self.beta_gs, self.beta_u)
            return
        for b, key in ((0, "uni0"), (1, "uni1")):
            uni = cache[key]
            if uni.shape[0]:
                self.uni_value[b] = pred_uni_chunked(
                    self.beta_g, self.beta_u, self.tm, uni,
                    cache[key + "_n"])

    def _predicate_phase1(self, depth):
        self._predicate_phase1_dev(depth)
        self.uni_value = [v if isinstance(v, int) else _host(v)
                          for v in self.uni_value]

    def _predicate_phase2_dev(self, depth):
        cur = self.C.layers[depth]
        cache = self.p._gate_dev(cur)
        beta_v = beta_table(self.r_v[depth][:cur.max_bl_v], 1)
        self.uni_value = [
            0 if isinstance(v, int) and v == 0 else
            FR.mul(_pack(v) if isinstance(v, int) else v, beta_v[0])
            for v in self.uni_value]
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
                    t = pred_bin_chunked(
                        use_tm, self.beta_g, self.beta_u, beta_v,
                        self.tm, cache[key], cache[key + "_n"])
                    old = self.bin_value[int(l)]
                    self.bin_value[int(l)] = t if isinstance(old, int) \
                        else FR.add(old, t)

    def _predicate_phase2(self, depth):
        self._predicate_phase2_dev(depth)
        self.uni_value = [v if isinstance(v, int) else _host(v)
                          for v in self.uni_value]
        self.bin_value = [v if isinstance(v, int) else _host(v)
                          for v in self.bin_value]

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
            # gens are set up from the verifier tape before anything
            # else (reference verifier.cpp:119-128), then the prover
            # commits.  Fiat-Shamir absorbs the CANONICAL (affine)
            # encoding: Jacobian limb bytes are malleable via Z-scaling
            # (a grinding lever on every later challenge).
            self.pcs.setup(self.C.layers[0].bit_length, self.tape)
            self.log(f"pcs setup done (t={time.perf_counter():.1f})")
            self.commitment = self.pcs.commit(self.p.val[0])
            self.log(f"pcs commit done (t={time.perf_counter():.1f})")
            if not self.tape.precomputable:
                from ..pcs import curve as _curve
                import hashlib as _hl
                enc = _curve.encode_points_host(self.commitment)
                dig = _hl.sha256(enc)
                self.tape.absorb(int.from_bytes(dig.digest(), "little"))
        if self.tape.precomputable:
            ok = self._verify_precomputed()
        else:
            ok = self.verify_inner_layers() and self.verify_first_layer()
        return ok and self.verify_input()

    # ------------------------------------------------------------------
    # precomputable-tape path: three passes, no mid-protocol host sync
    # (see module docstring)

    def _verify_precomputed(self) -> bool:
        p = self.p
        t0 = time.perf_counter()
        recs = self._prover_pass()
        if os.environ.get("ZKCNN_TPU_CLEARCACHE") == "1":
            # diagnostic: drop compiled-program references (their
            # device executables hold HBM) before the fetch
            import gc
            import jax
            jax.clear_caches()
            gc.collect()
            self.log(f"cleared program caches "
                     f"(t={time.perf_counter():.1f})")
        self._fetch_transcript(recs)
        self._recs = recs    # kept for diagnostics (transcript diff)
        # PT = wall clock of all prover dispatch + the transcript
        # materialization (reference prove_timer semantics: everything
        # the prover computes; the _timed per-method sums only measure
        # async dispatch overhead here)
        p.prove_time = time.perf_counter() - t0

        t1 = time.perf_counter()
        self._predicate_pass(recs)
        t2 = time.perf_counter()
        ok = self._replay(recs)
        t3 = time.perf_counter()
        self.vt = t3 - t2                      # reference "fast" VT
        self.vt_slow = (t2 - t1) + self.vt     # + predicate builds
        return ok

    def _prover_pass(self):
        """Drive every prover phase; return the transcript as device
        tensors (round-poly stacks, claims) plus the host-side draws."""
        C, p = self.C, self.p
        alpha, beta = 1, 0
        last = C.layers[C.size - 1]
        self.r_u[C.size] = self.tape.fields(last.bit_length)
        recs = {"vres": p.v_res_dev(self.r_u[C.size]), "layers": []}
        p.sumcheck_init_all(self.r_u[C.size])

        for i in range(C.size - 1, 0, -1):
            cur = C.layers[i]
            p.sumcheck_init(alpha, beta)
            self.r_u[i] = self.tape.fields(cur.max_bl_u)
            relu_rou = self.tape.field() \
                if cur.zero_start_id < cur.size else 1
            rec = {"i": i, "alpha": alpha, "beta": beta,
                   "relu_rou": relu_rou}
            if cur.ty == LayerType.DOT_PROD:
                p.sumcheck_dotprod_init_phase1()
                rec["polys1"] = p.run_rounds_cubic(self.r_u[i])
                rec["cu0"] = 0
                rec["cu1"], _ = p.dotprod_finalize1_dev(self.r_u[i])
            else:
                p.sumcheck_init_phase1(relu_rou)
                rec["polys1"] = p.run_rounds_quad(self.r_u[i])
                rec["cu0"], rec["cu1"] = p.finalize1_dev(self.r_u[i])
            if cur.need_phase2:
                self.r_v[i] = self.tape.fields(cur.max_bl_v)
                p.sumcheck_init_phase2()
                rec["polys2"] = p.run_rounds_quad(self.r_v[i])
                rec["cv0"], rec["cv1"] = p.finalize2_dev(self.r_v[i])
            # claim linkage draws (verifier.cpp:245-255)
            if cur.ty not in (LayerType.FFT, LayerType.IFFT):
                alpha = self.tape.field() \
                    if cur.bit_length_u[1] >= 0 else 0
                beta = self.tape.field() \
                    if cur.bit_length_v[1] >= 0 else 0
                rec["next_alpha"], rec["next_beta"] = alpha, beta
            recs["layers"].append(rec)
            p.release_gates(cur)     # big layers: free HBM gate copies
            p.release_val(i)         # layer value dead past its layer
            if os.environ.get("ZKCNN_TPU_STREAM_SYNC") == "1":
                # streaming mode: pull this layer's transcript pieces
                # to the host NOW, while the device still has
                # allocation headroom -- at vgg scale an end-of-pass
                # fetch finds none left (results/vgg11_r4_s15.log)
                self._rec_to_host(rec)
            if os.environ.get("ZKCNN_TPU_PROFILE") == "1":
                # sync profiling: block on this layer's full record so
                # the per-layer log line shows true device+dispatch time
                # (and failed async ops surface here, localized)
                import jax
                arrs = []
                for v in rec.values():
                    if isinstance(v, list):
                        arrs += [x for x in v if hasattr(x, "shape")]
                    elif hasattr(v, "shape"):
                        arrs.append(v)
                jax.block_until_ready(arrs)
            self.log(f"dispatch layer {i:3d} {cur.ty.name:9s} "
                     f"bl={cur.bit_length} (t={time.perf_counter():.1f})")

        # Liu input-consolidation phase (verifier.cpp:268-305)
        sig_u = self.tape.fields(C.size - 1)
        sig_v = self.tape.fields(C.size - 1)
        self.r_u[0] = self.tape.fields(C.layers[0].bit_length)
        recs["sig_u"], recs["sig_v"] = sig_u, sig_v
        p.sumcheck_liu_init(sig_u, sig_v)
        self.log(f"liu init dispatched (t={time.perf_counter():.1f})")
        recs["liu_polys"] = p.run_rounds_quad(self.r_u[0])
        recs["eval_in"] = p.liu_finalize_dev(self.r_u[0])
        if os.environ.get("ZKCNN_TPU_STREAM_SYNC") == "1":
            self._rec_to_host(recs)
        elif os.environ.get("ZKCNN_TPU_PROFILE") == "1":
            import jax
            jax.block_until_ready([recs["eval_in"], recs["vres"]]
                                  + recs["liu_polys"])
        self.log(f"liu dispatched (t={time.perf_counter():.1f})")
        return recs

    @staticmethod
    def _rec_to_host(rec):
        """Materialize a record's device arrays as host numpy in place
        (streaming-fetch mode; _fetch_transcript passes numpy rows
        through)."""
        for k, v in list(rec.items()):
            if isinstance(v, list) and v and hasattr(v[0], "shape"):
                rec[k] = [np.asarray(s) for s in v]
            elif hasattr(v, "shape"):
                rec[k] = np.asarray(v)

    @staticmethod
    def _tx_slots(recs):
        """The transcript's (container, key) slots in fetch order."""
        slots = [(recs, "vres")]
        for rec in recs["layers"]:
            slots += [(rec, "polys1"), (rec, "cu0"), (rec, "cu1")]
            if "polys2" in rec:
                slots += [(rec, "polys2"), (rec, "cv0"), (rec, "cv1")]
        slots += [(recs, "liu_polys"), (recs, "eval_in")]
        return slots

    def _fetch_transcript(self, recs):
        """ONE batched device->host transfer of the whole transcript;
        converts every slot to host ints / lists of int tuples in
        place."""
        slots = self._tx_slots(recs)
        stream = os.environ.get("ZKCNN_TPU_STREAM_SYNC") == "1"

        def to_row(s, shape):
            # streaming mode fetches per piece on the host: the big
            # device-side concatenate needs allocation headroom a
            # vgg-scale proof no longer has at this point.  Retry with
            # backoff: the tunnel runtime reclaims freed buffers
            # asynchronously, so a RESOURCE_EXHAUSTED d2h can succeed
            # moments later.
            if not stream:
                return jnp.reshape(s, shape)
            for attempt in range(6):
                try:
                    return np.asarray(s).reshape(shape)
                except Exception as e:
                    if attempt == 5 or "RESOURCE" not in str(e):
                        raise
                    import gc
                    gc.collect()
                    self.log(f"fetch retry {attempt + 1} after "
                             f"RESOURCE_EXHAUSTED")
                    time.sleep(10.0 * (attempt + 1))

        rows, metas = [], []
        for obj, key in slots:
            v = obj[key]
            if isinstance(v, int):
                metas.append(("int", None))
            elif isinstance(v, list):           # round-poly stacks
                shapes = [tuple(s.shape) for s in v]
                metas.append(("stacks", shapes))
                rows += [to_row(s, (-1, FR.n)) for s in v]
            else:                               # [n] scalar
                metas.append(("scalar", None))
                rows.append(to_row(v, (1, FR.n)))
        self.log(f"fetch: {len(rows)} transcript rows "
                 f"(t={time.perf_counter():.1f})")
        if os.environ.get("ZKCNN_TPU_MEMLOG") == "1":
            import jax
            import collections
            la = jax.live_arrays()
            tot = sum(a.size * a.dtype.itemsize for a in la)
            self.log(f"live arrays: {len(la)} = {tot >> 20}MB")
            by = collections.Counter()
            for a in la:
                by[(tuple(a.shape), str(a.dtype))] += \
                    a.size * a.dtype.itemsize
            for k, b in by.most_common(10):
                self.log(f"  {b >> 20}MB in {k}")
        if not rows:
            big = np.zeros((0, FR.n), np.uint32)
        elif stream:
            big = np.concatenate(rows)
        else:
            big = np.asarray(jnp.concatenate(rows, axis=0))
        self.log(f"fetch done (t={time.perf_counter():.1f})")
        ints = FR.unpack_mont_host(big)
        off = 0
        for (obj, key), (kind, shapes) in zip(slots, metas):
            if kind == "int":
                continue
            if kind == "scalar":
                obj[key] = ints[off]
                off += 1
            else:
                polys = []
                for (r, k, _) in shapes:
                    for j in range(r):
                        polys.append(tuple(ints[off + j * k:
                                                off + j * k + k]))
                    off += r * k
                obj[key] = polys
        # order-sensitive digest of the full prover transcript: the
        # 1-chip vs N-chip bit-exactness oracle (SURVEY.md section 7
        # step 7) and the seeded regression-test fingerprint
        import hashlib
        h = hashlib.sha256()
        for v in ints:
            h.update(v.to_bytes(32, "little"))
        self.transcript_digest = h.hexdigest()

    def _predicate_pass(self, recs):
        """The verifier's own beta/phi table builds + gate predicate
        contractions for every layer (reference betaInit/predicate
        phases) -- all dispatched async, one batched fetch."""
        for rec in recs["layers"]:
            i = rec["i"]
            self._beta_init_phase1(i, rec["alpha"], rec["beta"],
                                   self.r_u[i + 1], self.r_v[i + 1],
                                   rec["relu_rou"])
            self._predicate_phase1_dev(i)
            if "polys2" in rec:
                self._predicate_phase2_dev(i)
            rec["uni"] = list(self.uni_value)
            rec["bin"] = list(self.bin_value)
            self.p.release_gates(self.C.layers[i])
            if os.environ.get("ZKCNN_TPU_STREAM_SYNC") == "1":
                rec["uni"] = [v if isinstance(v, int) else np.asarray(v)
                              for v in rec["uni"]]
                rec["bin"] = [v if isinstance(v, int) else np.asarray(v)
                              for v in rec["bin"]]
            if os.environ.get("ZKCNN_TPU_PROFILE") == "1":
                import jax
                t0 = time.perf_counter()
                jax.block_until_ready([v for v in rec["uni"] + rec["bin"]
                                       if not isinstance(v, int)])
                self.log(f"predicate layer {i:3d} "
                         f"{self.C.layers[i].ty.name:9s} done "
                         f"(t={time.perf_counter():.1f})")

        # Liu gr = subset predicate at the bound points (verifier.cpp:
        # 307-333), accumulated on device
        C, p = self.C, self.p
        beta_g = beta_table(self.r_u[0], 1)
        gr = None
        for i in range(1, C.size):
            ly = C.layers[i]
            cache = p._ori_dev(ly)
            for bl, ori, rr, sig in (
                    (ly.bit_length_u[0], "ori_u", self.r_u[i],
                     recs["sig_u"][i - 1]),
                    (ly.bit_length_v[0], "ori_v", self.r_v[i],
                     recs["sig_v"][i - 1])):
                if bl < 0:
                    continue
                bu = beta_table(rr[:bl], sig)
                sz = "size_u" if ori == "ori_u" else "size_v"
                t = gr_term(beta_g, cache[ori], bu,
                            jnp.asarray(getattr(ly, sz)[0]))
                gr = t if gr is None else FR.add(gr, t)
        recs["gr"] = gr

        # one fetch for all predicate values
        slots = []
        for rec in recs["layers"]:
            for lst in (rec["uni"], rec["bin"]):
                for j, v in enumerate(lst):
                    if not isinstance(v, int):
                        slots.append((lst, j, v))
        stream = os.environ.get("ZKCNN_TPU_STREAM_SYNC") == "1"
        if stream:
            rows = [np.asarray(v).reshape(1, FR.n)
                    for (_, _, v) in slots]
            if recs["gr"] is not None:
                rows.append(np.asarray(recs["gr"]).reshape(1, FR.n))
            big = np.concatenate(rows) if rows \
                else np.zeros((0, FR.n), np.uint32)
        else:
            rows = [jnp.reshape(v, (1, FR.n)) for (_, _, v) in slots]
            if recs["gr"] is not None:
                rows.append(jnp.reshape(recs["gr"], (1, FR.n)))
            big = np.asarray(jnp.concatenate(rows, axis=0)) if rows \
                else np.zeros((0, FR.n), np.uint32)
        ints = FR.unpack_mont_host(big)
        for k, (lst, j, _) in enumerate(slots):
            lst[j] = ints[k]
        recs["gr"] = ints[len(slots)] if recs["gr"] is not None else 0

    def _replay(self, recs) -> bool:
        """Host replay of every protocol check (reference 'fast' VT)."""
        C, p = self.C, self.p
        previous_sum = recs["vres"]
        self.tape.absorb(previous_sum)
        for rec in recs["layers"]:
            i = rec["i"]
            cur = C.layers[i]
            t_layer = time.time()
            # ladder stacks are RMAX-padded: only the first R rows are
            # protocol rounds
            polys1 = rec["polys1"][: len(self.r_u[i])]
            if cur.ty == LayerType.DOT_PROD:
                p.account_cubic(polys1)
            ok, previous_sum = self._check_rounds(
                polys1, self.r_u[i], previous_sum,
                f"phase1 layer {i}")
            if not ok:
                return False
            self.final_claim_u0[i] = rec["cu0"]
            cu1 = rec["cu1"]
            cv1 = 0
            self.tape.absorb(rec["cu0"], cu1)
            if "polys2" in rec:
                ok, previous_sum = self._check_rounds(
                    rec["polys2"][: len(self.r_v[i])], self.r_v[i],
                    previous_sum, f"phase2 layer {i}")
                if not ok:
                    return False
                self.final_claim_v0[i] = rec["cv0"]
                cv1 = rec["cv1"]
                self.tape.absorb(rec["cv0"], cv1)
            self.uni_value = rec["uni"]
            self.bin_value = rec["bin"]
            test_value = self._get_final_value(
                rec["cu0"], cu1, self.final_claim_v0[i], cv1)
            if test_value != previous_sum:
                self.log(f"FAIL semifinal layer {i} ({cur.ty})")
                return False
            if cur.ty in (LayerType.FFT, LayerType.IFFT):
                previous_sum = cu1
            else:
                previous_sum = (rec["next_alpha"] * cu1
                                + rec["next_beta"] * cv1) % FR_P
            self.log(f"layer {i:3d} {cur.ty.name:9s} "
                     f"bl={cur.bit_length} ok "
                     f"({time.time() - t_layer:.2f}s)")

        # Liu phase checks (verifier.cpp:283-333)
        previous_sum = 0
        for i in range(1, C.size):
            if C.layers[i].bit_length_u[0] >= 0:
                previous_sum += recs["sig_u"][i - 1] \
                    * self.final_claim_u0[i]
            if C.layers[i].bit_length_v[0] >= 0:
                previous_sum += recs["sig_v"][i - 1] \
                    * self.final_claim_v0[i]
        previous_sum %= FR_P
        ok, previous_sum = self._check_rounds(
            recs["liu_polys"][: len(self.r_u[0])], self.r_u[0],
            previous_sum, "liu")
        if not ok:
            return False
        self.eval_in = recs["eval_in"]
        self.tape.absorb(self.eval_in)
        if self.eval_in * recs["gr"] % FR_P != previous_sum:
            self.log("FAIL liu semifinal")
            return False
        self.log("first layer (Liu) ok")
        return True

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
            if self.tape.interleaved:
                # Fiat-Shamir: r_j is drawn only AFTER round poly j is
                # absorbed (soundness); relu_rou precedes the phase (it
                # parameterizes the init) and depends on everything
                # absorbed so far.
                relu_rou = self.tape.field() \
                    if cur.zero_start_id < cur.size else 1
                self.r_u[i] = []
            else:
                # reference draw order (verifier.cpp:156-160)
                self.r_u[i] = self.tape.fields(cur.max_bl_u)
                relu_rou = self.tape.field() \
                    if cur.zero_start_id < cur.size else 1

            if cur.ty == LayerType.DOT_PROD:
                p.sumcheck_dotprod_init_phase1()
            else:
                p.sumcheck_init_phase1(relu_rou)

            prev_r = None
            for j in range(cur.max_bl_u):
                if cur.ty == LayerType.DOT_PROD:
                    poly = p.round_cubic(prev_r)
                else:
                    poly = p.round_quadratic(prev_r)
                self.tape.absorb(*poly)
                if self.tape.interleaved:
                    self.r_u[i].append(self.tape.field())
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
                if self.tape.interleaved:
                    self.r_v[i] = []
                else:
                    self.r_v[i] = self.tape.fields(cur.max_bl_v)
                p.sumcheck_init_phase2()
                prev_r = None
                for j in range(cur.max_bl_v):
                    poly = p.round_quadratic(prev_r)
                    self.tape.absorb(*poly)
                    if self.tape.interleaved:
                        self.r_v[i].append(self.tape.field())
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
            p.release_gates(cur)
            p.release_val(i)
            self.log(f"layer {i:3d} {cur.ty.name:9s} bl={cur.bit_length} "
                     f"ok ({time.time() - t_layer:.2f}s)")
        return True

    def verify_first_layer(self) -> bool:
        """Liu input-consolidation sumcheck (verifier.cpp:268-357)."""
        C, p = self.C, self.p
        cur = C.layers[0]
        sig_u = self.tape.fields(C.size - 1)
        sig_v = self.tape.fields(C.size - 1)
        self.r_u[0] = [] if self.tape.interleaved \
            else self.tape.fields(cur.bit_length)

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
        prev_r = None
        for j in range(cur.bit_length):
            poly = p.liu_round(prev_r)
            self.tape.absorb(*poly)
            if self.tape.interleaved:
                self.r_u[0].append(self.tape.field())
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
            cache = p._ori_dev(ly)
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
