"""Benchmark entry: prints JSON lines for the driver (last line wins).

Headline metric: END-TO-END GKR prover seconds for a full LeNet5
(pic_cnt=1) proof -- the metric BASELINE.json names ("prover seconds
per proof") -- against the MEASURED single-thread C++ reference
baseline on this machine (BASELINE.md: PT = 2.26 s, built from the
unmodified reference sources + a from-scratch stand-in for its absent
hyrax submodule; log baseline/results_lenet_pic1.log).

vs_baseline = baseline_PT / our_PT (>1 means faster than the C++
single-thread reference).

Output protocol (rounds 2-3 timed out before printing anything, so):
each stage prints one honestly-labelled JSON line the moment it
completes, weakest metric first -- if the driver's budget lands
mid-run, the last completed line is still a valid measurement.

  1. (~1 min)  steady-state sumcheck round-kernel throughput
     (field-muls/s on this chip vs an estimated 1e7/s for
     single-thread mcl -- the per-chip speed-of-light surface).
  2. LeNet trial 1: full proof in a fresh process, after the
     AOT-blob manifest warm (includes residual program loads).
  3. LeNet trial 2: steady-state serving PT (resident programs).

Cold-process latency note: a fresh process pays a program load for
every distinct compiled program.  The checked-in manifest
(warm/lenet_pic1_tpu.jsonl) lists the proof's full program set; local
AOT blobs (warm/blobs/, built by tools/refresh_warm.py, gitignored)
let the warm pool skip Python tracing for each of them.
"""

import json
import sys
import time

BASELINE_PT = 2.26       # measured C++ single-thread (BASELINE.md)
BASELINE_POLY_PT = 85.6  # measured C++ Hyrax stub (schoolbook MSM --
                         # qualitative only; BASELINE.md)
MCL_MULS_EST = 1e7       # est. single-thread mcl field-muls/s


def say(obj):
    print(json.dumps(obj), flush=True)


def log(msg):
    print(f"[bench {time.time() - T0:7.1f}s] {msg}", file=sys.stderr,
          flush=True)


T0 = time.time()


def round_kernel_bench():
    """Steady-state fused sumcheck round throughput at 2^20 rows."""
    import jax.numpy as jnp
    from zkcnn_tpu.field import FR
    from zkcnn_tpu.gkr.fused import (_quad_ladder, _pallas_version,
                                     pack_challenges, LSTEP)
    import numpy as np
    k = 20
    m = 1 << k
    pv = _pallas_version()
    # real random operands: broadcast/constant inputs let XLA fold the
    # contraction away and report fantasy numbers
    rng = np.random.default_rng(7)
    A = jnp.asarray(rng.integers(0, 1 << 16, (m, FR.n), np.uint32))
    V = jnp.asarray(rng.integers(0, 1 << 16, (m, FR.n), np.uint32))
    rs = pack_challenges([int.from_bytes(rng.bytes(31), "little")
                          for _ in range(LSTEP)])
    fn = _quad_ladder(k, pv)
    d, A1, V1 = fn(A, V, rs)          # compile + first run
    import jax
    jax.block_until_ready(d)
    t0 = time.time()
    reps = 8
    for _ in range(reps):
        d, a, v = fn(A, V, rs)
    jax.block_until_ready(d)
    dt = time.time() - t0
    # per ladder call: LSTEP rounds; round j at size m/2^j does ~6
    # field muls per pair-entry (2 dot-mults + interpolate + fold on
    # A and V) -- count 3 muls per element per round (conservative,
    # matches the r1 accounting)
    elems = sum(m >> j for j in range(LSTEP))
    muls = 3 * elems * reps
    return muls / dt


def _probe_backend(timeout_s: int = 300) -> bool:
    """The axon tunnel can hang PJRT init indefinitely when the TPU
    lease is unavailable (observed r5: >9 min with zero progress).
    Probe device init in a SUBPROCESS with a timeout so a dead tunnel
    produces an honest bench line instead of a driver rc=124."""
    import subprocess
    code = ("import jax, numpy, jax.numpy as jnp;"
            "assert jax.default_backend() == 'tpu';"
            "numpy.asarray(jnp.ones((4,), jnp.uint32) + 1)")
    try:
        r = subprocess.run(["python", "-c", code], timeout=timeout_s,
                           capture_output=True)
        return r.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def main():
    if not _probe_backend():
        say({"metric": "tpu_unreachable", "value": 0, "unit": "",
             "vs_baseline": 0,
             "note": "axon TPU tunnel did not answer a device probe "
                     "within 300s (PJRT init hang); benchmark cannot "
                     "run on this host right now -- see r4 numbers "
                     "(BENCH_r04.json) for the last healthy "
                     "measurement"})
        return
    import jax
    from zkcnn_tpu import warm
    from zkcnn_tpu.nn import random_source
    from zkcnn_tpu.nn.models import lenet
    from zkcnn_tpu.nn.params import PoolType
    from zkcnn_tpu.gkr import Prover, Verifier, Tape

    backend = jax.default_backend()

    # stage 1: round-kernel throughput (fast, prints within ~1 min)
    try:
        mps = round_kernel_bench()
        say({"metric": "sumcheck_round_field_muls_per_s",
             "value": round(mps / 1e6, 1), "unit": "Mmuls/s",
             "vs_baseline": round(mps / MCL_MULS_EST, 1),
             "note": f"steady-state fused quad round kernel at 2^20 "
                     f"rows on {backend}; baseline = est. 1e7 muls/s "
                     f"single-thread mcl; stages 2-3 (full LeNet "
                     f"proofs) follow"})
        log(f"round kernel: {mps/1e6:.1f} Mmuls/s")
    except Exception as e:
        log(f"round-kernel stage failed: {e}")

    manifest = warm.manifest_path(f"lenet_pic1_{backend}")
    t0 = time.time()
    loaded, skipped = warm.warm_from_manifest(manifest)
    warm_s = time.time() - t0
    log(f"warm: {loaded} loaded / {skipped} skipped in {warm_s:.0f}s")

    t0 = time.time()
    nn = lenet(32, 32, 1, 1, PoolType.MAX)
    C, vals = nn.create(random_source(17))
    build_s = time.time() - t0
    log(f"witness build {build_s:.0f}s")

    results = []
    ok = True
    prefetch_s = 0.0
    for trial in range(2):
        p = Prover(C, vals)
        v = Verifier(p, C, Tape(b"bench-lenet"))
        if trial == 0:
            t0 = time.time()
            p.prefetch()     # stage gate tensors (cached on C.layers)
            prefetch_s = time.time() - t0
        t0 = time.time()
        ok = v.verify() and ok
        total = time.time() - t0
        results.append((p.prove_time, v.vt, v.vt_slow, total))
        pt = results[-1][0]
        stage = ("steady-state PT (2nd in-process run)" if trial else
                 "trial-1 PT in a fresh process (includes residual "
                 "program loads)")
        say({
            "metric": "lenet_pic1_prover_seconds",
            "value": round(pt, 3),
            "unit": "s",
            "vs_baseline": round(BASELINE_PT / pt, 3),
            "note": f"full LeNet5 GKR proof on {backend}, "
                    f"verified={ok}; {stage}; trial-1 "
                    f"PT={results[0][0]:.1f}s after {warm_s:.0f}s "
                    f"manifest warm, VT_fast={results[-1][1]:.3f}s "
                    f"VT_slow={results[-1][2]:.2f}s, witness build "
                    f"{build_s:.0f}s, gate prefetch {prefetch_s:.0f}s; "
                    f"baseline = measured C++ reference single-thread "
                    f"PT 2.26s (BASELINE.md)",
        })

    # stage 4 (headline): FULL proof including the Hyrax PCS -- the
    # reference's verify() is commit + GKR + opening, inseparably
    # (reference src/verifier.cpp:118-129,359-373).  IPA mode (the
    # submodule's construction, README.md:94).  vs_baseline compares
    # TOT_PT against the measured C++ TOT (2.26 GKR + 85.6 Hyrax;
    # BASELINE.md notes the baseline's 85.6 s is a schoolbook-MSM
    # stub, so the PCS share of the ratio is qualitative).
    try:
        from zkcnn_tpu.pcs import HyraxPCS
        p = Prover(C, vals)
        pcs = HyraxPCS()                      # IPA (default)
        v = Verifier(p, C, Tape(b"bench-lenet"), pcs=pcs)
        t0 = time.time()
        okf = v.verify()
        tot_wall = time.time() - t0
        tot_pt = p.prove_time + pcs.pt
        say({
            "metric": "lenet_pic1_full_proof_seconds_incl_pcs",
            "value": round(tot_pt, 3),
            "unit": "s",
            "vs_baseline": round((BASELINE_PT + BASELINE_POLY_PT)
                                 / tot_pt, 3),
            "note": f"TOT_PT = GKR PT {p.prove_time:.2f}s + Hyrax IPA "
                    f"POLY_PT {pcs.pt:.2f}s on {backend}, "
                    f"verified={okf} (steady-state, 3rd in-process "
                    f"run); POLY_VT={pcs.vt:.2f}s POLY_PS="
                    f"{pcs.ps / 1024:.1f}KB GKR PS="
                    f"{p.proof_size / 1024:.1f}KB wall={tot_wall:.1f}s; "
                    f"baseline = measured C++ TOT_PT 87.9s "
                    f"(2.26 GKR + 85.6 stub-MSM Hyrax, BASELINE.md -- "
                    f"PCS share qualitative)",
        })
        log(f"full proof incl PCS: {tot_pt:.2f}s (ok={okf})")
    except Exception as e:
        import traceback
        traceback.print_exc(file=sys.stderr)
        log(f"PCS stage failed: {e}")
    # refresh warm assets (best-effort; blobs are local artifacts)
    try:
        warm.save_manifest(manifest)
        warm.save_blobs(manifest)
    except Exception as e:
        log(f"warm asset save skipped: {e}")


if __name__ == "__main__":
    main()
