"""Benchmark entry: prints ONE JSON line for the driver.

Round-2 metric: END-TO-END GKR prover seconds for a full LeNet5
(pic_cnt=1) proof -- the metric BASELINE.json names ("prover seconds
per proof") -- against the MEASURED single-thread C++ reference
baseline on this machine (BASELINE.md: PT = 2.26 s, built from the
unmodified reference sources + a from-scratch stand-in for its absent
hyrax submodule; log baseline/results_lenet_pic1.log).

vs_baseline = baseline_PT / our_PT (>1 means faster than the C++
single-thread reference).

The proof is timed twice in-process: the first run pays one-time
program acquisition over the TPU tunnel (~0.5 s per distinct program
even on persistent-cache hits), the second is the steady-state prover.
Both are reported; `value` is the steady-state PT, which is the
per-proof cost of a serving deployment (resident programs).
"""

import json
import time

import numpy as np


def main():
    import jax
    from zkcnn_tpu.nn import random_source
    from zkcnn_tpu.nn.models import lenet
    from zkcnn_tpu.nn.params import PoolType
    from zkcnn_tpu.gkr import Prover, Verifier, Tape

    backend = jax.default_backend()
    t0 = time.time()
    nn = lenet(32, 32, 1, 1, PoolType.MAX)
    C, vals = nn.create(random_source(17))
    build_s = time.time() - t0

    results = []
    ok = True
    for trial in range(2):
        p = Prover(C, vals)
        v = Verifier(p, C, Tape(b"bench-lenet"))
        t0 = time.time()
        ok = v.verify() and ok
        total = time.time() - t0
        results.append((p.prove_time, v.vt, v.vt_slow, total))

    pt = results[-1][0]
    baseline = 2.26          # measured C++ single-thread (BASELINE.md)
    print(json.dumps({
        "metric": "lenet_pic1_prover_seconds",
        "value": round(pt, 3),
        "unit": "s",
        "vs_baseline": round(baseline / pt, 3),
        "note": f"full LeNet5 GKR proof on {backend}, verified={ok}; "
                f"steady-state PT (2nd in-process run); first-run "
                f"PT={results[0][0]:.1f}s (one-time program loads), "
                f"VT_fast={results[-1][1]:.3f}s "
                f"VT_slow={results[-1][2]:.2f}s, witness build "
                f"{build_s:.0f}s; baseline = measured C++ reference "
                f"single-thread PT 2.26s (BASELINE.md)",
    }))


if __name__ == "__main__":
    main()
