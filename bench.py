"""Benchmark entry: prints ONE JSON line for the driver.

Round-1 metric: sumcheck field-mul throughput per chip — the per-chip
"speed of light" surface that BASELINE.json names
("field-muls/sec/chip in sumcheck").  We time the fused sumcheck round
kernel (round-message coefficients + fold) on a 2^20 hypercube, which
is the prover's hot loop for every layer of every model.

vs_baseline uses a 1e7 muls/sec single-thread CPU estimate for the
reference's mcl Fr multiply (the reference itself cannot be built:
its hyrax submodule and demo data are absent upstream — BASELINE.md).
"""

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from zkcnn_tpu.field import FR
    from zkcnn_tpu.mle import fold, coeffs_quadratic

    logn = 20
    N = 1 << logn
    rng = np.random.default_rng(0)
    A = jnp.asarray(rng.integers(0, 1 << 16, (N, FR.n), dtype=np.uint32))
    V = jnp.asarray(rng.integers(0, 1 << 16, (N, FR.n), dtype=np.uint32))
    r = jnp.asarray(FR.to_mont_host(12345678901234567890))

    kernel = "xla"
    try:
        if jax.default_backend() == "tpu":
            from zkcnn_tpu.field.pallas_round2 import round_step2, to_red
            A = to_red(A)
            V = to_red(V)

            def round_step(A, V, r):
                return round_step2(A, V, r)
            kernel = "pallas-v2"
    except Exception:
        pass
    if kernel == "xla":
        @jax.jit
        def round_step(A, V, r):
            c0, c1, c2 = coeffs_quadratic(A, V)
            return c0, c1, c2, fold(A, r), fold(V, r)

    # warm up / compile
    out = round_step(A, V, r)
    jax.block_until_ready(out)

    iters = 10
    t0 = time.time()
    for _ in range(iters):
        out = round_step(A, V, r)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / iters

    # field-mul accounting per round on N entries:
    #   coeffs: 3 pair-dot products over N/2 pairs  -> 2 N mul-equivalents
    #   fold:   2 * N/2 muls                        -> N
    muls = 3 * N
    rate = muls / dt
    baseline = 1.0e7
    print(json.dumps({
        "metric": "sumcheck_field_muls_per_sec_per_chip",
        "value": round(rate, 1),
        "unit": "muls/s",
        "vs_baseline": round(rate / baseline, 3),
        "note": f"fused sumcheck round ({kernel} kernel: coeffs+fold) on "
                "2^20 hypercube; baseline = 1e7 muls/s est. single-thread "
                "mcl (reference unbuildable: hyrax submodule + data "
                "absent)",
    }))


if __name__ == "__main__":
    main()
