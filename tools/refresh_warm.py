"""Regenerate a model's warm manifest + AOT export blobs from scratch.

The warm manifest (zkcnn_tpu/warm.py) is only as good as its last
recording: after kernel-code changes, stale entries re-trace programs
the proof never calls, and missing entries compile mid-proof (the
round-3 "warm" LeNet runs paid ~140 s of mid-dispatch compiles from
exactly this drift).  This tool runs a proof TWICE in one process
(trial 2 records any steady-state-only programs), REPLACES the
manifest with exactly the recorded set, and exports an AOT blob per
entry so fresh processes skip Python tracing entirely.

Usage: python tools/refresh_warm.py [lenet|ccnn|vgg11|vgg16] [pic_cnt]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    model = sys.argv[1] if len(sys.argv) > 1 else "lenet"
    pic = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    trials = int(os.environ.get("REFRESH_TRIALS", "2"))

    import jax
    from zkcnn_tpu import warm
    from zkcnn_tpu.nn import random_source
    from zkcnn_tpu.nn import models as zoo
    from zkcnn_tpu.nn.params import PoolType
    from zkcnn_tpu.gkr import Prover, Verifier, Tape

    backend = jax.default_backend()
    manifest = warm.manifest_path(f"{model}_pic{pic}_{backend}")
    print(f"refreshing {manifest} on {backend}", file=sys.stderr)

    t0 = time.time()
    ctor = {"lenet": lambda: zoo.lenet(32, 32, 1, pic, PoolType.MAX),
            "ccnn": lambda: zoo.ccnn(8, 8, pic, 1, PoolType.MAX),
            "vgg11": lambda: zoo.vgg11(32, 32, 3, pic, PoolType.MAX),
            "vgg16": lambda: zoo.vgg16(32, 32, 3, pic, PoolType.MAX)}
    nn = ctor[model]()
    C, vals = nn.create(random_source(17))
    print(f"witness build {time.time() - t0:.1f}s", file=sys.stderr)

    for trial in range(trials):
        p = Prover(C, vals)
        if trial == 0:
            p.prefetch()
        v = Verifier(p, C, Tape(b"bench-%s" % model.encode()))
        t0 = time.time()
        ok = v.verify()
        print(f"trial {trial}: ok={ok} total={time.time() - t0:.1f}s "
              f"PT={p.prove_time:.1f}s", file=sys.stderr)
        assert ok

    # replace (not merge): drift accumulates dead entries forever
    if os.path.exists(manifest):
        os.remove(manifest)
    n = warm.save_manifest(manifest)
    print(f"manifest: {n} entries", file=sys.stderr)
    t0 = time.time()
    written, failed = warm.save_blobs(manifest, verbose=True)
    print(f"blobs: {written} written, {failed} failed "
          f"in {time.time() - t0:.0f}s", file=sys.stderr)


if __name__ == "__main__":
    main()
