"""Big-run proof harness with postmortem capture.

The round-3 vgg11 attempt died leaving an EMPTY log -- no traceback, no
exit classification, nothing actionable.  This wrapper makes large
proofs diagnosable:

  * faulthandler is enabled and dumps all thread stacks every 10 min
    to stderr (a hang leaves its location behind);
  * every stage (witness build, per-layer dispatch, check) logs a
    timestamped line;
  * RSS high-water and exit status are printed at the end, and a
    SIGTERM/SIGINT leaves a final stack dump (OOM-kill SIGKILL cannot
    be caught -- but the RSS trace identifies it post-hoc).

Usage:
  python tools/prove.py MODEL [--pic-cnt N] [--pcs] [--seed N]
                              [--pool max|avg]
Log capture: redirect stdout/stderr to results/<name>.log.
"""

import argparse
import faulthandler
import os
import resource
import signal
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

T0 = time.time()


_DEV = []


def log(msg):
    rss = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss // 1024
    hbm = ""
    if _DEV:
        try:
            st = _DEV[0].memory_stats()
            hbm = f" hbm={st['bytes_in_use'] >> 20}MB"
        except Exception:
            pass
    try:
        from zkcnn_tpu import warm as _w
        hbm += f" progs={_w.recorded_count()}"
    except Exception:
        pass
    print(f"[{time.time() - T0:8.1f}s rss={rss}MB{hbm}] {msg}",
          file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("model",
                    choices=["lenet", "ccnn", "vgg11", "vgg16"])
    ap.add_argument("--pic-cnt", type=int, default=1)
    ap.add_argument("--pcs", action="store_true")
    ap.add_argument("--seed", type=int, default=17)
    ap.add_argument("--pool", choices=["max", "avg"], default="max")
    ap.add_argument("--no-warm", action="store_true")
    ap.add_argument("--save-warm", action="store_true",
                    help="replace the model's warm manifest + blobs "
                    "from this run's recording")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (local cache, no "
                    "remote compile)")
    ap.add_argument("--build-only", action="store_true",
                    help="stop after the witness build (use with "
                    "--snapshot to pre-build a checkpoint)")
    ap.add_argument("--snapshot", metavar="PATH",
                    help="witness/circuit checkpoint: load (C, vals) "
                    "from PATH if it exists, else build and save "
                    "there first.  A failed multi-hour vgg attempt "
                    "then restarts from the proof, not the build "
                    "(r4 spent 18 rebuilds; SURVEY section 5 "
                    "checkpoint/resume row)")
    args = ap.parse_args()

    faulthandler.enable()
    faulthandler.dump_traceback_later(600, repeat=True, file=sys.stderr)
    for sig in (signal.SIGTERM, signal.SIGINT):
        faulthandler.register(sig, file=sys.stderr, chain=True)

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
        from zkcnn_tpu import use_cpu_cache
        use_cpu_cache()
    from zkcnn_tpu import warm
    from zkcnn_tpu.nn import random_source
    from zkcnn_tpu.nn import models as zoo
    from zkcnn_tpu.nn.params import PoolType
    from zkcnn_tpu.gkr import Prover, Verifier, Tape
    from zkcnn_tpu.pcs import HyraxPCS

    backend = jax.default_backend()
    try:
        _DEV.append(jax.devices()[0])
    except Exception:
        pass
    pool = PoolType.MAX if args.pool == "max" else PoolType.AVG
    log(f"{args.model} pic_cnt={args.pic_cnt} pcs={args.pcs} "
        f"backend={backend} seed={args.seed}")

    manifest = warm.manifest_path(
        f"{args.model}_pic{args.pic_cnt}_{backend}")
    if not args.no_warm:
        t0 = time.time()
        loaded, skipped = warm.warm_from_manifest(manifest)
        log(f"warm: {loaded} loaded / {skipped} skipped "
            f"in {time.time() - t0:.0f}s (stats={warm.STATS})")

    t0 = time.time()
    ctor = {"lenet": lambda: zoo.lenet(32, 32, 1, args.pic_cnt, pool),
            "ccnn": lambda: zoo.ccnn(8, 8, args.pic_cnt, 1, pool),
            "vgg11": lambda: zoo.vgg11(32, 32, 3, args.pic_cnt, pool),
            "vgg16": lambda: zoo.vgg16(32, 32, 3, args.pic_cnt, pool)}
    nn = None
    if args.snapshot and os.path.exists(args.snapshot):
        import pickle
        with open(args.snapshot, "rb") as f:
            snap = pickle.load(f)
        C, vals = snap["C"], snap["vals"]
        log(f"snapshot loaded from {args.snapshot} "
            f"({time.time() - t0:.1f}s)")
    else:
        nn = ctor[args.model]()
        C, vals = nn.create(random_source(args.seed))
        if args.snapshot:
            import pickle
            import numpy as _np
            t1 = time.time()
            # strip per-layer device/host caches (unpicklable or
            # machine-local); vals to host numpy (device arrays
            # re-upload lazily on first use)
            for ly in C.layers:
                for attr in ("_dev_cache", "_ori_cache", "_host_cache"):
                    if hasattr(ly, attr):
                        delattr(ly, attr)
            host_vals = [None if v is None else _np.asarray(v)
                         for v in vals]
            tmp = args.snapshot + ".tmp"
            with open(tmp, "wb") as f:
                pickle.dump({"C": C, "vals": host_vals}, f, protocol=4)
            os.replace(tmp, args.snapshot)
            vals = host_vals
            log(f"snapshot saved to {args.snapshot} "
                f"({time.time() - t1:.1f}s)")
    log(f"witness build {time.time() - t0:.1f}s: "
        f"{C.size} layers, input size {C.layers[0].size} "
        f"(2^{C.layers[0].bit_length})")
    if args.build_only:
        log("build-only: stopping before the proof")
        return

    p = Prover(C, vals, own_vals=True)   # single proof: free layer
    if nn is not None:                   # values as the walk passes
        nn.vals = None
    t0 = time.time()
    p.prefetch()
    log(f"gate prefetch {time.time() - t0:.1f}s")

    pcs = HyraxPCS() if args.pcs else None
    v = Verifier(p, C, Tape(b"zkcnn-demo-%d" % args.seed), pcs=pcs,
                 log=log)
    t0 = time.time()
    ok = v.verify()
    total = time.time() - t0

    log(f"verify() -> {ok} in {total:.1f}s")
    pt, vt, vts = p.prove_time, v.vt, v.vt_slow
    ps_kb = p.proof_size / 1024.0
    row = (f"{args.model}, pcnt={args.pic_cnt}, "
           f"WS={C.layers[0].size}(2^{C.layers[0].bit_length}), "
           f"PT={pt:.4f}, VT={vt:.4f}, VT_slow={vts:.4f}, "
           f"PS={ps_kb:.4f}KB")
    if pcs is not None:
        row += (f", POLY_PT={pcs.pt:.4f}, POLY_VT={pcs.vt:.4f}, "
                f"POLY_PS={pcs.ps / 1024.0:.4f}KB")
    print(row, flush=True)
    print(f"transcript sha256 {v.transcript_digest}", flush=True)
    if not ok:
        print("Verification FAILED", flush=True)
        sys.exit(1)
    print("Verification pass", flush=True)

    if args.save_warm:
        if os.path.exists(manifest):
            os.remove(manifest)
        n = warm.save_manifest(manifest)
        log(f"manifest: {n} entries")
        t0 = time.time()
        w, f = warm.save_blobs(manifest)
        log(f"blobs: {w} written, {f} failed in {time.time() - t0:.0f}s")


if __name__ == "__main__":
    main()
