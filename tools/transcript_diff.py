"""Element-by-element transcript diff vs the C++ reference prover.

The north star (SURVEY.md §7): given the SAME input data and the SAME
verifier tape, the reference prover and zkcnn_tpu must produce
bit-identical transcripts.  This tool runs both and diffs every
element:

  1. data: baseline/gen_data.py csv (deterministic, seed 24) -- read by
     the reference via ifstream>>double and by us via csv_source;
  2. tape: ZKCNN_TAPE_SEED env (the baseline stub's setByCSPRNG is
     SHA-512(seed || LE64(ctr)) mod p, byte-compatible with
     zkcnn_tpu.gkr.tape.Tape);
  3. C++ side: baseline/transcript_dump.cpp (drives the unmodified
     reference prover through the verifier schedule, one decimal per
     line);
  4. our side: the verifier's fetched transcript (gkr/verifier.py
     _tx_slots order), trimmed to protocol lengths.

Usage: python tools/transcript_diff.py [--build-dir DIR] [--pic-cnt N]
"""

import argparse
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SEED = b"zkcnn-tdiff"


def our_transcript(csv_path: str, pic_cnt: int):
    from zkcnn_tpu import warm
    from zkcnn_tpu.nn import csv_source
    from zkcnn_tpu.nn.models import lenet
    from zkcnn_tpu.nn.params import PoolType
    from zkcnn_tpu.gkr import Prover, Verifier, Tape
    import jax

    warm.warm_from_manifest(
        warm.manifest_path(f"lenet_pic{pic_cnt}_{jax.default_backend()}"))
    nn = lenet(32, 32, 1, pic_cnt, PoolType.MAX)
    C, vals = nn.create(csv_source(csv_path))
    p = Prover(C, vals)
    p.prefetch()
    tape = Tape(SEED)
    # mirror the generator draws (reference verifier.cpp:119-126): the
    # GKR transcript diff runs without the commitment, but the tape
    # consumption must match the reference's verify() exactly
    bl0 = C.layers[0].bit_length
    tape.fields(1 << (bl0 - (bl0 >> 1)))
    v = Verifier(p, C, tape)
    ok = v.verify()
    assert ok, "our proof failed to verify"

    out = []
    recs = v._recs
    out.append(recs["vres"])
    for rec in recs["layers"]:
        i = rec["i"]
        for poly in rec["polys1"][: len(v.r_u[i])]:
            out.extend(poly)
        out.extend([rec["cu0"], rec["cu1"]])
        if "polys2" in rec:
            for poly in rec["polys2"][: len(v.r_v[i])]:
                out.extend(poly)
            out.extend([rec["cv0"], rec["cv1"]])
    for poly in recs["liu_polys"][: len(v.r_u[0])]:
        out.extend(poly)
    out.append(recs["eval_in"])
    return out, C


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--build-dir", default="/tmp/baseline_build")
    ap.add_argument("--pic-cnt", type=int, default=1)
    ap.add_argument("--data-seed", type=int, default=24)
    args = ap.parse_args()

    csv_path = f"/tmp/tdiff_data_s{args.data_seed}.csv"
    if not os.path.exists(csv_path):
        subprocess.run([sys.executable,
                        os.path.join(REPO, "baseline", "gen_data.py"),
                        csv_path, "--seed", str(args.data_seed)],
                       check=True)

    dump_bin = os.path.join(args.build_dir, "transcript_dump")
    assert os.path.exists(dump_bin), \
        f"build first: cmake -S baseline -B {args.build_dir} && ninja"
    env = dict(os.environ, ZKCNN_TAPE_SEED=SEED.decode())
    t0 = time.time()
    ref = subprocess.run(
        [dump_bin, csv_path, csv_path, "/tmp/tdiff_pred.csv",
         str(args.pic_cnt)],
        env=env, capture_output=True, text=True, timeout=3600)
    assert ref.returncode == 0, ref.stderr[-2000:]
    ref_vals = [int(x) for x in ref.stdout.split()]
    print(f"reference transcript: {len(ref_vals)} elements "
          f"in {time.time() - t0:.1f}s", flush=True)

    t0 = time.time()
    ours, C = our_transcript(csv_path, args.pic_cnt)
    print(f"zkcnn_tpu transcript: {len(ours)} elements "
          f"in {time.time() - t0:.1f}s", flush=True)

    n = min(len(ref_vals), len(ours))
    mism = [k for k in range(n) if ref_vals[k] != ours[k]]
    if len(ref_vals) != len(ours):
        print(f"LENGTH MISMATCH: ref {len(ref_vals)} vs ours {len(ours)}")
    if mism:
        k = mism[0]
        print(f"MISMATCH: {len(mism)}/{n} elements differ; first at "
              f"index {k}:\n  ref  = {ref_vals[k]}\n  ours = {ours[k]}")
        sys.exit(1)
    if len(ref_vals) != len(ours):
        sys.exit(1)
    print(f"TRANSCRIPTS BIT-IDENTICAL: {n} field elements "
          f"(LeNet5 pic_cnt={args.pic_cnt}, data seed {args.data_seed}, "
          f"tape seed {SEED.decode()!r})")


if __name__ == "__main__":
    main()
