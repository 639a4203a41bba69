"""Regenerate the pinned 1-chip transcript digests in __graft_entry__.py.

Run after any change that legitimately alters the protocol transcript
(tape draw order, round-message encoding, model/builder changes):

    python tools/pin_dryrun_digest.py

Prints the new PINNED_1CHIP dict; paste it into __graft_entry__.py.
The 1-chip == N-chip equality itself stays covered live by
tests/test_parallel.py::test_sharded_proof_transcript_equality; the
pins only spare the driver dryrun the second full compile storm
(XLA:CPU persistent-cache AOT entries never reload in this jaxlib).
"""

import os
import sys
import time

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["PALLAS_AXON_REMOTE_COMPILE"] = "0"
os.environ.setdefault("ZKCNN_TPU_FORCE_FUSED", "0")

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from zkcnn_tpu import use_cpu_cache  # noqa: E402

use_cpu_cache()

from zkcnn_tpu.nn import random_source  # noqa: E402
from zkcnn_tpu.gkr import Prover, Verifier, Tape  # noqa: E402
from zkcnn_tpu.pcs import HyraxPCS  # noqa: E402
from __graft_entry__ import _dryrun_models  # noqa: E402


def main():
    print("PINNED_1CHIP = {")
    kinds = set()
    for name, build in _dryrun_models():
        t0 = time.time()
        nn = build()
        C, vals = nn.create(random_source(24))
        kinds |= {l.ty.name for l in C.layers}
        p = Prover(C, vals)
        v = Verifier(p, C, Tape(b"dryrun-" + name.encode()),
                     pcs=HyraxPCS(mode="sqrt"))
        ok = v.verify()
        assert ok, f"1-chip {name} proof failed"
        print(f'    "{name}": {{"digest": "{v.transcript_digest}",'
              f'\n{" " * 16}"proof_size": {p.proof_size}}},'
              f'  # {time.time() - t0:.0f}s', flush=True)
    print("}")
    print(f"# layer kinds covered: {sorted(kinds)}", flush=True)


if __name__ == "__main__":
    main()
