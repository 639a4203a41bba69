"""Warm-manifest record/replay (zkcnn_tpu/warm.py).

The manifest is a latency device, not a correctness one -- these tests
pin the contract bench.py and the CLI rely on: every kernel call a
proof makes is recorded with a replayable signature, save/load round
trips, and replay actually first-calls the programs (so a fresh
process's serial dispatch path hits loaded executables).
"""

import json
import os

import numpy as np
import pytest

from zkcnn_tpu import warm
from zkcnn_tpu.field import FR


@pytest.mark.heavy
def test_record_save_replay(tmp_path):
    from zkcnn_tpu.mle import beta_table

    before = warm.recorded_count()
    beta_table([3, 5, 7], 11)              # records its kernel calls
    x = FR.from_int64(np.arange(8))
    FR.mul(x, x)
    assert warm.recorded_count() > 0

    path = str(tmp_path / "m.jsonl")
    n = warm.save_manifest(path)
    assert n >= warm.recorded_count()

    loaded, skipped = warm.warm_from_manifest(path)
    # second replay in the same process is a no-op (all warmed)
    again = warm.warm_from_manifest(path)
    assert again == (0, 0)


def test_method_static_self_roundtrips(tmp_path):
    """Instance methods jitted with static self (SignedView) must
    record a resolvable token, not an object repr."""
    from zkcnn_tpu.field.ops import SIGNED_FR

    x = FR.from_int64(np.array([5, -7]))
    neg, hi, lo = SIGNED_FR.to_hilo(x)
    assert list(np.asarray(neg)) == [False, True]
    assert list(np.asarray(lo)) == [5, 7]

    path = str(tmp_path / "m.jsonl")
    warm.save_manifest(path)
    with open(path) as fh:
        entries = [json.loads(ln) for ln in fh]
    tok_entries = [e for e in entries if "SignedView" in e["f"]]
    assert tok_entries, "SignedView method calls not recorded"
    for e in tok_entries:
        assert e["sig"][0] == ["s", {"tok": "SIGNED_FR"}]


def test_factory_programs_resolve(tmp_path):
    """lru-cached factory programs (the ladder kernels) replay through
    the registered factory."""
    import jax.numpy as jnp
    from zkcnn_tpu.gkr.fused import _quad_tail
    from zkcnn_tpu.gkr.fused import pack_challenges

    A = FR.from_int64(np.arange(4))
    V = FR.from_int64(np.arange(4, 8))
    rs = pack_challenges([3, 5])
    _quad_tail(2)(A, V, rs)

    path = str(tmp_path / "m.jsonl")
    warm.save_manifest(path)
    with open(path) as fh:
        entries = [json.loads(ln) for ln in fh]
    fac = [e for e in entries if e["f"] == "gkr.fused._quad_tail"]
    assert fac and fac[0]["fa"] == [2]
    loaded, skipped = warm.warm_from_manifest(path)
    assert skipped == 0, f"{skipped} manifest entries failed to replay"


def test_unreplayable_entries_are_skipped(tmp_path):
    path = str(tmp_path / "m.jsonl")
    with open(path, "w") as fh:
        fh.write(json.dumps({"f": "no.such.module.fn", "fa": [],
                             "sig": [], "kw": {}}) + "\n")
    loaded, skipped = warm.warm_from_manifest(path)
    assert (loaded, skipped) == (0, 1)
