"""Protocol-level mesh context: makes the WHOLE GKR prover/verifier
run sharded over a `jax.sharding.Mesh` with no change to the math.

Design (TPU-idiomatic, GSPMD): every sumcheck operand is a [2^l, n]
limb tensor.  We shard the leading dim -- contiguous blocks = the HIGH
index bits -- so the per-round pair fold (index bit 0, adjacent
elements) is shard-local, and the round-message coefficient dots
reduce across chips via XLA-inserted psum over ICI.  Witness tensors
(`Prover.val`), gate tensors and phase operands get placed with this
sharding; every existing jitted kernel then partitions automatically
(GSPMD), so the N-chip transcript is bit-identical to the 1-chip one
by construction -- verified by tests/test_parallel.py and the
dryrun_multichip entry.

The reference has no parallelism of any kind (SURVEY.md section 2);
this axis is greenfield TPU design per the build plan (SURVEY.md
section 7 step 7).

The hand-written Pallas round kernels are single-device programs; when
a mesh is active the fused runners route to the pure-XLA kernels
(fused.py checks `active_mesh()`), which GSPMD partitions.  shard_map
wrappers for the Pallas kernels are the tracked follow-up
(parallel/sharding.py has the per-kernel prototypes).
"""

from contextlib import contextmanager
from typing import Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_MESH: Optional[Mesh] = None
HYPER_AXIS = "hyper"


def active_mesh() -> Optional[Mesh]:
    return _MESH


@contextmanager
def use_mesh(mesh: Optional[Mesh]):
    """Activate a device mesh for every Prover/Verifier constructed
    inside the context."""
    global _MESH
    prev = _MESH
    _MESH = mesh
    try:
        yield
    finally:
        _MESH = prev


def shard_rows(x):
    """Place a [N, ...] tensor with its leading dim sharded over the
    mesh's hyper axis (replicate when N does not divide: the tail
    rounds of a sumcheck are tiny and run replicated anyway)."""
    mesh = _MESH
    if mesh is None:
        return x
    d = mesh.devices.size
    if x.ndim == 0 or x.shape[0] % d != 0 or x.shape[0] < 2 * d:
        return jax.device_put(x, NamedSharding(mesh, P()))
    spec = P(HYPER_AXIS, *([None] * (x.ndim - 1)))
    return jax.device_put(x, NamedSharding(mesh, spec))


def replicate(x):
    mesh = _MESH
    if mesh is None:
        return x
    return jax.device_put(x, NamedSharding(mesh, P()))
