"""Multi-chip sharding for the prover's hot paths.

The reference is single-threaded (SURVEY.md section 2: no threads, no
devices, no communication of any kind), so every axis here is
greenfield TPU design:

  * **Hypercube (sumcheck) sharding** — each sumcheck operand lives on
    a 2^l hypercube.  We shard the HIGH index bits across devices, so
    the per-round pair fold (which touches index bit 0) stays local;
    only the 3 round-message coefficients cross chips, via `psum` over
    ICI.  A device's shard collapses to scalars after l - log2(D)
    rounds; the tail rounds run replicated (they are tiny).
  * **Batch sharding** — `pic_parallel` and the NTT slot dimension are
    embarrassingly parallel; `shard_map` with a 'data' axis.
  * **Gate sharding** — phase-init scatter-adds partition the gate
    list across devices; partial segment sums are `psum`-reduced.

All collectives are XLA collectives over a `jax.sharding.Mesh`; no
host-side communication.
"""



import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
try:
    from jax import shard_map  # jax >= 0.4.35 name
except ImportError:
    from jax.experimental.shard_map import shard_map

from ..field import FR
from ..field.ops import segment_sum_field
from ..mle import fold, coeffs_quadratic
from ..ntt import ntt


def make_mesh(n_devices: int, axis: str = "hyper") -> Mesh:
    devs = np.array(jax.devices()[:n_devices])
    return Mesh(devs.reshape(n_devices), (axis,))


def sharded_fold_coeffs(mesh: Mesh, axis: str = "hyper"):
    """Returns a jitted f(A, V, r_pack) -> (c0, c1, c2, A', V') where A,
    V are [N, n] sharded on high index bits (leading array dim after a
    [D, N/D] reshape).  Fold is local; coefficients psum over `axis`."""

    def step(A, V, r):
        # A, V: local shards [N/D, n]; pairs are local (bit 0 is local)
        c0, c1, c2 = coeffs_quadratic(A, V)
        # exact cross-chip reduction: sum the Montgomery residues as
        # wide integers, then one reduction. psum on uint32 limbs can
        # overflow only if > 2^16 devices; reduce via FR.sum of the
        # all-gathered per-device coefficients instead.
        parts = jax.lax.all_gather(jnp.stack([c0, c1, c2]), axis)  # [D,3,n]
        tot = FR.sum(parts, axis=0)                                # [3, n]
        return tot[0], tot[1], tot[2], fold(A, r), fold(V, r)

    f = shard_map(step, mesh=mesh,
                  in_specs=(P(axis, None), P(axis, None), P(None)),
                  out_specs=(P(None), P(None), P(None),
                             P(axis, None), P(axis, None)),
                  check_vma=False)
    return jax.jit(f)


def sharded_ntt(mesh: Mesh, logn: int, axis: str = "data"):
    """Batch-sharded NTT: slots are independent transforms (the conv
    witness pipeline is a large batch of per-(pic, channel) slots)."""

    def step(x):
        return ntt(x, logn)

    f = shard_map(step, mesh=mesh, in_specs=(P(axis, None, None),),
                  out_specs=P(axis, None, None))
    return jax.jit(f)


def sharded_segment_sum(mesh: Mesh, num_segments: int, axis: str = "hyper"):
    """Gate-parallel scatter-add: gates partitioned across devices,
    per-device exact modular segment sums, then a cross-chip exact
    modular tree (all_gather + FR.sum)."""

    def step(vals, segs):
        part = segment_sum_field(vals, segs, num_segments)   # [S, n]
        parts = jax.lax.all_gather(part, axis)               # [D, S, n]
        return FR.sum(parts, axis=0)

    f = shard_map(step, mesh=mesh,
                  in_specs=(P(axis, None), P(axis)),
                  out_specs=P(None, None), check_vma=False)
    return jax.jit(f)


def sharded_dot(mesh: Mesh, axis: str = "hyper"):
    """Cross-chip exact inner product of Montgomery vectors."""

    def step(a, b):
        part = FR.dot_mont(a, b)
        parts = jax.lax.all_gather(part, axis)
        return FR.sum(parts, axis=0)

    f = shard_map(step, mesh=mesh,
                  in_specs=(P(axis, None), P(axis, None)),
                  out_specs=P(None), check_vma=False)
    return jax.jit(f)
