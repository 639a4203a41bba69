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


def stage_sharded_ntt(mesh: Mesh, logn: int, inverse: bool = False,
                      axis: str = "hyper"):
    """NTT sharded WITHIN one transform: butterfly stages split into a
    local group and a cross-device group with one all_to_all transpose
    between them (SURVEY.md section 2 parallelism inventory; the
    reference's serial recursion is src/utils.cpp:105-145).

    Layout: rows sharded on the HIGH index bits (device d holds
    contiguous rows [d*L, (d+1)*L), L = N/D).  With bit-reversed-input
    DIT, stages with block size <= L pair rows inside one shard and run
    locally with the ordinary twiddle slices.  The remaining log2(D)
    stages pair rows across shards; instead of exchanging per stage,
    ONE all_to_all transposes to a j-sharded layout where the whole
    d-axis is local (each device then holds rows e*L + d'*M + m for all
    e), the cross stages run locally with gathered twiddles
    tw[((e mod 2^(sl-1))*L + j) * (N >> s)], and a second all_to_all
    transposes back.  Every butterfly executes the same FR ops on the
    same operands as the batched ntt(), so the result is bit-identical.

    Requires N >= D^2 (the transpose needs L divisible by D).
    Returns a jitted f(x [batch, N, n]) -> [batch, N, n].
    """
    from ..ntt.ntt import _plan
    D = mesh.devices.size
    logD = D.bit_length() - 1
    assert (1 << logD) == D, "device count must be a power of two"
    N = 1 << logn
    L = N >> logD
    M = L // D
    assert M >= 1, "stage-sharded NTT needs N >= D^2"
    logL = logn - logD
    rev, tw_np = _plan(logn, inverse)
    rev = jnp.asarray(rev)
    tw = jnp.asarray(tw_np)             # [N/2, n] Montgomery
    from ..field.params import FR_P
    inv_n = jnp.asarray(np.asarray(
        FR.pack_mont_host([pow(N, FR_P - 2, FR_P)])).reshape(FR.n))

    def body(x):
        # x: [batch, L, n] = rows d*L + j of the bit-reversed input
        b = x.shape[0]
        for s in range(1, logL + 1):
            half = 1 << (s - 1)
            stride = N >> s
            v = x.reshape(b, L >> s, 2, half, FR.n)
            u, w = v[:, :, 0], v[:, :, 1]
            t = FR.mul(w, tw[::stride][None, None])
            x = jnp.stack([FR.add(u, t), FR.sub(u, t)], axis=2) \
                .reshape(b, L, FR.n)
        # transpose: device d' gathers rows e*L + d'*M + m for all e
        z = x.reshape(b, D, M, FR.n)
        z = jax.lax.all_to_all(z, axis, split_axis=1, concat_axis=1)
        dp = jax.lax.axis_index(axis)
        j = dp * M + jnp.arange(M)                       # [M] global j
        for sl in range(1, logD + 1):
            s = logL + sl
            half = 1 << (sl - 1)
            v = z.reshape(b, D >> sl, 2, half, M, FR.n)
            u, w = v[:, :, 0], v[:, :, 1]
            # twiddle for pair (e_low=p, j): tw[(p*L + j) * (N >> s)]
            p = jnp.arange(half)
            idx = (p[:, None] * L + j[None, :]) * (N >> s)  # [half, M]
            t = FR.mul(w, tw[idx][None, None])
            z = jnp.stack([FR.add(u, t), FR.sub(u, t)], axis=2) \
                .reshape(b, D, M, FR.n)
        # transpose back to row sharding
        z = jax.lax.all_to_all(z, axis, split_axis=1, concat_axis=1)
        out = z.reshape(b, L, FR.n)
        if inverse:
            out = FR.mul(out, jnp.broadcast_to(inv_n, out.shape))
        return out

    f = shard_map(body, mesh=mesh,
                  in_specs=(P(None, axis, None),),
                  out_specs=P(None, axis, None), check_vma=False)
    jf = jax.jit(f)

    def run(x):
        # global bit-reversal outside the shard_map (one sharded gather)
        return jf(x[:, rev, :])

    return run


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


def sharded_msm(mesh: Mesh, axis: str = "hyper", nwin: int = None):
    """Window-partitioned fixed-base MSM across the mesh (SURVEY
    section 2 parallelism inventory: window/bucket-partitioned
    Pippenger with collective reduction).

    Device d computes the signed-digit windows k with k % D == d --
    each window is the gather + halving padd tree of
    pcs.msm._window_sum -- folds its own windows' radix weights
    locally (2^(8*delta) doubling gaps between its consecutive
    windows), and the per-device partial points reduce across chips
    with an all_gather + log-depth padd tree.  The result equals the
    serial Horner evaluation as a GROUP ELEMENT (Jacobian coordinates
    differ; every in-protocol consumer is representation-invariant:
    canonical affine encodings and points_equal).

    Returns f(table [129, N, 3, n], digits [R, 2N, nwin]) -> [R, 3, n].
    nwin defaults to the full 17 GLV half-windows; tests use fewer to
    keep the compiled graph small.
    """
    from ..pcs.msm import _window_sum, HALF_WINDOWS
    from ..pcs import curve
    D = mesh.devices.size
    if nwin is None:
        nwin = HALF_WINDOWS

    def body(table, digs):
        d = jax.lax.axis_index(axis)
        R = digs.shape[0]
        acc = curve.infinity((R,))
        started = jnp.zeros((), jnp.bool_)
        # walk ALL windows high->low so the doubling chain is uniform
        # across devices (static trip count; off-device windows are
        # skipped via a select)
        for k in range(nwin - 1, -1, -1):
            if k != nwin - 1:
                for _ in range(8):
                    acc = curve.pdouble(acc)
            mine = (k % D) == d
            w = _window_sum(table, digs[:, :, k])
            cand = jnp.where(started, curve.padd(acc, w), w)
            acc = jnp.where(mine, cand, acc)
            started = started | mine
        parts = jax.lax.all_gather(acc, axis)        # [D, R, 3, n]
        n = D
        while n > 1:
            parts = curve.padd(parts[0::2], parts[1::2])
            n >>= 1
        return parts[0]

    f = shard_map(body, mesh=mesh,
                  in_specs=(P(None, None, None, None),
                            P(None, None, None)),
                  out_specs=P(None, None, None), check_vma=False)
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
