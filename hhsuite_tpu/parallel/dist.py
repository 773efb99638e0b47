"""Multi-device distribution: template-sharded search over a device mesh.

TPU-native replacement for the reference's OpenMP/MPI scale-out
(src/hhblits_omp.cpp, src/hhblits_mpi.cpp + lib/ffindex/src/mpq): instead
of a master/worker queue over query ranges, the template-batch axis is
sharded over a `jax.sharding.Mesh` ("db" axis) with `shard_map`; each
device scores its shard with the wavefront Viterbi kernel and the global
top-k hitlist is merged with collectives (all_gather over ICI).  A second
mesh axis ("q") carries query parallelism (the hhblits_omp equivalent).
"""

from __future__ import annotations

import functools
from typing import Optional

import numpy as np


def make_mesh(n_devices: Optional[int] = None, q_axis: int = 1):
    """A (q, db) mesh over available devices."""
    import jax
    from jax.sharding import Mesh

    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    n = len(devs)
    assert n % q_axis == 0
    arr = np.array(devs).reshape(q_axis, n // q_axis)
    return Mesh(arr, axis_names=("q", "db"))


def sharded_viterbi_topk(mesh, qp, qtr, tp, ttr, t_L, shift: float,
                         k: int = 8, local: bool = True):
    """Score a template batch sharded over the "db" mesh axis; return the
    global top-k (scores, indices) merged via collectives.

    tp/ttr/t_L lead with the template axis, which must be divisible by
    the mesh's total device count.
    """
    import jax
    import jax.numpy as jnp
    from jax.experimental.shard_map import shard_map
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ..ops.viterbi import viterbi_batch

    nd = mesh.devices.size
    B = tp.shape[0]
    assert B % nd == 0, f"template batch {B} not divisible by {nd} devices"
    # the Pallas lanes kernel runs per shard on TPU; the lax.scan
    # kernel keeps the step portable (CPU dry-runs of the mesh path)
    use_lanes = (local
                 and all(d.platform == "tpu"
                         for d in mesh.devices.reshape(-1)))

    spec_t = P(("q", "db"))

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(), P(), spec_t, spec_t, spec_t),
        out_specs=(P(), P()),
        check_rep=False)
    def step(qp_, qtr_, tp_, ttr_, tL_):
        Bs = tp_.shape[0]
        if use_lanes:
            # per-device Pallas scoring sweep (the production kernel)
            from ..ops.viterbi_lanes import viterbi_score_lanes

            score = viterbi_score_lanes(qp_, qtr_, tp_, ttr_, tL_,
                                        jnp.float32(shift))
        else:
            co = jnp.zeros((Bs, qp_.shape[0] - 1, tp_.shape[1] - 1),
                           dtype=bool)
            score, i2, j2, _bt = viterbi_batch(
                qp_, qtr_, tp_, ttr_, co, tL_, shift, 0.0, 0.0, 0.0,
                local=local, need_bt=False)
        # global merge: all_gather shard scores over both axes (ICI)
        alls = jax.lax.all_gather(score, "db", axis=0, tiled=True)
        alls = jax.lax.all_gather(alls, "q", axis=0, tiled=True)
        top, idx = jax.lax.top_k(alls, k)
        return top, idx

    return step(qp, qtr, tp, ttr, t_L)


def sharded_search_step(mesh, qp, qtr, tp, ttr, t_L, shift: float = -0.03,
                        k: int = 8):
    """Jitted end-to-end distributed scoring step (the unit the driver
    dry-runs across virtual devices)."""
    import jax

    fn = jax.jit(functools.partial(sharded_viterbi_topk, mesh),
                 static_argnames=("k", "local"))
    return fn(qp, qtr, tp, ttr, t_L, shift, k=k)
