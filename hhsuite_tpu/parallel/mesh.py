"""Production multi-device execution: template-axis sharding over a mesh.

TPU-native replacement for the reference's scale-out drivers
(src/hhblits_mpi.cpp:160-228 MPQ query dealing, src/hhblits.cpp:1165-1175
multi-`-d` database sharding): the packed template batch — the axis the
reference fills with SIMD lanes and OpenMP threads — is sharded over a
`jax.sharding.Mesh` with `shard_map`.  Each device scores its template
shard with the same kernel the single-device path uses; per-template
results are independent, so gathering the sharded outputs reproduces the
single-device result bit for bit, which is the merged-hitlist semantics
of the reference's ffmerge_splits (src/hhblits_mpi.cpp:83-93) without a
filesystem round-trip.

The mesh is process-global state set by the CLI (`-mesh N` / all local
devices) or a test fixture; the engine consults `get_mesh()` at each
batched kernel dispatch.  With no mesh (or one device) every code path
is identical to round-1's single-device behavior.
"""

from __future__ import annotations

import threading
from contextlib import contextmanager
from typing import List, Optional, Sequence

import numpy as np

_ACTIVE_MESH = None                  # process-wide default (CLI -mesh)
_TLS = threading.local()             # per-thread override (use_mesh)

FLT_MAX = float(np.finfo(np.float32).max)


def make_mesh(n_devices: Optional[int] = None, q_axis: int = 1):
    """A (q, db) mesh over the first n local devices."""
    import jax
    from jax.sharding import Mesh

    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    n = len(devs)
    assert n % q_axis == 0
    arr = np.array(devs).reshape(q_axis, n // q_axis)
    return Mesh(arr, axis_names=("q", "db"))


def set_mesh(mesh) -> None:
    global _ACTIVE_MESH
    _ACTIVE_MESH = mesh


def get_mesh():
    """The active mesh, or None when single-device execution applies.

    A thread-local mesh (``use_mesh``) shadows the process default: the
    batch driver gives each worker thread its own device sub-mesh so
    concurrent queries run on disjoint devices (query parallelism, the
    hhblits_omp axis) while each query still shards its template batch
    over its sub-mesh (the hhblits_mpi/DB axis)."""
    mesh = getattr(_TLS, "mesh", None)
    if mesh is None:
        mesh = _ACTIVE_MESH
    if mesh is not None and mesh.devices.size > 1:
        return mesh
    return None


@contextmanager
def use_mesh(mesh):
    """Thread-locally activate a mesh (nestable, restores on exit)."""
    prev = getattr(_TLS, "mesh", None)
    _TLS.mesh = mesh
    try:
        yield mesh
    finally:
        _TLS.mesh = prev


class _SingleDeviceMesh:
    """Sentinel with .devices.size == 1: shadows the process-wide mesh
    inside a worker thread that was assigned exactly one device, making
    get_mesh() return None there (single-device code path).  Carries
    the assigned device so the worker can pin dispatch to it with
    jax.default_device."""

    class _D:
        size = 1

    devices = _D()

    def __init__(self, device=None):
        self.device = device


def split_mesh(mesh, n_groups: int) -> List:
    """Partition a mesh's devices into n_groups db-axis sub-meshes.

    The reference runs one independent HHblits instance per OpenMP
    thread (src/hhblits_omp.cpp:122-164); here each worker thread gets
    len(devices)/n_groups devices as its own ("q" x "db") mesh, so
    queries are embarrassingly parallel across sub-meshes and template
    batches still shard within one.  Groups with a single device run
    the plain single-device path."""
    from jax.sharding import Mesh

    devs = list(mesh.devices.flat)
    n_groups = max(1, min(n_groups, len(devs)))
    per = len(devs) // n_groups
    out = []
    for g in range(n_groups):
        sub = devs[g * per: (g + 1) * per]
        if g == n_groups - 1:
            sub = devs[g * per:]
        if len(sub) > 1:
            out.append(Mesh(np.array(sub).reshape(1, len(sub)),
                            axis_names=("q", "db")))
        else:
            out.append(_SingleDeviceMesh(sub[0]))
    return out


def auto_mesh():
    """Mesh over all local devices when more than one is attached (the
    production default: hhblits_omp/_mpi parallelism without flags)."""
    import jax

    try:
        n = jax.device_count()
    except Exception:
        return None
    if n > 1:
        return make_mesh(n)
    return None


def _pad_leading(a: np.ndarray, Bp: int, fill) -> np.ndarray:
    B = a.shape[0]
    if B == Bp:
        return a
    pad = [(0, Bp - B)] + [(0, 0)] * (a.ndim - 1)
    return np.pad(a, pad, constant_values=fill)


def sharded_template_call(fn, sharded_args: Sequence, fills: Sequence,
                          replicated_args: Sequence = (),
                          n_out: int = 1):
    """Run ``fn(*replicated_args, *sharded_args)`` with the leading axis
    of every sharded arg split over the mesh's devices.

    ``fills[i]`` is the pad value for sharded arg i (the same values
    pack_templates uses, so padded lanes flow through the kernels like
    any other padded lane).  Outputs must all carry the sharded leading
    axis; they are gathered and sliced back to the true batch size.
    """
    import jax
    from jax.sharding import PartitionSpec as P

    try:
        from jax import shard_map
    except ImportError:           # older jax
        from jax.experimental.shard_map import shard_map

    mesh = get_mesh()
    assert mesh is not None
    nd = int(mesh.devices.size)
    B = sharded_args[0].shape[0]
    Bp = -(-B // nd) * nd
    padded = [_pad_leading(np.asarray(a), Bp, f)
              for a, f in zip(sharded_args, fills)]

    spec_t = P(("q", "db"))
    in_specs = tuple([P()] * len(replicated_args)
                     + [spec_t] * len(padded))
    out_specs = tuple([spec_t] * n_out) if n_out > 1 else spec_t

    try:
        shard_fn = shard_map(fn, mesh=mesh, in_specs=in_specs,
                             out_specs=out_specs, check_vma=False)
    except TypeError:   # older jax spells it check_rep
        shard_fn = shard_map(fn, mesh=mesh, in_specs=in_specs,
                             out_specs=out_specs, check_rep=False)
    out = shard_fn(*replicated_args, *padded)
    if n_out == 1:
        return np.asarray(out)[:B]
    return tuple(np.asarray(o)[:B] for o in out)


def sharded_viterbi_backtrace(qp, qtr, tp, ttr, cell_off, t_L, shift,
                              egq, egt, ss_batch, local: bool):
    """The production Viterbi + backtrace pass, template-sharded.

    Per shard this runs the identical kernel the single-device engine
    dispatches (Pallas rows kernel on TPU, lax.scan elsewhere); the
    gathered (score, i2, j2, bt) are bit-identical to a single-device
    run because each template's DP is independent of its batchmates.
    """
    import jax

    from ..ops import viterbi as V

    B, Lt2 = tp.shape[0], tp.shape[1]
    Lq1 = qp.shape[0] - 1
    if cell_off is None:
        cell_off = np.zeros((B, Lq1, Lt2 - 1), dtype=bool)
    if ss_batch is None:
        ss_arr = np.zeros((B, 1, 1), dtype=np.float32)
        use_ss = False
    else:
        ss_arr = ss_batch
        use_ss = True

    on_tpu = all(d.platform == "tpu"
                 for d in get_mesh().devices.reshape(-1))
    has_co = bool(np.asarray(cell_off).any())

    def fn(qp_, qtr_, tp_, ttr_, co_, tl_, ss_):
        ss = ss_ if use_ss else None
        if on_tpu and egq == 0.0 and egt == 0.0:
            from ..ops.viterbi_rows import viterbi_batch_rows

            return viterbi_batch_rows(qp_, qtr_, tp_, ttr_,
                                      co_ if has_co else None, tl_,
                                      np.float32(shift), ss_score=ss,
                                      local=local, tb=64)
        return V.viterbi_batch(qp_, qtr_, tp_, ttr_, co_, tl_, shift,
                               0.0, egq, egt, ss_score=ss, local=local)

    return sharded_template_call(
        fn,
        sharded_args=(tp, ttr, cell_off, t_L, ss_arr),
        fills=(0.0, -FLT_MAX, False, 0, 0.0),
        replicated_args=(qp, qtr),
        n_out=4)


def sharded_lanes_scores(qp, qtr, tp, ttr, t_L, shift, ss_kw=None,
                         interpret=False):
    """Score-only lanes sweep, template-sharded (the funnel pass 1)."""
    from ..ops.viterbi_lanes import viterbi_score_lanes

    kw = dict(ss_kw or {})

    if kw:
        lut = kw.pop("ss_lut")
        qidx = kw.pop("ss_qidx")
        tidx = kw.pop("ss_tidx")

        def fn(qp_, qtr_, lut_, qidx_, tp_, ttr_, tl_, tidx_):
            return viterbi_score_lanes(qp_, qtr_, tp_, ttr_, tl_,
                                       np.float32(shift), ss_lut=lut_,
                                       ss_qidx=qidx_, ss_tidx=tidx_,
                                       interpret=interpret)

        return sharded_template_call(
            fn, sharded_args=(tp, ttr, t_L, tidx),
            fills=(0.0, -FLT_MAX, 0, 0),
            replicated_args=(qp, qtr, lut, qidx))

    from ..ops.viterbi_lanes import viterbi_score_lanes_fused
    from ..search.viterbi_search import _lanes_impl

    impl = _lanes_impl()

    def fn(qp_, qtr_, tp_, ttr_, tl_):
        if impl in ("fused", "exact"):
            return viterbi_score_lanes_fused(
                qp_, qtr_, tp_, ttr_, tl_, np.float32(shift),
                si_mode="fast" if impl == "fused" else "exact",
                interpret=interpret)
        return viterbi_score_lanes(qp_, qtr_, tp_, ttr_, tl_,
                                   np.float32(shift),
                                   interpret=interpret)

    return sharded_template_call(
        fn, sharded_args=(tp, ttr, t_L), fills=(0.0, -FLT_MAX, 0),
        replicated_args=(qp, qtr))


def global_topk_scores(local_scores: np.ndarray, k: int):
    """Global top-k merge of per-shard candidate scores across ALL jax
    processes — the multi-host database-sharding reduction (SURVEY §5:
    "global top-k hitlist merged via all_gather"; the reference's
    nearest analogue is the filesystem merge ffmerge_splits,
    src/hhblits_mpi.cpp:83-93).

    Each process holds the scores of ITS database shard (any length,
    may differ per process).  Every process contributes its local top-k
    candidates; one ``lax.all_gather`` over the global device mesh
    (Gloo on CPU hosts, ICI/DCN on TPU slices) replicates the candidate
    set, and the final top-k is computed identically everywhere.
    Returns ``(scores, process_ids, local_indices)`` of length
    ``min(k, total)`` — byte-identical on every process, deterministic
    tie-break by (score desc, process asc, local index asc).

    With a single process this reduces to a host argsort — no device
    round trip.
    """
    import jax

    local_scores = np.asarray(local_scores, np.float32)
    order = np.argsort(-local_scores, kind="stable")[:k]
    cand_s = local_scores[order]
    cand_i = order.astype(np.int32)
    nproc = jax.process_count()
    if nproc == 1:
        pid = np.zeros(len(order), np.int32)
        return cand_s, pid, cand_i

    # pad every process's candidate list to k so shapes agree
    pad = k - len(order)
    if pad > 0:
        cand_s = np.concatenate([cand_s, np.full(pad, -np.inf,
                                                 np.float32)])
        cand_i = np.concatenate([cand_i, np.full(pad, -1, np.int32)])

    from jax.sharding import Mesh, NamedSharding
    from jax.sharding import PartitionSpec as P

    try:
        from jax import shard_map
    except ImportError:                     # pragma: no cover
        from jax.experimental.shard_map import shard_map

    devs = jax.devices()                    # GLOBAL device list
    mesh = Mesh(np.array(devs), ("p",))
    nd = len(devs)
    # one row per device; processes with multiple local devices place
    # their candidates on the first local device and -inf rows on the
    # rest (simplest layout that keeps rows == devices)
    local_devs = jax.local_devices()
    rows = {d: np.full((1, k), -np.inf, np.float32) for d in local_devs}
    irows = {d: np.full((1, k), -1, np.int32) for d in local_devs}
    rows[local_devs[0]] = cand_s[None]
    irows[local_devs[0]] = cand_i[None]
    gs = jax.make_array_from_single_device_arrays(
        (nd, k), NamedSharding(mesh, P("p", None)),
        [jax.device_put(rows[d], d) for d in local_devs])
    gi = jax.make_array_from_single_device_arrays(
        (nd, k), NamedSharding(mesh, P("p", None)),
        [jax.device_put(irows[d], d) for d in local_devs])

    import jax.numpy as jnp

    def gather(s, i):
        return (jax.lax.all_gather(s[0], "p"),
                jax.lax.all_gather(i[0], "p"))

    try:
        smapped = shard_map(gather, mesh=mesh,
                            in_specs=(P("p", None),) * 2,
                            out_specs=(P(), P()), check_vma=False)
    except TypeError:                       # older jax: check_rep
        smapped = shard_map(gather, mesh=mesh,
                            in_specs=(P("p", None),) * 2,
                            out_specs=(P(), P()), check_rep=False)
    fn = jax.jit(smapped,
                 out_shardings=(NamedSharding(mesh, P()),) * 2)
    all_s, all_i = fn(gs, gi)
    all_s = np.asarray(all_s.addressable_data(0))   # (nd, k) replicated
    all_i = np.asarray(all_i.addressable_data(0))

    # device row -> owning process id
    row_pid = np.array([d.process_index for d in devs], np.int32)
    flat_s = all_s.reshape(-1)
    flat_i = all_i.reshape(-1)
    flat_p = np.repeat(row_pid, k)
    valid = flat_i >= 0
    flat_s, flat_i, flat_p = flat_s[valid], flat_i[valid], flat_p[valid]
    sel = np.lexsort((flat_i, flat_p, -flat_s))[:k]
    return flat_s[sel], flat_p[sel], flat_i[sel]


def sharded_prefilter_scores(kernel, qc, db, db_len, *scalars):
    """Stage-1/2 prefilter kernels over a DB-sequence shard per device.

    ``kernel(qc, db, db_len, *scalars) -> (B,) i32 scores``; the DB
    batch axis is sharded, the query profile replicated — the same
    layout the reference gets from OpenMP static scheduling over DB
    chunks (src/hhprefilter.cpp:466-536).
    """
    def fn(qc_, db_, ln_):
        return kernel(qc_, db_, ln_, *scalars)

    return sharded_template_call(
        fn, sharded_args=(db, db_len),
        fills=(219, 0),
        replicated_args=(qc,))
