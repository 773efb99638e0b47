"""Two-stage cs219 prefilter (host orchestration around device kernels).

Parity target: Prefilter (src/hhprefilter.cpp:28-606): the AS219 query
score table (stripe_query_profile, :356-424 — destriped to a logical
(220, Lq) table), stage-1 ungapped funnel with the min-hit floor, stage-2
gapped SW with E-value thresholds, and the exact sort/tie orders of the
reference's funnel cuts.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import numpy as np

from .. import fastmath as fm
from ..constants import Parameters
from ..core.hmm import HMM
from ..cs.context_lib import AS219_SIZE, ContextLibrary
from ..ops import prefilter as ops
from ..ops import start_host_copy


def build_query_profile(q_tmp: HMM, lib: ContextLibrary,
                        score_offset: int = 50,
                        bit_factor: int = 4) -> np.ndarray:
    """(220, Lq) uint8 query score table (hhprefilter.cpp:356-424).

    Row k < 219: clamp(flog2(sum_a p[i][a] lib_k[a] / pav[a]) * bit_factor
    + offset + 0.5); row 219 (ANY): offset - 1.

    Note the reference's off-by-one: it reads q_tmp->p[i] for i in 0..L-1
    (row 0 is the background-filled begin state) rather than 1..L; we
    reproduce that exactly.
    """
    LQ = q_tmp.L
    # S[i,k] = sum_a p[i][a] * lib[k][a] / pav[a],  i = 0..LQ-1 (sic)
    p = q_tmp.p[0:LQ].astype(np.float32)
    ratios = (lib.probs[:, 0, :].astype(np.float32)
              / q_tmp.pav[None, :].astype(np.float32))
    S = p @ ratios.T                                    # (LQ, 219) f32
    vals = fm.flog2(S.astype(np.float32)) * np.float32(bit_factor) \
        + np.float32(score_offset) + np.float32(0.5)
    qc = np.empty((AS219_SIZE + 1, LQ), dtype=np.uint8)
    # (unsigned char) cast truncates; clamp range first (:392-399)
    q8 = np.where(vals > 255.0, 255,
                  np.where(vals < 0, 0,
                           vals.astype(np.int32)))
    qc[:AS219_SIZE] = q8.T.astype(np.uint8)
    qc[AS219_SIZE] = score_offset - 1
    return qc


def pack_db(seqs: List[bytes], Ld_max: int) -> Tuple[np.ndarray, np.ndarray]:
    B = len(seqs)
    db = np.full((B, Ld_max), AS219_SIZE, dtype=np.int32)
    ln = np.zeros(B, dtype=np.int32)
    for b, s in enumerate(seqs):
        arr = np.frombuffer(s, dtype=np.uint8)
        db[b, : len(arr)] = arr
        ln[b] = len(arr)
    return db, ln


_DB_PACK_CACHE: dict = {}


def _resident_db(cache_key: str, seqs):
    """Length-bucketed cs219 DB packs resident on device, built once
    per database and reused across queries/rounds (the reference mmaps
    the whole cs219 data once, src/hhprefilter.cpp:314-335; here the
    equivalent is a one-time host->device upload)."""
    import jax

    ent = _DB_PACK_CACHE.get(cache_key)
    if ent is not None and ent["n"] == len(seqs):
        return ent
    order = np.argsort([len(s) for s in seqs], kind="stable")
    buckets = []
    bucket = 2048
    for i in range(0, len(order), bucket):
        idx = order[i: i + bucket]
        group = [seqs[j] for j in idx]
        Ld_max = max(1, max(len(s) for s in group))
        db, ln = pack_db(group, Ld_max)
        buckets.append({"idx": idx, "pos": {int(j): k
                                            for k, j in enumerate(idx)},
                        "db": jax.device_put(db),
                        "ln": jax.device_put(ln)})
    if len(_DB_PACK_CACHE) > 8:
        _DB_PACK_CACHE.clear()
    ent = _DB_PACK_CACHE[cache_key] = {"n": len(seqs),
                                       "buckets": buckets}
    return ent


def _bucketed_resident_dispatch(scores_fn, qc, ent, subset, *args):
    """Dispatch a kernel over the resident buckets (optionally a
    subset of sequence indices, device-gathered) WITHOUT fetching, so
    independent stages can queue behind each other and share one link
    drain."""
    pending = []
    sub_set = None if subset is None else set(int(x) for x in subset)
    for bk in ent["buckets"]:
        if sub_set is None:
            sc = scores_fn(qc, bk["db"], bk["ln"], *args)
            start_host_copy(sc)
            pending.append((bk["idx"], None, sc))
        else:
            rows = [bk["pos"][j] for j in bk["idx"] if int(j) in sub_set]
            if not rows:
                continue
            take = np.asarray([int(bk["idx"][r]) for r in rows])
            Bp = 1 << max(0, len(rows) - 1).bit_length()
            pos = np.zeros(Bp, np.int32)
            pos[: len(rows)] = rows
            db_sub = bk["db"][pos]         # on-device gather
            ln_sub = bk["ln"][pos]
            sc = scores_fn(qc, db_sub, ln_sub, *args)
            start_host_copy(sc)
            pending.append((take, len(rows), sc))
    return pending


def _bucketed_resident_fetch(pending, n_total):
    out = np.zeros(n_total, dtype=np.int32)
    for idx, nrows, sc in pending:
        sc = np.asarray(sc)
        out[idx] = sc if nrows is None else sc[:nrows]
    return out


def _bucketed_resident(scores_fn, qc, ent, subset, n_total, *args):
    """Run a kernel over the resident buckets — dispatch all buckets
    first, fetch after."""
    return _bucketed_resident_fetch(
        _bucketed_resident_dispatch(scores_fn, qc, ent, subset, *args),
        n_total)


def _bucketed(scores_fn, qc, seqs, *args):
    """Run a kernel over length buckets, returning (N,) scores.

    With an active device mesh each bucket's DB-sequence axis is
    sharded over the "db" mesh axis (parallel/mesh.py) — the
    per-device shard mirrors the reference's OpenMP static chunks
    (src/hhprefilter.cpp:466-536)."""
    from ..parallel.mesh import get_mesh, sharded_prefilter_scores

    mesh = get_mesh()
    order = np.argsort([len(s) for s in seqs], kind="stable")
    out = np.zeros(len(seqs), dtype=np.int32)
    bucket = 2048
    i = 0
    while i < len(order):
        idx = order[i: i + bucket]
        group = [seqs[j] for j in idx]
        Ld_max = max(1, max(len(s) for s in group))
        db, ln = pack_db(group, Ld_max)
        if mesh is not None:
            sc = sharded_prefilter_scores(scores_fn, qc, db, ln, *args)
        else:
            sc = np.asarray(scores_fn(qc, db, ln, *args))
        out[idx] = sc
        i += bucket
    return out


def prefilter_db(par: Parameters, q_tmp: HMM, lib: ContextLibrary,
                 names: List[str], seqs: List[bytes],
                 previous_hit_names: Optional[set] = None,
                 cache_key: Optional[str] = None
                 ) -> Tuple[List[Tuple[int, str]], List[Tuple[int, str]]]:
    """Prefilter::prefilter_db (hhprefilter.cpp:430-606).

    Returns (new_hits, old_hits) as (length, name) pairs in funnel
    order.  ``cache_key`` (e.g. the database base path) enables the
    device-resident cs219 pack reused across queries/rounds.
    """
    from ..profiling import annotate

    previous_hit_names = previous_hit_names or set()
    resident = None
    if cache_key is not None:
        try:
            import jax

            from ..parallel.mesh import get_mesh
            if jax.devices()[0].platform != "cpu" and get_mesh() is None:
                resident = _resident_db(cache_key, seqs)
        except Exception:
            resident = None
    qc = build_query_profile(q_tmp, lib, par.prefilter_score_offset,
                             par.prefilter_bit_factor).astype(np.int32)
    LQ = q_tmp.L
    num_dbs = len(seqs)
    log_qlen = float(fm.flog2(np.float32(LQ)))
    factor = float(num_dbs) * LQ

    # ---- stage 1: ungapped (Pallas kernel on TPU: state stays in
    # VMEM, MXU one-hot profile lookup; lax.scan elsewhere) ----
    stage1 = ops.ungapped_scores
    try:
        import jax
        if jax.devices()[0].platform != "cpu":
            from ..ops.prefilter_pallas import ungapped_scores_pallas
            stage1 = ungapped_scores_pallas
    except Exception:
        pass
    # stage-2 kernel selection hoisted so the small-DB speculative
    # dispatch below can use it
    stage2 = ops.gapped_scores
    try:
        import jax
        if jax.devices()[0].platform != "cpu" \
                and par.prefilter_gap_extend > 0:
            from ..ops.prefilter_pallas2 import gapped_scores_pallas
            stage2 = gapped_scores_pallas
    except Exception:
        pass
    gap_init = par.prefilter_gap_open + par.prefilter_gap_extend

    spec2 = None
    with annotate("prefilter_stage1_ungapped"):
        if resident is not None:
            pend1 = _bucketed_resident_dispatch(
                stage1, qc, resident, None,
                np.int32(par.prefilter_score_offset))
            if num_dbs <= 16384:
                # speculative gapped stage over the WHOLE db, queued
                # behind stage 1 so both stages ride one link drain
                # (the tunnel charges ~40 ms of non-pipelined latency
                # per serialized round-trip).  Per-row scores are
                # independent, so slicing the full result at the
                # survivors is bit-identical to the gathered
                # survivors-only dispatch; the wasted compute on
                # non-survivors is bounded by the 16k-seq gate (~tens
                # of ms), while big DBs keep the survivors-only gather
                spec2 = _bucketed_resident_dispatch(
                    stage2, qc, resident, None, np.int32(gap_init),
                    np.int32(par.prefilter_gap_extend),
                    np.int32(par.prefilter_score_offset))
            raw1 = _bucketed_resident_fetch(pend1, num_dbs)
        else:
            raw1 = _bucketed(stage1, qc, seqs,
                             np.int32(par.prefilter_score_offset))
    lens = np.array([len(s) for s in seqs])
    corr = (par.prefilter_bit_factor
            * (log_qlen + fm.flog2(lens.astype(np.float32)))).astype(int)
    score1 = raw1 - corr
    # sort desc by (score, index) — reference sorts pairs ascending then
    # reverses (hhprefilter.cpp:487-489): ties broken by larger index
    order = np.lexsort((np.arange(num_dbs), score1))[::-1]
    # cut: first rank >= min_hits whose score drops below the threshold
    osc = score1[order]
    drop = np.nonzero((np.arange(num_dbs) >= par.min_prefilter_hits)
                      & (osc <= par.preprefilter_smax_thresh))[0]
    cut = int(drop[0]) if drop.size else num_dbs
    survivors = [int(n) for n in order[:cut]]

    from .. import log as hhlog
    hhlog.info(f"HMMs passed 1st prefilter (gapless profile-profile "
               f"alignment)  : {len(survivors)}")

    # ---- stage 2: gapped SW (Pallas kernel on TPU: H/E state in
    # VMEM + log-roll F fixpoint; lax.scan elsewhere; kernel selection
    # hoisted above stage 1 for the speculative dispatch) ----
    with annotate("prefilter_stage2_gapped"):
        if spec2 is not None:
            raw2 = _bucketed_resident_fetch(spec2, num_dbs)[survivors]
        elif resident is not None:
            raw2_all = _bucketed_resident(
                stage2, qc, resident, survivors, num_dbs,
                np.int32(gap_init),
                np.int32(par.prefilter_gap_extend),
                np.int32(par.prefilter_score_offset))
            raw2 = raw2_all[survivors]
        else:
            sub_seqs = [seqs[n] for n in survivors]
            raw2 = _bucketed(stage2, qc, sub_seqs,
                             np.int32(gap_init),
                             np.int32(par.prefilter_gap_extend),
                             np.int32(par.prefilter_score_offset))
    # vectorized E-values, same f32 quantization + f64 product order as
    # the scalar form: (factor * lens[n]) * float(fpow2(f32(-raw2/bf)))
    surv = np.asarray(survivors, dtype=np.int64)
    fp = fm.fpow2(((-np.asarray(raw2))
                   / par.prefilter_bit_factor).astype(np.float32))
    ev_all = ((factor * lens[surv].astype(np.float64))
              * np.asarray(fp, np.float64))
    keep_m = ev_all < par.prefilter_evalue_coarse_thresh
    sel = np.nonzero(keep_m)[0]
    # ascending (E-value, index) — matches sort(key=(ev, n))
    sel = sel[np.lexsort((surv[sel], ev_all[sel]))]
    ev_sorted = ev_all[sel]
    n_sorted = surv[sel]
    drop = np.nonzero((np.arange(sel.size) >= par.min_prefilter_hits)
                      & (ev_sorted > par.prefilter_evalue_thresh))[0]
    cut2 = int(drop[0]) if drop.size else sel.size
    kept = [int(n) for n in n_sorted[:cut2]]
    hhlog.info(f"HMMs passed 2nd prefilter (gapped profile-profile "
               f"alignment)   : {len(kept)}")

    new_hits, old_hits = [], []
    seen = set()
    count = 0
    for n in kept:
        name = names[n]
        if name in seen:
            continue
        seen.add(name)
        count += 1
        base = name.rsplit(".", 1)[0] if "." in name else name
        pair = (int(lens[n]), name)
        if f"{base}__1" in previous_hit_names:
            old_hits.append(pair)
        else:
            new_hits.append(pair)
        if count >= par.maxnumdb:
            break
    return new_hits, old_hits
