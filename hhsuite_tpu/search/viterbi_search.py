"""Viterbi search scheduling: template batches -> scored Hits.

TPU-native replacement for ViterbiRunner (src/hhviterbirunner.cpp:75-330):
templates are length-sorted and packed into padded device batches (the
batch axis replaces the reference's VECSIZE_FLOAT SIMD lanes and OpenMP
threads), the wavefront kernel scores a whole batch per dispatch, and the
host decodes backtraces, rescoring each path like ScoreForBacktrace
(src/hhviterbi.cpp:195-283).  The alternative-alignment loop with path
exclusion (par.altali, src/hhviterbirunner.cpp:104-194) runs on the host
with per-template cell-off masks.
"""

from __future__ import annotations

import functools
import math
import time as _time
from typing import Dict, List, Optional, Tuple

import numpy as np

from .. import fastmath as fm
from ..constants import (MAXCF, NDSSP, NSSPRED, Parameters)
from ..core.hit import Hit
from ..core.hmm import HMM
from ..ops import start_host_copy
from ..ops import viterbi as V

FLT_MAX = float(np.finfo(np.float32).max)

# ss_hmm_mode bit flags (hhhmm.h computeScoreSSMode)
NO_SS_INFORMATION = 0
PRED_DSSP = 1
DSSP_PRED = 2
PRED_PRED = 4


def compute_ss_hmm_mode(q: HMM, templates: List[HMM]) -> int:
    """HMM::computeScoreSSMode consensus over a batch followed by the
    reference's exact (quirky) mode-selection cascade
    (hhviterbirunner.cpp:14-22): effectively only PRED_PRED survives."""
    consensus = 0xFF
    for t in templates:
        mode = 0
        mode |= PRED_DSSP if (q.nss_pred >= 0 and t.nss_dssp >= 0) else 0
        mode |= DSSP_PRED if (q.nss_dssp >= 0 and t.nss_pred >= 0) else 0
        mode |= PRED_PRED if (q.nss_pred >= 0 and t.nss_pred >= 0) else 0
        consensus &= mode
    ss = consensus & PRED_DSSP
    ss = (consensus & DSSP_PRED) if ss == 0 else 0
    ss = (consensus & PRED_PRED) if ss == 0 else 0
    return ss


def pack_templates(templates: List[HMM], Lt_max: int, B: int = 0,
                   pooled: bool = False
                   ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Pack template HMMs into padded arrays (HMMSimd::MapHMMVector
    semantics, hhhmmsimd.cpp:86-160: pad tr with -FLT_MAX, p with 0).

    ``B`` > len(templates) pads extra all-zero lanes (replaces a later
    np.pad copy); ``pooled`` reuses host staging buffers — safe only
    when the JAX backend snapshots jit inputs at dispatch (TPU)."""
    B = max(B, len(templates))
    if pooled:
        from .posterior import pooled_buffer

        tp = pooled_buffer((B, Lt_max + 2, 20), np.float32, 0.0)
        ttr = pooled_buffer((B, Lt_max + 2, 7), np.float32, -FLT_MAX)
    else:
        tp = np.zeros((B, Lt_max + 2, 20), dtype=np.float32)
        ttr = np.full((B, Lt_max + 2, 7), -FLT_MAX, dtype=np.float32)
    t_L = np.zeros(B, dtype=np.int32)
    for b, t in enumerate(templates):
        L = t.L
        t_L[b] = L
        tp[b, : L + 1] = _template_p(t)[: L + 1]
        ttr[b, : L + 1] = t.tr[: L + 1]
    return tp, ttr, t_L


def _template_p(t: HMM) -> np.ndarray:
    """Divided (odds-ratio) profile of a search handout.

    engine.get_template_hmm_search defers include_null_model's f32
    division (hhhmm.cpp:2139-2142) because the TPU funnel replays it
    on device or inside the native decode; any host consumer goes
    through here, which materializes the division once and promotes
    the handout to the divided state (bit-identical to dividing
    eagerly).

    NOT thread-safe on a SHARED handout (two racing callers could
    double-divide).  Handouts are per-call shell copies and each query
    runs its search single-threaded, so no current caller shares one;
    keep it that way or guard the promotion."""
    if getattr(t, "p_divided", True):
        return t.p
    t.p = (t.p.astype(np.float32, copy=False)
           / t.pnul_used[None, :])
    t.p_divided = True
    return t.p


def build_ss_score(q: HMM, t: HMM, ss_hmm_mode: int, ssw: float,
                   S73, S37, S33) -> Optional[np.ndarray]:
    """Precompute the (Lq+1, Lt+1) SS score matrix for one template
    (Viterbi::ScoreSS, hhviterbi.h:193-211), already ssw-weighted."""
    if ss_hmm_mode == NO_SS_INFORMATION:
        return None
    Lq, Lt = q.L, t.L
    out = np.zeros((Lq + 1, Lt + 1), dtype=np.float32)
    qi = np.arange(1, Lq + 1)
    tj = np.arange(1, Lt + 1)
    if ss_hmm_mode == PRED_DSSP:
        out[1:, 1:] = ssw * S37[q.ss_pred[qi][:, None],
                                q.ss_conf[qi][:, None],
                                t.ss_dssp[tj][None, :]]
    elif ss_hmm_mode == DSSP_PRED:
        out[1:, 1:] = ssw * S73[q.ss_dssp[qi][:, None],
                                t.ss_pred[tj][None, :],
                                t.ss_conf[tj][None, :]]
    elif ss_hmm_mode == PRED_PRED:
        out[1:, 1:] = ssw * S33[q.ss_pred[qi][:, None],
                                q.ss_conf[qi][:, None],
                                t.ss_pred[tj][None, :],
                                t.ss_conf[tj][None, :]]
    return out


def score_for_backtrace(q: HMM, t: HMM, align_score: float,
                        i_steps, j_steps, states, ss_hmm_mode: int,
                        ssw: float, ss_mode: int, corr: float,
                        S73, S37, S33) -> Tuple[float, float, np.ndarray,
                                                np.ndarray]:
    """Viterbi::ScoreForBacktrace (hhviterbi.cpp:195-283).

    Returns (score, score_ss, S, S_ss) with S/S_ss 1-based step arrays.
    """
    nsteps = len(i_steps) - 1
    S = np.zeros(nsteps + 1, dtype=np.float32)
    S_ss = np.zeros(nsteps + 1, dtype=np.float32)
    mm = states[1:] == V.MM
    steps = np.arange(1, nsteps + 1)
    mi = np.asarray(i_steps)[1:][mm]
    mj = np.asarray(j_steps)[1:][mm]
    if len(mi):
        S[steps[mm]] = fm.fast_log2(fm.scalar_prod20(q.p[mi],
                                                     _template_p(t)[mj]))
        if ss_hmm_mode != NO_SS_INFORMATION:
            if ss_hmm_mode == PRED_DSSP:
                sv = ssw * S37[q.ss_pred[mi], q.ss_conf[mi], t.ss_dssp[mj]]
            elif ss_hmm_mode == DSSP_PRED:
                sv = ssw * S73[q.ss_dssp[mi], t.ss_pred[mj], t.ss_conf[mj]]
            else:
                sv = ssw * S33[q.ss_pred[mi], q.ss_conf[mi],
                               t.ss_pred[mj], t.ss_conf[mj]]
            S_ss[steps[mm]] = sv
    # sequential float32 accumulation of score_ss and the correlation
    # term (hhviterbi.cpp:224-252) — bit-exact order; the native twin
    # runs the same f32 loops in C (~1 ms/hit -> ~1 us/hit)
    from ..native import load as _load_native

    nat = _load_native()
    if nat is not None:
        score_ss, corr_term = nat.backtrace_score_terms(
            np.ascontiguousarray(S), np.ascontiguousarray(S_ss),
            int(nsteps), float(np.float32(corr)))
        score_ss = np.float32(score_ss)
        score = np.float32(align_score)
        if ss_mode == 2:   # Hit::SCORE_ALIGNMENT: subtract kernel SS
            score = np.float32(score - score_ss)
        if nsteps:
            score = np.float32(score + np.float32(corr_term))
        return float(score), float(score_ss), S, S_ss
    score_ss = np.float32(0.0)
    for v in S_ss[1:]:
        score_ss = np.float32(score_ss + v)
    score = np.float32(align_score)
    if ss_mode == 2:  # Hit::SCORE_ALIGNMENT: subtract SS added in kernel
        score = np.float32(score - score_ss)
    # correlation term (hhviterbi.cpp:243-252)
    scorr = np.float32(0.0)
    if nsteps:
        Sf = S
        for lag in (1, 2, 3, 4):
            for step in range(1 + lag, nsteps + 1):
                scorr = np.float32(scorr + np.float32(Sf[step]
                                                      * Sf[step - lag]))
        score = np.float32(score + np.float32(corr) * scorr)
    return float(score), float(score_ss), S, S_ss


def calculate_early_stop(par: Parameters, q: HMM,
                         junk_hits: List[Hit]) -> float:
    """ViterbiRunner::calculateEarlyStop (hhviterbirunner.cpp:213-247):
    sum of 1/(1+E) over a scored block; the block loop stops when this
    falls below block_size * par.filter_thresh."""
    import math

    from ..core.hit import lamda_nn, log_pvalue, mu_nn

    if not junk_hits:
        return 0.0
    LOG1000 = math.log(1000.0)
    log_dbsize = math.log(max(par.dbsize, 1))
    log_pcut = math.log(par.prefilter_evalue_thresh / max(par.dbsize, 1))
    q_len = math.log(q.L) / LOG1000
    q_neff = q.Neff_HMM / 10.0
    n = len(junk_hits)
    hit_len = np.array([math.log(max(h.L, 1)) for h in junk_hits],
                       np.float64) / LOG1000
    hit_neff = np.array([h.Neff_HMM for h in junk_hits],
                        np.float64) / 10.0
    scores = np.array([h.score for h in junk_hits], np.float64)
    qlv = np.full(n, q_len)
    qnv = np.full(n, q_neff)
    lam = lamda_nn(qlv, hit_len, qnv, hit_neff)
    mu = mu_nn(qlv, hit_len, qnv, hit_neff)
    logp = log_pvalue(scores, lam, mu)
    alpha = np.float64(0.0)
    if par.prefilter:
        alpha = par.alphaa + par.alphab * (hit_neff - 1) \
            * (1 - par.alphac * (q_neff - 1))
    eval_ = np.exp(logp + log_dbsize + alpha * log_pcut)
    return float(np.sum(1.0 / (1.0 + eval_)))


def _on_tpu() -> bool:
    import jax

    try:
        return jax.devices()[0].platform != "cpu"
    except Exception:
        return False


def _funnel_ok() -> bool:
    """Hardware gate for the two-pass score-only funnel (separate from
    _on_tpu so tests can force the funnel on the CPU interpret path)."""
    return _on_tpu()


def build_ss_lut(q: HMM, templates: List[HMM], ss_hmm_mode: int,
                 ssw: float, S73, S37, S33, Lt_max: int):
    """Device-side form of Viterbi::ScoreSS (hhviterbi.h:193-211):
    a flat ssw-weighted table plus per-query-row / per-template-column
    offsets such that ss(b,i,j) = lut[qidx[i] + tidx[b,j]]."""
    Lq = q.L
    qi = np.arange(1, Lq + 1)
    tidx = np.zeros((len(templates), Lt_max), dtype=np.int32)
    if ss_hmm_mode == PRED_DSSP:
        lut = (ssw * S37).reshape(-1).astype(np.float32)
        qidx = ((q.ss_pred[qi] * MAXCF + q.ss_conf[qi])
                * NDSSP).astype(np.int32)
        for b, t in enumerate(templates):
            tidx[b, : t.L] = t.ss_dssp[1: t.L + 1]
    elif ss_hmm_mode == DSSP_PRED:
        lut = (ssw * S73).reshape(-1).astype(np.float32)
        qidx = (q.ss_dssp[qi] * (NSSPRED * MAXCF)).astype(np.int32)
        for b, t in enumerate(templates):
            tj = np.arange(1, t.L + 1)
            tidx[b, : t.L] = t.ss_pred[tj] * MAXCF + t.ss_conf[tj]
    else:  # PRED_PRED
        lut = (ssw * S33).reshape(-1).astype(np.float32)
        qidx = ((q.ss_pred[qi] * MAXCF + q.ss_conf[qi])
                * (NSSPRED * MAXCF)).astype(np.int32)
        for b, t in enumerate(templates):
            tj = np.arange(1, t.L + 1)
            tidx[b, : t.L] = t.ss_pred[tj] * MAXCF + t.ss_conf[tj]
    return lut, qidx, tidx


def _dispatch_kernel(qp, qtr, tp, ttr, cell_off, t_L, shift, egq, egt,
                     ss_batch, local):
    """Pick the Pallas TPU kernel when running on TPU hardware with the
    default (zero) end-gap penalties; lax.scan reference kernel
    otherwise.  With an active device mesh the template batch is
    sharded over the "db" axis (parallel/mesh.py) — the production
    multi-device path."""
    from ..parallel.mesh import get_mesh, sharded_viterbi_backtrace

    if get_mesh() is not None:
        from ..profiling import annotate

        with annotate("viterbi_backtrace_sharded"):
            return sharded_viterbi_backtrace(
                qp, qtr, tp, ttr, cell_off, t_L, np.float32(shift),
                float(egq), float(egt), ss_batch, bool(local))
    if _on_tpu() and egq == 0.0 and egt == 0.0:
        from ..ops.viterbi_rows import viterbi_batch_rows
        from ..profiling import annotate

        with annotate("viterbi_backtrace_pass"):
            return viterbi_batch_rows(
                qp, qtr, tp, ttr, cell_off, t_L, np.float32(shift),
                ss_score=ss_batch, local=local, tb=64)
    co = cell_off
    if co is None:
        co = np.zeros((tp.shape[0], qp.shape[0] - 1, tp.shape[1] - 1),
                      dtype=bool)
    return V.viterbi_batch(qp, qtr, tp, ttr, co, t_L, shift, 0.0,
                           egq, egt, ss_score=ss_batch, local=local)


class _PackDisabled:
    """Sentinel: the resident pack was declined (HBM budget) — callers
    must not build the local fallback pack either, or the budget check
    is defeated (the fallback would device_put the same templates)."""


PACK_DISABLED = _PackDisabled()


class ResidentTemplatePack:
    """Device-resident RAW template arrays, bucketed by padded length,
    incrementally grown and cached per database.

    The altali loop re-aligns the same templates up to ``par.altali``
    times, the two-pass funnel sweeps them once more, and iterative
    hhblits rounds / batch queries hit overlapping survivor sets;
    shipping packed (B, Lt+2, 20/7) arrays per batch re-serializes the
    same ~hundreds of MB through the host->device link every pass.
    Instead each template's arrays upload ONCE (length-bucketed so
    padding stays tight) and every batch is an on-device gather by row
    index — the per-batch upload shrinks to an int32 index vector plus
    a (B, 20) null-model vector.

    Query independence: rows hold the template profile BEFORE the
    null-model division (include_null_model, hhhmm.cpp:2059-2144 —
    the only query-dependent template stage).  The per-template pnul
    vectors are computed on host exactly like include_null_model and
    the division runs on device per batch (f32 IEEE divide == numpy's,
    bit-exact), so the same resident rows serve every query/round.

    Capacity grows by doubling; shapes are power-of-two quantized so
    the jit cache sees a handful of signatures, not one per query.
    """

    def __init__(self, bucket: int = 128):
        self.bucket_size = bucket
        self.row_of: Dict[str, Tuple[int, int]] = {}   # name -> (b,row)
        self.buckets: Dict[int, dict] = {}
        self.approx_bytes = 0      # device-resident footprint estimate

    def _bucket_for(self, L: int) -> int:
        b = self.bucket_size
        return max(b, -(-L // b) * b)

    def ensure(self, items: List[Tuple[str, HMM]]):
        """Upload any templates not yet resident.  ``items`` are
        (name, PRE-division HMM) — e.g. the parsed-HMM cache entries
        from get_template_hmm_prepared, read-only."""
        import jax

        new_by_bucket: Dict[int, List[Tuple[str, HMM]]] = {}
        for name, t in items:
            if name not in self.row_of:
                new_by_bucket.setdefault(self._bucket_for(t.L),
                                         []).append((name, t))
        for Lt_pad, new in new_by_bucket.items():
            bk = self.buckets.get(Lt_pad)
            have = bk["used"] if bk else 0
            need = have + len(new)
            cap = bk["cap"] if bk else 0
            if need + 1 > cap:       # +1 for the null row
                new_cap = max(16, 1 << (need + 1).bit_length())
                tp = np.zeros((new_cap, Lt_pad + 2, 20), np.float32)
                ttr = np.full((new_cap, Lt_pad + 2, 7), -FLT_MAX,
                              np.float32)
                t_L = np.zeros(new_cap, np.int32)
                if bk is not None:
                    tp[:have] = bk["tp_h"][:have]
                    ttr[:have] = bk["ttr_h"][:have]
                    t_L[:have] = bk["t_L_h"][:have]
                self.approx_bytes += ((new_cap - cap)
                                      * (Lt_pad + 2) * 27 * 4)
                bk = self.buckets[Lt_pad] = {
                    "tp_h": tp, "ttr_h": ttr, "t_L_h": t_L,
                    "used": have, "cap": new_cap}
            for name, t in new:
                row = bk["used"]
                L = t.L
                bk["tp_h"][row, : L + 1] = _template_p(t)[: L + 1]
                bk["ttr_h"][row, : L + 1] = t.tr[: L + 1]
                bk["t_L_h"][row] = L
                bk["used"] = row + 1
                self.row_of[name] = (Lt_pad, row)
            bk["tp"] = jax.device_put(bk["tp_h"])
            bk["ttr"] = jax.device_put(bk["ttr_h"])
            bk["t_L"] = jax.device_put(bk["t_L_h"])

    def projected_bytes(self, items: List[Tuple[str, HMM]]) -> int:
        """Device footprint AFTER ensure(items) would run, mirroring
        its bucket/pow2-capacity allocation math — the honest input to
        an HBM budget check (tight per-template sums underestimate by
        the capacity-doubling x length-bucket padding factor)."""
        new_per_bucket: Dict[int, int] = {}
        for name, t in items:
            if name not in self.row_of:
                b = self._bucket_for(t.L)
                new_per_bucket[b] = new_per_bucket.get(b, 0) + 1
        total = self.approx_bytes
        for Lt_pad, n_new in new_per_bucket.items():
            bk = self.buckets.get(Lt_pad)
            have = bk["used"] if bk else 0
            cap = bk["cap"] if bk else 0
            need = have + n_new
            if need + 1 > cap:
                new_cap = max(16, 1 << (need + 1).bit_length())
                total += (new_cap - cap) * (Lt_pad + 2) * 27 * 4
        return total

    def gather_args(self, Lt_pad: int, names: List[str], Bp: int):
        """(tp_all, ttr_all, tL_all, idx) for a fused gather+kernel
        call; idx padded to Bp lanes with the null (all-padding) row,
        which is any row >= used (zero profile / -inf transitions)."""
        bk = self.buckets[Lt_pad]
        idx = np.full(Bp, bk["cap"] - 1, dtype=np.int32)
        for k, name in enumerate(names):
            idx[k] = self.row_of[name][1]
        return bk["tp"], bk["ttr"], bk["t_L"], idx


@functools.partial(
    __import__("jax").jit,
    static_argnames=("local", "tb"))
def _gathered_rows_kernel(qp, qtr, tp_all, ttr_all, tL_all, idx, pnul,
                          cell_off, shift, local=True, tb=32,
                          ss_batch=None, Lq_true=None):
    """On-device gather from the resident pack + null-model division
    (include_null_model's f32 divide, hhhmm.cpp:2139-2142) + backtrace
    kernel."""
    from ..ops.viterbi_rows import viterbi_batch_rows

    tp = tp_all[idx] / pnul[:, None, :]
    return viterbi_batch_rows(qp, qtr, tp, ttr_all[idx],
                              cell_off, tL_all[idx], shift,
                              ss_score=ss_batch, local=local, tb=tb,
                              Lq_true=Lq_true)


@functools.partial(
    __import__("jax").jit, static_argnames=("kmax", "local", "tb"))
def _gathered_rows_excl_kernel(qp, qtr, tp_all, ttr_all, tL_all, idx,
                               pnul, lo_c, hi_c, lo_r, hi_r, shift,
                               Lq_true, kmax, local=True, tb=32):
    """Altali-pass fused dispatch: build the exclusion cell-off mask
    from band intervals, gather + divide the resident-pack rows, run
    the backtrace rows kernel and the on-device packed walk — ONE jit
    call per batch instead of ~6 eager mask ops + 2 jit dispatches
    (each tunnel dispatch costs milliseconds of host/link overhead)."""
    from ..ops.viterbi_rows import viterbi_batch_rows

    cell_off = V.exclusion_mask_device(lo_c, hi_c, lo_r, hi_r)
    tp = tp_all[idx] / pnul[:, None, :]
    score, i2, j2, bt = viterbi_batch_rows(
        qp, qtr, tp, ttr_all[idx], cell_off, tL_all[idx], shift,
        local=local, tb=tb, Lq_true=Lq_true)
    return V._backtrace_walk_packed8(bt, i2, j2, score, kmax=kmax)


@functools.partial(
    __import__("jax").jit, static_argnames=("kmaxes", "Wmax"))
def _gathered_rows_excl_multi(qp, qtr, parts, shift, Lq_true, kmaxes,
                              Wmax):
    """One dispatch for ALL of an altali pass's bucketed batches:
    every bucket's exclusion-mask build + rows backtrace kernel +
    packed walk runs inside a single jit call, returning one
    concatenated payload (rows in parts order, columns padded to
    Wmax).  Same motivation as `_gathered_bt_lanes_multi`: each
    tunneled-TPU dispatch costs ~40 ms of non-pipelined round-trip
    latency, and an altali pass over ~7k surviving lanes previously
    paid it per length bucket.  ``parts`` is a tuple of
    (tp_all, ttr_all, tL_all, idx, pnul, lo_c, hi_c, lo_r, hi_r)."""
    import jax.numpy as jnp

    from ..ops.viterbi_rows import viterbi_batch_rows

    outs = []
    for (tp_all, ttr_all, tL_all, idx, pnul, lo_c, hi_c, lo_r,
         hi_r), km in zip(parts, kmaxes):
        cell_off = V.exclusion_mask_device(lo_c, hi_c, lo_r, hi_r)
        tp = tp_all[idx] / pnul[:, None, :]
        score, i2, j2, bt = viterbi_batch_rows(
            qp, qtr, tp, ttr_all[idx], cell_off, tL_all[idx], shift,
            local=True, tb=32, Lq_true=Lq_true)
        p = V._backtrace_walk_packed8(bt, i2, j2, score, kmax=km)
        W = 12 + km
        outs.append(p if W == Wmax
                    else jnp.pad(p, ((0, 0), (0, Wmax - W))))
    return jnp.concatenate(outs, axis=0) if len(outs) > 1 else outs[0]


@functools.partial(
    __import__("jax").jit, static_argnames=("kmax", "B", "interpret"))
def _gathered_bt_lanes_kernel(qp, qtr, tp_all, ttr_all, tL_all, idx,
                              pnul, shift, Lq_true, kmax, B,
                              interpret=False):
    """On-device gather + null-model division + TEMPLATE-LANES
    backtrace kernel + words-layout walk: the no-SS/no-exclusion hot
    path of the funnel's backtrace pass.  ~25% faster per batch than
    the rows-kernel pipeline at identical paths (bit-exact vs the
    anti-diagonal parity kernel, test_viterbi_lanes_bt.py); payload
    format shared with _backtrace_walk_packed8."""
    from ..ops.viterbi_lanes import viterbi_backtrace_lanes

    tp = tp_all[idx] / pnul[:, None, :]
    score, i2, j2, btw = viterbi_backtrace_lanes(
        qp, qtr, tp, ttr_all[idx], tL_all[idx], shift,
        Lq_true=Lq_true, interpret=interpret)
    packed = V.backtrace_walk_packed8_words(btw, i2, j2, score,
                                            kmax=kmax, B=B)
    return packed


def _lanes_impl() -> str:
    """Which score-sweep implementation the funnel uses (no-SS path):
    ``"fused"`` (default) — `viterbi_score_lanes_fused(si_mode='fast')`,
    Si computed in-kernel (never in HBM), quartic-corrected log2 with
    |err| <= 0.000146 bit/cell, ~5x the split kernel's throughput;
    ``"exact"`` — the fused kernel with the `_log2f4` cubic;
    ``"split"`` — the einsum + bf16-Si-streaming kernel (pre-r5
    behavior).  Override with HHSUITE_TPU_SI_MODE."""
    import os

    v = os.environ.get("HHSUITE_TPU_SI_MODE", "fused").strip().lower()
    return v if v in ("fused", "exact", "split") else "fused"


@functools.partial(
    __import__("jax").jit, static_argnames=("kmaxes", "Wmax"))
def _gathered_bt_lanes_multi(qp, qtr, parts, shift, Lq_true, kmaxes,
                             Wmax):
    """One dispatch for a whole junk's backtrace pass: every length
    bucket's gather + fused BT lanes kernel + words walk + payload pad
    runs inside a single jit call, returning one concatenated payload.

    Each tunneled-TPU dispatch costs ~30-40 ms of NON-pipelined
    round-trip latency (r5 measurement: 8 queued jit calls scale
    linearly), so a 3-bucket junk paid ~3x that per early-stopping
    block; here it pays once.  ``parts`` is a tuple of
    (tp_all, ttr_all, tL_all, idx, pnul) per bucket; ``kmaxes`` the
    matching static walk lengths; rows are emitted in parts order so
    the caller's span table maps payload rows back to batches."""
    import jax.numpy as jnp

    from ..ops.viterbi_lanes import viterbi_backtrace_lanes

    outs = []
    for (tp_all, ttr_all, tL_all, idx, pnul), km in zip(parts, kmaxes):
        tp = tp_all[idx] / pnul[:, None, :]
        score, i2, j2, btw = viterbi_backtrace_lanes(
            qp, qtr, tp, ttr_all[idx], tL_all[idx], shift,
            Lq_true=Lq_true)
        p = V.backtrace_walk_packed8_words(btw, i2, j2, score,
                                           kmax=km, B=idx.shape[0])
        W = 12 + km
        outs.append(p if W == Wmax
                    else jnp.pad(p, ((0, 0), (0, Wmax - W))))
    return jnp.concatenate(outs, axis=0) if len(outs) > 1 else outs[0]


@functools.partial(
    __import__("jax").jit, static_argnames=("interpret", "impl"))
def _gathered_lanes_kernel(qp, qtr, tp_all, ttr_all, tL_all, idx, pnul,
                           shift, interpret=False, impl="split",
                           ss_lut=None, ss_qidx=None, ss_tidx=None):
    """On-device gather + null-model division + score-only lanes
    sweep.  ``impl`` selects the fused-Si kernel (no-SS path only —
    the SS LUT gather still rides the split kernel)."""
    from ..ops.viterbi_lanes import (viterbi_score_lanes,
                                     viterbi_score_lanes_fused)

    tp = tp_all[idx] / pnul[:, None, :]
    if ss_lut is None and impl in ("fused", "exact"):
        return viterbi_score_lanes_fused(
            qp, qtr, tp, ttr_all[idx], tL_all[idx], shift,
            si_mode="fast" if impl == "fused" else "exact",
            interpret=interpret)
    kw = {}
    if ss_lut is not None:
        kw = dict(ss_lut=ss_lut, ss_qidx=ss_qidx, ss_tidx=ss_tidx)
    return viterbi_score_lanes(qp, qtr, tp,
                               ttr_all[idx], tL_all[idx], shift,
                               interpret=interpret, **kw)


def viterbi_search(par: Parameters, q: HMM, templates: List[Tuple[str, HMM]],
                   ss_matrices=None, batch_size: int = 32,
                   self_names: Optional[set] = None,
                   allow_funnel: bool = True,
                   resident_pack: Optional[ResidentTemplatePack] = None
                   ) -> List[Hit]:
    """Align query against prepared template HMMs, with the altali loop.

    ``templates``: list of (entry_name, prepared HMM).  Returns all hits
    (irep 1..altali) exactly like ViterbiRunner::alignment.

    On TPU the first alignment pass runs a two-pass funnel: the
    score-only lanes kernel sweeps every template (~3.4x the
    throughput of the backtrace kernel), then only candidates that can
    be displayed, realigned, or enter the altali loop — the running
    global top-2*max(Z,B,realign_max) by score plus everything above
    par.smin — are re-run through the backtrace kernel for full paths.
    The rest become path-less "light" hits (hit.light=True) that carry
    the kernel score for E-values and early stopping but are never
    printed with alignments or realigned.  This mirrors the
    reference's display/realign caps (src/hhdecl.cpp:165-169); light
    hits lack the correlation-score term (src/hhviterbi.cpp:243-252),
    which only affects hits far outside the reporting caps.
    """
    if ss_matrices is not None:
        S73, S37, S33 = (ss_matrices.S73, ss_matrices.S37, ss_matrices.S33)
    else:
        S73 = S37 = S33 = None

    if _on_tpu():
        # bigger backtrace-kernel batches amortize per-DISPATCH latency
        # (~30 ms of non-pipelined round-trip per jit call on the
        # tunneled TPU — measured r5: 8 queued calls scale linearly at
        # ~42 ms each while the pure compute is ~15 ms); 4096 lanes cut
        # the 8192-point's backtrace pass from ~12 dispatches to ~4.
        # Per-batch HBM stays modest now that Si is fused into the
        # kernel (the btw word matrix is ~1 B/cell: 4096x512x832 =
        # 1.7 GB worst case on a 16 GB chip)
        import os as _os

        batch_size = max(batch_size, int(_os.environ.get(
            "HHSUITE_TPU_BT_BATCH", "4096")))
    smin = par.smin
    hits: List[Hit] = []
    # per-template accumulated exclusion paths
    exclude: Dict[int, List[Tuple[np.ndarray, np.ndarray]]] = {}

    alive = list(range(len(templates)))
    tmpl_list = [t for _, t in templates]

    from ..parallel.mesh import get_mesh

    import os as _os

    pack = None
    pack_names: List[str] = []
    pack_pnul: Optional[np.ndarray] = None
    if (_on_tpu() and get_mesh() is None and par.egq == 0.0
            and par.egt == 0.0
            and resident_pack is not PACK_DISABLED
            and not _os.environ.get("HHSUITE_TPU_NO_RESIDENT_PACK")):
        from ..profiling import annotate

        with annotate("template_pack_upload"):
            names = [str(n) for n, _t in templates]
            if resident_pack is not None and \
                    all(n in resident_pack.row_of for n in names):
                # engine-cached raw pack: rows are pre-division, the
                # per-template pnul vectors replay include_null_model
                # on device
                pack = resident_pack
                pack_names = names
                pack_pnul = np.stack(
                    [np.asarray(t.pnul_used, np.float32)
                     for _n, t in templates])
            else:
                # local fallback (hhalign, promote passes): rows are
                # the already-divided arrays, division is a no-op
                pack = ResidentTemplatePack()
                pack_names = [f"\x00{i}" for i in range(len(tmpl_list))]
                pack.ensure(list(zip(pack_names, tmpl_list)))
                pack_pnul = np.ones((len(tmpl_list), 20), np.float32)

    def _pnul_lanes(idxs: List[int], Bp: int) -> np.ndarray:
        out = np.ones((Bp, 20), np.float32)
        out[: len(idxs)] = pack_pnul[idxs]
        return out

    # ---- query-length bucketing (pack path, local mode, no SS) ----
    # pad the KERNEL's view of the query to a 32-column bucket so jit
    # signatures are shared across queries (each new Lq otherwise
    # recompiles the whole funnel at ~10-60 s/shape); padded rows carry
    # zero profiles / -inf transitions and are excluded from the
    # argmax via the kernel's row-validity channel.  Host-side
    # rescoring/backtrace always uses the REAL q (paths never enter
    # padded rows).
    Lq_real = q.L
    Lq_use = Lq_real
    qp_use = q.p.astype(np.float32)
    qtr_use = q.tr.astype(np.float32)
    if (pack is not None and bool(par.loc)
            and q.nss_pred < 0 and q.nss_dssp < 0):
        Lq_use = max(32, -(-Lq_real // 32) * 32)
        if Lq_use > Lq_real:
            qp_pad = np.zeros((Lq_use + 2, 20), np.float32)
            qp_pad[: Lq_real + 2] = qp_use
            qtr_pad = np.full((Lq_use + 2, 7), -FLT_MAX, np.float32)
            qtr_pad[: Lq_real + 2] = qtr_use
            qp_use, qtr_use = qp_pad, qtr_pad

    def _run_junk(junk):
        # Two-phase: dispatch every batch first (JAX queues device work
        # asynchronously), then fetch + host-unpack — so batch k+1's
        # device compute overlaps batch k's device->host fetch instead
        # of serializing dispatch->block->unpack per batch.
        from ..profiling import stage_add

        _t_p1 = _time.perf_counter()
        pending = []
        hot = []          # deferred hot-path batches -> one dispatch
        hot_excl = []     # deferred altali batches -> one dispatch
        if pack is not None:
            # resident-pack path: group by length bucket, batches are
            # on-device gathers (no per-batch template upload)
            by_bucket: Dict[int, List[int]] = {}
            for i in junk:
                by_bucket.setdefault(pack.row_of[pack_names[i]][0],
                                     []).append(i)
            batches = [(lt, ids[s: s + batch_size])
                       for lt in sorted(by_bucket, reverse=True)
                       for ids in (by_bucket[lt],)
                       for s in range(0, len(ids), batch_size)]
        else:
            batches = [(None, junk[s: s + batch_size])
                       for s in range(0, len(junk), batch_size)]
        for bucket_lt, idxs in batches:
            batch = [tmpl_list[i] for i in idxs]
            # quantize the padded shapes (template length to 64 columns,
            # batch to a power-of-2 bucket below 256 and a multiple of
            # 256 above) so the jit cache sees a handful of shapes
            # instead of one per batch — XLA compiles at ~10 s/shape,
            # which otherwise dwarfs the compute; the 256-step upper
            # range keeps bucket-remainder batches (600-900 lanes
            # common) from paying a full 1024-lane kernel pass
            nb = len(batch)
            if nb <= 256:
                Bp = 1 << max(0, nb - 1).bit_length()
            else:
                Bp = -(-nb // 256) * 256
            Bp = min(batch_size, Bp)
            if bucket_lt is not None:
                Lt_max = bucket_lt
                tp_all, ttr_all, tL_all, gidx = pack.gather_args(
                    bucket_lt, [pack_names[i] for i in idxs], Bp)
            else:
                Lt_max = -(-max(t.L for t in batch) // 64) * 64
                tp, ttr, t_L = pack_templates(batch, Lt_max, B=Bp,
                                              pooled=_on_tpu())
            # ss_hmm_mode is derived from SS-data availability
            # UNCONDITIONALLY (the runner computes it regardless of
            # -ssm, hhviterbirunner.cpp:14-22, and ScoreForBacktrace
            # then reports a nonzero score_ss that feeds score_aass
            # even for -ssm 0 — advisor finding r2-low); the DP kernel
            # itself adds SS only for ssm=2 (hhviterbi.cpp:175 gates on
            # SCORE_ALIGNMENT, and per the TODO there ssm=4
            # deliberately does not reach the SS kernel)
            ss_hmm_mode = compute_ss_hmm_mode(q, batch)
            ss_in_dp = par.ssm == 2 and ss_hmm_mode != NO_SS_INFORMATION

            # the pack path's kernel sees the Lq-bucketed query view
            Lq = Lq_use if bucket_lt is not None else q.L
            has_excl = any(exclude.get(i) for i in idxs)
            has_str = bool(par.exclstr or par.template_exclstr)
            any_co = has_excl or has_str
            cell_off = None
            excl_iv = None
            if has_excl and _on_tpu() and not has_str:
                # build the altali exclusion mask ON DEVICE from band
                # intervals: ships O(B*P*(Lq+Lt)) int32 instead of the
                # O(B*Lq*Lt) bool mask (~170 MB/batch over the tunnel)
                P = max(len(exclude.get(i, [])) for i in idxs)
                Wj = Lt_max + 1
                # int16 staging: half the host fill + host->device
                # serialization of the interval tensors (lengths are
                # bounded by maxres 20001 << 2^15; the device mask
                # builder's comparisons promote against int32 iotas)
                lo_c = np.ones((Bp, P, Wj), np.int16)
                hi_c = np.zeros((Bp, P, Wj), np.int16)
                lo_r = np.ones((Bp, P, Lq + 1), np.int16)
                hi_r = np.zeros((Bp, P, Lq + 1), np.int16)
                for b, i in enumerate(idxs):
                    for p, (pi, pj) in enumerate(exclude.get(i, [])):
                        lc, hc, lr, hr = V.band_intervals(
                            np.asarray(pi)[1:], np.asarray(pj)[1:], 40,
                            q.L, tmpl_list[i].L, Lq + 1, Wj)
                        lo_c[b, p] = lc
                        hi_c[b, p] = hc
                        lo_r[b, p] = lr
                        hi_r[b, p] = hr
                excl_iv = (lo_c, hi_c, lo_r, hi_r)
                if not (bucket_lt is not None and not ss_in_dp
                        and bool(par.loc)):
                    # generic path still needs the materialized mask
                    cell_off = V.exclusion_mask_device(*excl_iv)
            elif any_co:
                cell_off = np.zeros((Bp, Lq + 1, Lt_max + 1),
                                    dtype=bool)
                for b, i in enumerate(idxs):
                    for (pi, pj) in exclude.get(i, []):
                        V.exclude_alignment_mask(cell_off[b], pi, pj,
                                                 Lq, tmpl_list[i].L)
                if has_str:
                    # region masks also apply to the Viterbi stage
                    # (hhviterbirunner.cpp:156-165)
                    from .posterior import apply_exclstr

                    for b, i in enumerate(idxs):
                        apply_exclstr(cell_off[b], par.exclstr,
                                      par.template_exclstr, Lq,
                                      tmpl_list[i].L)

            ss_batch = None
            if ss_in_dp:
                ss_batch = np.zeros((Bp, Lq + 1, Lt_max + 1),
                                    dtype=np.float32)
                for b, t in enumerate(batch):
                    m = build_ss_score(q, t, ss_hmm_mode, par.ssw,
                                       S73, S37, S33)
                    ss_batch[b, :, : t.L + 1] = m

            if (bucket_lt is not None and not any_co
                    and ss_batch is None and bool(par.loc)
                    and Lq <= 512
                    and not _os.environ.get("HHSUITE_TPU_NO_BT_LANES")):
                # hot path: defer to ONE multi-bucket dispatch after
                # the loop (fused BT lanes kernel + on-device words
                # walk; bit-exact paths vs the parity kernel,
                # test_viterbi_lanes_bt.py)
                hot.append((len(pending), tp_all, ttr_all, tL_all,
                            gidx, _pnul_lanes(idxs, Bp),
                            Lq + Lt_max + 1))
                pending.append((idxs, batch, ss_hmm_mode,
                                (None, Lq + Lt_max + 1)))
                continue
            if (bucket_lt is not None and excl_iv is not None
                    and ss_batch is None and bool(par.loc)):
                # altali pass: defer to ONE multi-bucket dispatch after
                # the loop (mask build + rows kernel + packed walk for
                # every bucket in a single jit call)
                hot_excl.append((len(pending),
                                 (tp_all, ttr_all, tL_all, gidx,
                                  _pnul_lanes(idxs, Bp)) + excl_iv,
                                 Lq + Lt_max + 1))
                pending.append((idxs, batch, ss_hmm_mode,
                                (None, Lq + Lt_max + 1)))
                continue
            if bucket_lt is not None:
                from ..profiling import annotate

                with annotate("viterbi_backtrace_pass"):
                    score, i2, j2, bt = _gathered_rows_kernel(
                        qp_use, qtr_use,
                        tp_all, ttr_all, tL_all, gidx,
                        _pnul_lanes(idxs, Bp),
                        cell_off if any_co else None,
                        np.float32(par.shift), local=bool(par.loc),
                        tb=32, ss_batch=ss_batch,
                        Lq_true=np.int32(q.L))
            else:
                score, i2, j2, bt = _dispatch_kernel(
                    q.p.astype(np.float32), q.tr.astype(np.float32),
                    tp, ttr, cell_off if any_co else None, t_L,
                    float(par.shift), float(par.egq), float(par.egt),
                    ss_batch, bool(par.loc))
            if _on_tpu():
                # decode the backtrace on device: only an int8 state
                # string + header crosses the device->host link per
                # lane (positions rebuilt host-side), not the
                # O(B*Lq*Lt) byte matrices — ONE packed transfer per
                # batch, fetched in phase 2
                packed_d = V._backtrace_walk_packed8(
                    bt, i2, j2, score, kmax=Lq + Lt_max + 1)
                pending.append((idxs, batch, ss_hmm_mode,
                                (packed_d, Lq + Lt_max + 1)))
            else:
                pending.append((idxs, batch, ss_hmm_mode,
                                (np.asarray(score), np.asarray(i2),
                                 np.asarray(j2), np.asarray(bt))))

        bigs: Dict[str, object] = {}
        bigs_np: Dict[str, np.ndarray] = {}
        spans: Dict[int, Tuple[str, int, int, int]] = {}
        if hot:
            from ..profiling import annotate

            with annotate("viterbi_backtrace_pass"):
                if len(hot) == 1:
                    k, tp_a, ttr_a, tL_a, gi, pn, km = hot[0]
                    pd = _gathered_bt_lanes_kernel(
                        qp_use, qtr_use, tp_a, ttr_a, tL_a, gi, pn,
                        np.float32(par.shift), np.int32(q.L), km,
                        gi.shape[0])
                    pending[k] = pending[k][:3] + ((pd, km),)
                else:
                    Wmax = max(12 + km for *_x, km in hot)
                    parts = tuple((tp_a, ttr_a, tL_a, gi, pn)
                                  for _k, tp_a, ttr_a, tL_a, gi, pn, _km
                                  in hot)
                    kmaxes = tuple(km for *_x, km in hot)
                    bigs["hot"] = _gathered_bt_lanes_multi(
                        qp_use, qtr_use, parts, np.float32(par.shift),
                        np.int32(q.L), kmaxes, Wmax)
                    start_host_copy(bigs["hot"])
                    r0 = 0
                    for (k, _tp, _ttr, _tL, gi, _pn, km) in hot:
                        spans[k] = ("hot", r0, gi.shape[0], 12 + km)
                        r0 += gi.shape[0]
        if hot_excl:
            from ..profiling import annotate

            with annotate("viterbi_backtrace_pass"):
                if len(hot_excl) == 1:
                    k, args, km = hot_excl[0]
                    pd = _gathered_rows_excl_kernel(
                        qp_use, qtr_use, *args,
                        np.float32(par.shift), np.int32(q.L),
                        km, local=True, tb=32)
                    pending[k] = pending[k][:3] + ((pd, km),)
                else:
                    Wmax = max(12 + km for _k, _a, km in hot_excl)
                    parts = tuple(a for _k, a, _km in hot_excl)
                    kmaxes = tuple(km for _k, _a, km in hot_excl)
                    bigs["excl"] = _gathered_rows_excl_multi(
                        qp_use, qtr_use, parts, np.float32(par.shift),
                        np.int32(q.L), kmaxes, Wmax)
                    start_host_copy(bigs["excl"])
                    r0 = 0
                    for (k, a, km) in hot_excl:
                        nrows = a[3].shape[0]
                        spans[k] = ("excl", r0, nrows, 12 + km)
                        r0 += nrows
        stage_add("host_vit_dispatch", _time.perf_counter() - _t_p1)
        # ---- fetch scheduling: r3 coalesced every batch's payload
        # into one device concat to dodge a presumed per-fetch link
        # round-trip; r5 measurement showed computed outputs are pushed
        # to host asynchronously (fetches are ~free) while every
        # DISPATCH costs ~30-40 ms of non-pipelined tunnel latency —
        # so the pad+concat dispatches were a net LOSS.  Default is
        # now a plain async copy per payload; HHSUITE_TPU_COALESCE=1
        # restores the old device-side concat for link profiles where
        # per-fetch latency does dominate.  Hot-path (multi-dispatch)
        # entries carry a None placeholder payload and resolve through
        # the span table instead. ----
        dev_entries = [(k, p[3][0], p[3][1]) for k, p in
                       enumerate(pending)
                       if len(p[3]) == 2 and p[3][0] is not None]
        if not _os.environ.get("HHSUITE_TPU_COALESCE") or bigs:
            for _k, pd, _km in dev_entries:
                start_host_copy(pd)
            dev_entries = []
        if len(dev_entries) > 1:
            import jax.numpy as jnp

            Wmax = max(12 + km for (_k, _pd, km) in dev_entries)
            parts, r0 = [], 0
            for k, pd, km in dev_entries:
                W = 12 + km
                parts.append(pd if W == Wmax
                             else jnp.pad(pd, ((0, 0), (0, Wmax - W))))
                spans[k] = ("coal", r0, pd.shape[0], W)
                r0 += pd.shape[0]
            bigs["coal"] = jnp.concatenate(parts, axis=0)
            start_host_copy(bigs["coal"])
        elif dev_entries:
            start_host_copy(dev_entries[0][1])

        def _fetch_payload(entry_k, payload):
            if entry_k in spans:
                src, r0, nrows, W = spans[entry_k]
                if src not in bigs_np:
                    bigs_np[src] = np.asarray(bigs[src])
                return np.ascontiguousarray(
                    bigs_np[src][r0: r0 + nrows, :W])
            return np.ascontiguousarray(np.asarray(payload[0]))

        from ..native import load as _load_native
        from ..profiling import annotate

        nat = _load_native()
        q_p32 = np.ascontiguousarray(q.p, dtype=np.float32)
        for entry_k, (idxs, batch, ss_hmm_mode, payload) \
                in enumerate(pending):
            # ---- native fast path: fetch payload, then decode + walk +
            # rescore + correlation term in ONE C call per batch (the
            # per-hit Python loop was ~40% of end-to-end wall at the
            # 8192-template point); bit-identical to the loop below ----
            if (len(payload) == 2 and ss_hmm_mode == NO_SS_INFORMATION
                    and nat is not None
                    and hasattr(nat, "vit_decode_rescore")):
                with annotate("viterbi_fetch_wait"):
                    _t_f = _time.perf_counter()
                    packed_np = _fetch_payload(entry_k, payload)
                    if _os.environ.get("HHSUITE_TPU_DEBUG_BATCH"):
                        bp = ("multi" if payload[0] is None
                              else payload[0].shape[0])
                        print(f"[batch] n={len(idxs)} Bp={bp} "
                              f"kmax={payload[1]} "
                              f"fetch={_time.perf_counter() - _t_f:.3f}s",
                              flush=True)
                _t_hb = _time.perf_counter()
                # raw handouts ship their pnul for the in-C division;
                # divided lanes get an all-ones row (x / 1.0f == x)
                nb_real = len(idxs)
                t_ps = [batch[b].p for b in range(nb_real)]
                pn = None
                if any(not getattr(batch[b], "p_divided", True)
                       for b in range(nb_real)):
                    pn = np.ones((nb_real, 20), np.float32)
                    for b in range(nb_real):
                        if not getattr(batch[b], "p_divided", True):
                            pn[b] = batch[b].pnul_used
                dec = V.decode_rescore_native(
                    packed_np, payload[1], q_p32, t_ps,
                    par.corr, nat, pnul=pn)
                sc_l = dec.score.tolist()
                n_l = dec.n.tolist()
                m_l = dec.matched.tolist()
                i2_l = dec.i2.tolist()
                j2_l = dec.j2.tolist()
                for b, tid in enumerate(idxs):
                    t = batch[b]
                    nb = n_l[b]
                    sc = sc_l[b]
                    hit = Hit()
                    hit.init_from_hmm(q, t, par.nseqdis, par.ssm)
                    hit.entry = templates[tid][0]
                    hit.file = t.file
                    hit.lastrep = 1 if sc <= smin else 0
                    hit.score = sc
                    hit.score_ss = 0.0
                    hit.score_aass = -sc
                    # VIEWS into the batch decode arrays, not copies:
                    # a batch's hits collectively pin its ~10 MB of
                    # (Bp, K1) arrays until the query's hits are
                    # released — a deliberate trade (per-hit copies
                    # were ~40% of wall here); nothing writes through
                    # these (realign reassigns fresh arrays)
                    hit.S = dec.S2[b, : nb + 1]
                    hit.S_ss = dec.zss[: nb + 1]
                    hit.i = dec.ii2[b, : nb + 1]
                    hit.j = dec.jj2[b, : nb + 1]
                    hit.states = dec.st2[b, : nb + 1]
                    hit.nsteps = nb
                    hit.matched_cols = m_l[b]
                    hit.i1 = int(dec.ii2[b, nb])
                    hit.j1 = int(dec.jj2[b, nb])
                    hit.i2 = i2_l[b]
                    hit.j2 = j2_l[b]
                    hit.irep = alignment + 1
                    hits.append(hit)
                    if sc > smin:
                        next_alive.append(tid)
                        exclude.setdefault(tid, []).append(
                            (hit.i.copy(), hit.j.copy()))
                stage_add("host_hitbuild",
                          _time.perf_counter() - _t_hb)
                continue
            if len(payload) == 2:
                with annotate("viterbi_fetch_wait"):
                    unpack = V.backtrace_walk_unpack8(
                        _fetch_payload(entry_k, payload), payload[1])
                score, i2, j2 = unpack.score, unpack.i2, unpack.j2
            else:
                unpack = None
                score, i2, j2, bt = payload

            # batched rescoring (no-SS case): ONE scalar_prod20 +
            # fast_log2 over every hit's MM steps concatenated —
            # row-independent ops, bit-identical to the per-hit calls
            batch_rescore = (ss_hmm_mode == NO_SS_INFORMATION
                             and nat is not None)
            decoded = []
            if batch_rescore:
                with annotate("host_decode_rescore"):
                    cat_q, cat_t = [], []
                    for b, tid in enumerate(idxs):
                        t = batch[b]
                        if unpack is not None:
                            i_steps, j_steps, states, matched_cols = \
                                unpack(b)
                        else:
                            i_steps, j_steps, states, matched_cols = \
                                V.backtrace(bt[b], int(i2[b]), int(j2[b]))
                        mm = states[1:] == V.MM
                        mi = i_steps[1:][mm]
                        mj = j_steps[1:][mm]
                        decoded.append((i_steps, j_steps, states,
                                        matched_cols, mm, len(mi)))
                        if len(mi):
                            cat_q.append(q.p[mi])
                            cat_t.append(_template_p(t)[mj])
                    if cat_q:
                        svals = fm.fast_log2(fm.scalar_prod20(
                            np.concatenate(cat_q), np.concatenate(cat_t)))
                    else:
                        svals = np.zeros(0, np.float32)
                    s_off = 0

            _t_hb = _time.perf_counter()
            for b, tid in enumerate(idxs):
                t = batch[b]
                if batch_rescore:
                    (i_steps, j_steps, states, matched_cols, mm,
                     nmi) = decoded[b]
                    nsteps = len(i_steps) - 1
                    S = np.zeros(nsteps + 1, dtype=np.float32)
                    S_ss = np.zeros(nsteps + 1, dtype=np.float32)
                    if nmi:
                        S[1:][mm] = svals[s_off: s_off + nmi]
                        s_off += nmi
                    sc_ss, corr_term = nat.backtrace_score_terms(
                        np.ascontiguousarray(S),
                        np.ascontiguousarray(S_ss), int(nsteps),
                        float(np.float32(par.corr)))
                    sc = np.float32(score[b])
                    if nsteps:
                        sc = np.float32(sc + np.float32(corr_term))
                    sc = float(sc)
                    sc_ss = float(np.float32(sc_ss))
                else:
                    if unpack is not None:
                        i_steps, j_steps, states, matched_cols = \
                            unpack(b)
                    else:
                        i_steps, j_steps, states, matched_cols = \
                            V.backtrace(bt[b], int(i2[b]), int(j2[b]))
                    sc, sc_ss, S, S_ss = score_for_backtrace(
                        q, t, float(score[b]), i_steps, j_steps, states,
                        ss_hmm_mode, par.ssw, par.ssm, par.corr,
                        S73, S37, S33)
                hit = Hit()
                hit.init_from_hmm(q, t, par.nseqdis, par.ssm)
                hit.entry = templates[tid][0]
                hit.file = t.file
                hit.lastrep = 1 if sc <= smin else 0
                hit.score = sc
                hit.score_ss = sc_ss
                hit.score_aass = -sc
                hit.S = S
                hit.S_ss = S_ss
                hit.i = i_steps
                hit.j = j_steps
                hit.states = states
                hit.nsteps = len(i_steps) - 1
                hit.matched_cols = matched_cols
                hit.i1 = int(i_steps[-1])
                hit.j1 = int(j_steps[-1])
                hit.i2 = int(i2[b])
                hit.j2 = int(j2[b])
                hit.irep = alignment + 1
                hits.append(hit)

                if sc > smin:
                    next_alive.append(tid)
                    exclude.setdefault(tid, []).append(
                        (i_steps.copy(), j_steps.copy()))
            stage_add("host_hitbuild", _time.perf_counter() - _t_hb)

    def _lanes_scores_dispatch(junk):
        """Dispatch the score-only lanes sweep for one junk; returns
        the pending (positions, n, device_scores) list WITHOUT
        fetching, so callers can queue several junks' sweeps and
        overlap their ~40 ms/dispatch link latency with other device
        work (the sweep is independent of any keep decision)."""
        from ..ops.viterbi_lanes import (viterbi_score_lanes,
                                         viterbi_score_lanes_fused)
        from ..profiling import annotate

        impl = _lanes_impl()

        interp = not _on_tpu()   # tests force the funnel on CPU
        # 4 lanes tiles (G=16 x 128) per dispatch: the fused sweep is
        # so fast (~300-550 GCUPS) that tunnel dispatch latency
        # (~30 ms/call, non-pipelined) dominates at SB=2048
        SB = 8192
        # Lq-bucketed kernel view (scores unaffected: padded rows
        # floor at ~-127+shift, below any real profile-pair score)
        qp_f, qtr_f = qp_use, qtr_use
        # chunking: plain SB slices, or (resident pack) per length
        # bucket so gathers draw from one bucket array at a time;
        # `positions` maps each chunk back into the junk-ordered
        # scores array
        if pack is not None:
            by_bucket: Dict[int, List[int]] = {}
            for posn, i in enumerate(junk):
                by_bucket.setdefault(pack.row_of[pack_names[i]][0],
                                     []).append(posn)
            chunks = [(lt, poss[s: s + SB])
                      for lt in sorted(by_bucket, reverse=True)
                      for poss in (by_bucket[lt],)
                      for s in range(0, len(poss), SB)]
        else:
            chunks = [(None, list(range(s, min(s + SB, len(junk)))))
                      for s in range(0, len(junk), SB)]
        pending = []             # dispatch all blocks, then fetch
        for bucket_lt, positions in chunks:
            idxs = [junk[p] for p in positions]
            batch = [tmpl_list[i] for i in idxs]
            # quantise the pad length and fix the sub-batch size so the
            # jit cache stays small across blocks/queries
            nb = len(batch)
            if bucket_lt is not None:
                # gathers are free to pad: quantize lanes to a power
                # of two for jit-cache stability
                Bp = min(SB, 1 << max(0, nb - 1).bit_length())
                Lt_max = bucket_lt
            else:
                Bp = SB if (nb < SB and len(junk) > SB) else nb
                Lt_max = max(128, -(-max(t.L for t in batch) // 128)
                             * 128)
            ss_hmm_mode = compute_ss_hmm_mode(q, batch) \
                if par.ssm == 2 else NO_SS_INFORMATION
            kw = {}
            if ss_hmm_mode != NO_SS_INFORMATION:
                lut, qidx, tidx = build_ss_lut(
                    q, batch, ss_hmm_mode, par.ssw, S73, S37, S33, Lt_max)
                if tidx.shape[0] < Bp:
                    tidx = np.pad(tidx, ((0, Bp - tidx.shape[0]),
                                         (0, 0)))
                kw = dict(ss_lut=lut, ss_qidx=qidx, ss_tidx=tidx)
            # default lane_groups=16 (2 vregs of ILP per ALU op) works
            # for any query length now that the kernel row-panels its
            # VMEM state; Si streams as bfloat16 (ranking-only scores,
            # survivors are re-scored exactly by the backtrace pass)
            from ..parallel.mesh import get_mesh, sharded_lanes_scores

            with annotate("viterbi_lanes_sweep"):
                if get_mesh() is not None:
                    tp, ttr, t_L = pack_templates(batch, Lt_max, B=Bp,
                                                  pooled=not interp)
                    sc = sharded_lanes_scores(qp_f, qtr_f, tp, ttr, t_L,
                                              np.float32(par.shift),
                                              ss_kw=kw or None,
                                              interpret=interp)
                elif bucket_lt is not None and not kw:
                    tp_all, ttr_all, tL_all, gidx = pack.gather_args(
                        bucket_lt, [pack_names[i] for i in idxs], Bp)
                    sc = _gathered_lanes_kernel(
                        qp_f, qtr_f, tp_all, ttr_all, tL_all, gidx,
                        _pnul_lanes(idxs, Bp),
                        np.float32(par.shift), interpret=interp,
                        impl=impl)
                elif not kw and impl in ("fused", "exact"):
                    tp, ttr, t_L = pack_templates(batch, Lt_max, B=Bp,
                                                  pooled=not interp)
                    sc = viterbi_score_lanes_fused(
                        qp_f, qtr_f, tp, ttr, t_L,
                        np.float32(par.shift),
                        si_mode="fast" if impl == "fused" else "exact",
                        interpret=interp)
                else:
                    tp, ttr, t_L = pack_templates(batch, Lt_max, B=Bp,
                                                  pooled=not interp)
                    sc = viterbi_score_lanes(qp_f, qtr_f, tp, ttr, t_L,
                                             np.float32(par.shift),
                                             interpret=interp, **kw)
            start_host_copy(sc)
            pending.append((positions, nb, sc))
        return pending

    def _lanes_scores_fetch(junk, pending) -> np.ndarray:
        from ..profiling import annotate

        scores = np.full(len(junk), -FLT_MAX, dtype=np.float32)
        with annotate("viterbi_lanes_sweep"):
            for positions, nidx, sc in pending:
                scores[np.asarray(positions, dtype=np.int64)] = \
                    np.asarray(sc)[:nidx]
        return scores

    def _lanes_scores(junk) -> np.ndarray:
        """Score-only sweep with the template-lanes kernel."""
        return _lanes_scores_fetch(junk, _lanes_scores_dispatch(junk))

    def _make_light_hit(tid: int, sc: float) -> Hit:
        t = tmpl_list[tid]
        hit = Hit()
        hit.init_from_hmm(q, t, par.nseqdis, par.ssm)
        hit.entry = templates[tid][0]
        hit.file = t.file
        hit.light = True
        hit.lastrep = 1
        hit.score = float(sc)
        hit.score_ss = 0.0
        hit.score_aass = -float(sc)
        hit.S = np.zeros(1, dtype=np.float32)
        hit.S_ss = np.zeros(1, dtype=np.float32)
        hit.i = np.zeros(1, dtype=np.int32)
        hit.j = np.zeros(1, dtype=np.int32)
        hit.states = np.zeros(1, dtype=np.int32)
        hit.nsteps = 0
        hit.matched_cols = 0
        hit.i1 = hit.i2 = hit.j1 = hit.j2 = 0
        hit.irep = 1
        return hit

    K_cap = 2 * max(par.Z, par.B, par.realign_max, par.z, par.b)
    use_funnel = (allow_funnel and _funnel_ok() and par.egq == 0.0
                  and par.egt == 0.0
                  and bool(par.loc) and q.L <= 512
                  and not (par.exclstr or par.template_exclstr)
                  and len(templates) > K_cap)
    funnel_scores: List[float] = []   # all pass-1 scores so far (global)
    funnel_on = True                  # dropped when a block keeps >=90%

    for alignment in range(par.altali):
        if not alive:
            break
        next_alive: List[int] = []
        # early-stopping block scheduling (hhviterbirunner.cpp:109-192):
        # in the first alignment pass, score prefilter-ordered blocks of
        # 2000 and stop once a block's quality sum drops below cutoff
        n_all = len(alive)
        block = 2000 if (alignment == 0 and par.early_stopping_filter) \
            else max(n_all, 1)
        # pre-dispatch EVERY junk's score sweep on real hardware: the
        # sweeps are independent of the keep decisions, so queueing
        # them all up front overlaps their ~40 ms/dispatch link
        # latency with the preceding junks' backtrace passes.  A
        # mid-loop early-stop or funnel-degeneracy fallback merely
        # wastes some queued score-only compute (cheap); semantics are
        # unchanged — each junk's scores are identical to the lazy
        # dispatch.  Kept lazy off-TPU (interpret-mode sweeps are the
        # expensive part of the CPU funnel tests).
        sweep_pre: Dict[int, Tuple[List[int], list]] = {}
        if alignment == 0 and use_funnel and funnel_on and _on_tpu():
            for js in range(0, n_all, block):
                jk = alive[js: js + block]
                jk.sort(key=lambda idx: -tmpl_list[idx].L)
                sweep_pre[js] = (jk, _lanes_scores_dispatch(jk))
        for jstart in range(0, n_all, block):
            if jstart in sweep_pre:
                junk = sweep_pre[jstart][0]
            else:
                junk = alive[jstart: jstart + block]
                # sort by length desc within the block (reference
                # sorts for thread utilization; here it makes padded
                # batches tight)
                junk.sort(key=lambda idx: -tmpl_list[idx].L)
            junk_hit_start = len(hits)
            if alignment == 0 and use_funnel and funnel_on:
                scores = (_lanes_scores_fetch(*sweep_pre[jstart])
                          if jstart in sweep_pre
                          else _lanes_scores(junk))
                funnel_scores.extend(scores.tolist())
                allsc = np.asarray(funnel_scores, dtype=np.float32)
                if len(allsc) > K_cap:
                    cutoff = float(np.partition(allsc, -K_cap)[-K_cap])
                else:
                    cutoff = -FLT_MAX
                # keep everything that can be displayed/realigned (the
                # running global top-K) or enter the altali loop (smin,
                # with margin for the missing corr/ss adjustments)
                keep = (scores >= cutoff) | (scores > par.smin - 2.0)
                full = [junk[k] for k in range(len(junk)) if keep[k]]
                _run_junk(full)
                for k in range(len(junk)):
                    if not keep[k]:
                        hits.append(_make_light_hit(junk[k],
                                                    float(scores[k])))
                if len(full) >= 0.9 * len(junk):
                    # funnel-degenerate workload (near-identical
                    # templates score above the keep thresholds): the
                    # score sweep filters nothing, so drop it for the
                    # remaining blocks — identical output, the lanes
                    # pass was only ever a work-skipping optimization
                    funnel_on = False
            else:
                _run_junk(junk)
            if alignment == 0 and par.early_stopping_filter:
                junk_hits = hits[junk_hit_start:]
                es = calculate_early_stop(par, q, junk_hits)
                if es < len(junk) * par.filter_thresh:
                    break
        alive = next_alive
    return hits


def promote_light_hits(par: Parameters, q: HMM, hitlist,
                       templates: List[Tuple[str, HMM]],
                       ss_matrices=None, merge_window: bool = True) -> bool:
    """Exactness backstop for the two-pass funnel.

    The funnel's raw-score top-K keeps 2x the display/realign caps as
    full hits, so normally every hit the user can see has a backtrace.
    But a light hit can still matter downstream if its E-value lands
    inside the MSA-merge window: mergeHitsToQuery walks hits up to
    Eval <= 100*par.e (hhblits.cpp:832-838), with no cap tied to
    Z/B/realign_max — on very deep hit lists (> 2*max(Z,B,realign_max)
    significant hits) the reference would merge alignments the funnel
    never backtraced.  After P/E-values are known, re-run the full
    Viterbi path (backtrace, rescoring, altali loop) for exactly those
    hits and splice the results in.

    Returns True if anything was promoted; the caller must then
    re-sort and recompute P-values / hhblits E-values, since promoted
    scores gain the correlation term (hhviterbi.cpp:243-252).
    """
    cap = max(par.Z, par.B)
    want = set()
    for rank, h in enumerate(hitlist):
        if getattr(h, "light", False) and (
                (merge_window and h.Eval <= 100.0 * par.e)
                or rank < cap):
            want.add(str(h.entry))
    if not want:
        return False
    sub = [(n, t) for (n, t) in templates if n in want]
    if not sub:
        return False
    hitlist.hits = [h for h in hitlist.hits
                    if not (getattr(h, "light", False)
                            and str(h.entry) in want)]
    hitlist.extend(viterbi_search(par, q, sub, ss_matrices=ss_matrices,
                                  allow_funnel=False))
    return True

