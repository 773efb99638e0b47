"""Template-lanes Pallas Viterbi (score-only fast path).

The rows kernel (viterbi_rows.py) maps template POSITIONS to vector
lanes, which forces the same-row GD/IM recurrences through an
O(log Lt)-step Kogge-Stone scan — ~60% of its runtime.  This kernel
instead maps TEMPLATES to lanes, the way the reference maps them to
SIMD lanes (src/hhviterbialgorithm.cpp:45-497, 4/8 f32 lanes/core):
each (8, 128) vreg holds 1024 independent templates, the grid walks
template columns j, and a `fori_loop` walks query rows i inside the
kernel.  Every DP recurrence is then a plain elementwise max/add
between loop-carried vregs and 5 per-column state arrays in VMEM —
no rolls, no scan, ~2x fewer vector ops per cell.

Score-only by design: the search funnel runs this kernel over ALL
prefiltered templates and re-runs the few hundred survivors that need
alignments through `viterbi_batch_rows(need_bt=True)` (mirroring the
reference's display/realign caps, src/hhdecl.cpp:165-169 B=Z=500).

Memory: the 5 state columns live in VMEM scratch, (Lq8, 8, 128) f32
each, so the kernel requires roughly (5*Lq8 + 2*Lq8) * 4 KiB of VMEM
(state + double-buffered Si block).  Callers should dispatch to the
rows kernel when `lq8 * 28 KiB` approaches the ~16 MiB VMEM budget
(Lq beyond ~450).
"""

from __future__ import annotations

import functools

import numpy as np

FLT_MAX = float(np.finfo(np.float32).max)
M2M, M2I, M2D, I2M, I2I, D2M, D2D = range(7)


def _round_up(x, m):
    return (x + m - 1) // m * m


@functools.partial(
    __import__("jax").jit,
    static_argnames=("unroll", "lane_groups", "interpret"))
def viterbi_score_lanes(qp, qtr, tp, ttr, t_L, shift, ss_score=None,
                        ss_lut=None, ss_qidx=None, ss_tidx=None,
                        unroll=4, lane_groups=8, interpret=False):
    """Best local Viterbi score per template (egq=egt=0, local mode).

    Same score semantics as ``viterbi_batch_rows(..., local=True)``;
    returns only the (B,) float32 score vector.  Padding lanes (zero
    profiles) and padded query rows are driven to -FLT_MAX through the
    Si matrix, so no per-lane length masks are needed (template
    padding is handled the same way as in the rows kernel).

    SS scoring (Viterbi::ScoreSS, hhviterbi.h:193-211) can be supplied
    two ways: a dense precomputed ``ss_score`` (B, Lq+1, Lt+1), or the
    device-side LUT form — ``ss_lut`` a flat f32 table already
    ssw-weighted, ``ss_qidx`` (Lq,) int32 per-query-row offsets into
    the table and ``ss_tidx`` (B, Lt) int32 per-template-column offsets
    with ss(b,i,j) = ss_lut[ss_qidx[i] + ss_tidx[b,j]].  The LUT form
    avoids materialising the (B, Lq, Lt) matrix on the host for the
    big score-only sweeps.
    """
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from .viterbi import _log2f4

    Lq = qp.shape[0] - 2
    Lt = tp.shape[1] - 2
    B = tp.shape[0]
    f32 = jnp.float32
    NEG = f32(-FLT_MAX)

    # lane_groups > 8 packs several (8,128) vregs per state array: more
    # independent work per ALU op to hide the row-to-row dependency
    # chain latency (costs proportionally more VMEM for the columns)
    G, BK = lane_groups, 128
    TILE = G * BK
    Bp = _round_up(B, TILE)
    nB = Bp // TILE
    U = unroll
    Lq8 = _round_up(Lq, max(8, U))

    # ---- Si = log2(profile dot) + shift (+ss), (nB, Lq8, Lt, 8, 128).
    # The einsum is arranged so its natural dot_general output order
    # (batch n, lhs-free i, rhs-free o/g/l) IS the layout the kernel
    # consumes: XLA then emits one dot with the log2/shift/pad-mask
    # epilogue fused, instead of dot + transpose + elementwise (3
    # passes over the O(B*Lq*Lt) tensor, ~60% of kernel runtime).
    qp1 = jnp.pad(qp[1:Lq + 1].astype(f32),
                  ((0, Lq8 - Lq), (0, 0)))               # (Lq8, 20)
    tp1 = tp[:, 1:Lt + 1].astype(f32)                    # (B, Lt, 20)
    tp1 = jnp.pad(tp1, ((0, Bp - B), (0, 0), (0, 0)))
    tpT = jnp.transpose(tp1.reshape(nB, G, BK, Lt, 20),
                        (0, 3, 4, 1, 2))                 # (nB,Lt,20,G,BK)
    qp_b = jnp.broadcast_to(qp1, (nB, Lq8, 20))
    dot = jnp.einsum("nia,noagl->niogl", qp_b, tpT,
                     preferred_element_type=f32)         # (nB,Lq8,Lt,8,128)
    Si = _log2f4(dot) + f32(shift)
    if ss_score is not None:
        ss = jnp.pad(ss_score[:, 1:, 1:], ((0, Bp - B), (0, Lq8 - Lq),
                                           (0, 0)))
        ss = ss.reshape(nB, G, BK, Lq8, Lt)
        Si = Si + jnp.transpose(ss, (0, 3, 4, 1, 2))
    elif ss_lut is not None:
        ti = jnp.pad(ss_tidx.astype(jnp.int32), ((0, Bp - B), (0, 0)))
        ti = jnp.transpose(ti.reshape(nB, G, BK, Lt),
                           (0, 3, 1, 2))[:, None]       # (nB,1,Lt,8,128)
        qi = ss_qidx.astype(jnp.int32)[None, :, None, None, None]
        qi = jnp.pad(qi, ((0, 0), (0, Lq8 - Lq), (0, 0), (0, 0), (0, 0)))
        Si = Si + jnp.take(ss_lut.astype(f32), qi + ti, axis=0)
    # padded query rows get -FLT_MAX so they can never win the best
    # tracker (local mode restarts at 0, so the pad must sit in Si);
    # the iota select fuses into the dot epilogue
    row = jax.lax.broadcasted_iota(jnp.int32, Si.shape, 1)
    Si = jnp.where(row < Lq, Si, NEG)

    # ---- template transitions per column j (cell column jj = j+1):
    # [M2M,D2M,I2M,M2D,D2D at jj-1; M2I,I2I at jj]
    ttr_f = ttr.astype(f32)
    ttr_f = jnp.pad(ttr_f, ((0, Bp - B), (0, 0), (0, 0)),
                    constant_values=-FLT_MAX)
    tv = jnp.stack([
        ttr_f[:, 0:Lt, M2M], ttr_f[:, 0:Lt, D2M], ttr_f[:, 0:Lt, I2M],
        ttr_f[:, 0:Lt, M2D], ttr_f[:, 0:Lt, D2D],
        ttr_f[:, 1:Lt + 1, M2I], ttr_f[:, 1:Lt + 1, I2I],
    ], axis=1)                                           # (Bp, 7, Lt)
    tvec = jnp.transpose(tv.reshape(nB, G, BK, 7, Lt), (0, 4, 3, 1, 2))
    # (nB, Lt, 7, 8, 128)

    # query transitions as SMEM scalars
    Lqp = _round_up(Lq + 2, 8)
    qtr_s = jnp.pad(qtr.astype(f32).T, ((0, 0), (0, Lqp - (Lq + 2))),
                    constant_values=-FLT_MAX)            # (7, Lqp)

    def kernel(si_ref, tv_ref, qtr_ref, out_ref,
               mm_c, gd_c, im_c, dg_c, mi_c, best_ref):
        j = pl.program_id(1)

        @pl.when(j == 0)
        def _():
            # old column jj-1 = 0 boundary: MM=0, others -inf
            # (hhviterbialgorithm.cpp:138-175 zero end-gap boundaries)
            mm_c[...] = jnp.zeros((Lq8, G, BK), f32)
            for c in (gd_c, im_c, dg_c, mi_c):
                c[...] = jnp.full((Lq8, G, BK), -FLT_MAX)
            best_ref[...] = jnp.full((G, BK), -FLT_MAX)

        tvv = tv_ref[0, 0]
        tm2m1 = tvv[0]
        td2m1 = tvv[1]
        ti2m1 = tvv[2]
        tm2d1 = tvv[3]
        td2d1 = tvv[4]
        tm2i0 = tvv[5]
        ti2i0 = tvv[6]

        zero = jnp.zeros((G, BK), f32)
        ninf = jnp.full((G, BK), -FLT_MAX)

        def body(k, carry):
            (mm_pn, dg_pn, mi_pn,          # NEW column, row i-1
             mm_po, gd_po, im_po, dg_po, mi_po,   # OLD column, row i-1
             best) = carry
            for u in range(U):
                i = k * U + u              # 0-based; cell row r = i+1
                qm2m1 = qtr_ref[M2M, i]
                qd2m1 = qtr_ref[D2M, i]
                qi2m1 = qtr_ref[I2M, i]
                qm2d1 = qtr_ref[M2D, i]
                qd2d1 = qtr_ref[D2D, i]
                qm2i0 = qtr_ref[M2I, i + 1]
                qi2i0 = qtr_ref[I2I, i + 1]

                mm_oi = mm_c[i]
                gd_oi = gd_c[i]
                im_oi = im_c[i]
                dg_oi = dg_c[i]
                mi_oi = mi_c[i]

                # MM[r][jj]: five predecessors at (r-1, jj-1); same
                # add grouping as the rows kernel for bit parity
                c_mm = (mm_po + qm2m1) + tm2m1
                best5 = jnp.maximum(f32(0.0), c_mm)
                best5 = jnp.maximum(best5, (gd_po + qm2m1) + td2m1)
                best5 = jnp.maximum(best5, (im_po + qi2m1) + tm2m1)
                best5 = jnp.maximum(best5, (dg_po + qd2m1) + tm2m1)
                best5 = jnp.maximum(best5, (mi_po + qm2m1) + ti2m1)
                mm_new = best5 + si_ref[0, i, 0]

                # DG/MI[r][jj]: predecessors at (r-1, jj), NEW column
                dg_new = jnp.maximum(mm_pn + qm2d1, dg_pn + qd2d1)
                mi_new = jnp.maximum(mm_pn + tm2i0,
                                     mi_pn + ti2i0) + qm2m1

                # GD/IM[r][jj]: predecessors at (r, jj-1), OLD column
                gd_new = jnp.maximum(mm_oi + tm2d1, gd_oi + td2d1)
                im_new = jnp.maximum(mm_oi + qm2i0,
                                     im_oi + qi2i0) + tm2m1

                best = jnp.maximum(best, mm_new)

                mm_c[i] = mm_new
                gd_c[i] = gd_new
                im_c[i] = im_new
                dg_c[i] = dg_new
                mi_c[i] = mi_new

                mm_pn, dg_pn, mi_pn = mm_new, dg_new, mi_new
                mm_po, gd_po, im_po = mm_oi, gd_oi, im_oi
                dg_po, mi_po = dg_oi, mi_oi
            return (mm_pn, dg_pn, mi_pn,
                    mm_po, gd_po, im_po, dg_po, mi_po, best)

        init = (zero, ninf, ninf,          # row 0, new column: MM=0
                zero, ninf, ninf, ninf, ninf,   # row 0, old column
                best_ref[...])
        res = jax.lax.fori_loop(0, Lq8 // U, body, init)
        best_ref[...] = res[-1]

        @pl.when(j == Lt - 1)
        def _():
            out_ref[0] = best_ref[...]

    grid = (nB, Lt)
    res = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, Lq8, 1, G, BK), lambda b, j: (b, 0, j, 0, 0)),
            pl.BlockSpec((1, 1, 7, G, BK), lambda b, j: (b, j, 0, 0, 0)),
            pl.BlockSpec((7, Lqp), lambda b, j: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, G, BK), lambda b, j: (b, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((nB, G, BK), f32),
        scratch_shapes=[
            pltpu.VMEM((Lq8, G, BK), f32),
            pltpu.VMEM((Lq8, G, BK), f32),
            pltpu.VMEM((Lq8, G, BK), f32),
            pltpu.VMEM((Lq8, G, BK), f32),
            pltpu.VMEM((Lq8, G, BK), f32),
            pltpu.VMEM((G, BK), f32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        interpret=interpret,
    )(Si, tvec, qtr_s)

    score = res.reshape(Bp)[:B]
    return jnp.maximum(score, NEG)
