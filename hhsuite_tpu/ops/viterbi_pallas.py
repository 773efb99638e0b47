"""Pallas TPU kernel for the 5-state Viterbi wavefront.

The lax.scan formulation keeps its carried state in HBM (~80 B/cell of
carry traffic) and one-diagonal-per-grid-step Pallas pays ~1 us of grid
overhead per ~0.2 us of compute.  This kernel therefore:

* keeps ALL wavefront state in VMEM scratch, persistent across the
  sequential grid (grid = (B/TB, D/DC));
* processes DC=64 anti-diagonals per grid step in an inner fori_loop, so
  the (double-buffered) match-score stream and the grid overhead are
  amortized;
* maintains the per-diagonal template-transition vectors as shift
  registers (`pltpu.roll` + insert at lane 0) — diagonal d+1's vector at
  lane i equals diagonal d's at lane i-1 — instead of gathers;
* builds the skewed match-score stream with a pad/reshape trick (pure
  strided copies, no gather): skew[b, i, i+j] = Si[b, i, j].

Numerics are identical to ops.viterbi.viterbi_batch (same per-cell
expressions); lane padding is masked.
"""

from __future__ import annotations

import functools

import numpy as np

FLT_MAX = float(np.finfo(np.float32).max)
M2M, M2I, M2D, I2M, I2I, D2M, D2D = range(7)
STOP, MM, GD, IM, DG, MI = 0, 2, 3, 4, 5, 6


def _round_up(x, m):
    return (x + m - 1) // m * m


@functools.partial(
    __import__("jax").jit,
    static_argnames=("local", "need_bt", "tb", "interpret",
                     "penalty_gap_query", "penalty_gap_template"))
def viterbi_batch_pallas(qp, qtr, tp, ttr, cell_off, t_L, shift,
                         smin_local, penalty_gap_query=0.0,
                         penalty_gap_template=0.0, ss_score=None,
                         local=True, need_bt=True, tb=8, interpret=False):
    """Same contract as ops.viterbi.viterbi_batch, Pallas TPU backend."""
    import jax
    import jax.numpy as jnp
    from jax import lax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from .viterbi import _log2f4

    Lq = qp.shape[0] - 2
    Lt = tp.shape[1] - 2
    B = tp.shape[0]
    D = Lq + Lt - 1              # diagonals d = 2 .. Lq+Lt
    Wi = Lq + 1
    Wp = _round_up(Wi, 128)
    TB = min(tb, B)
    Bp = _round_up(B, TB)
    DC = 64
    Dp = _round_up(D, DC)
    f32 = jnp.float32
    NEG = f32(-FLT_MAX)
    pqv = float(penalty_gap_query)
    ptv = float(penalty_gap_template)

    # ---- Si (MXU) + fast skew (pad/reshape, no gather) ----
    def _skew_fast(x):
        b_, r_, c_ = x.shape
        w_ = r_ + c_
        xp = jnp.pad(x, ((0, 0), (0, 0), (0, r_ + 1)))
        return xp.reshape(b_, r_ * (w_ + 1))[:, : r_ * w_] \
            .reshape(b_, r_, w_)

    def _diag_stream(x):
        """(Bp, Wp, C) -> (Dp, Bp, Wp) rows = diagonals d-2."""
        skv = _skew_fast(x)                      # (Bp, Wp, Wp+C)
        t = jnp.transpose(skv, (2, 0, 1))        # (Wp+C, Bp, Wp)
        need = 2 + Dp
        if t.shape[0] < need:
            t = jnp.pad(t, ((0, need - t.shape[0]), (0, 0), (0, 0)))
        return lax.dynamic_slice_in_dim(t, 2, Dp, axis=0)

    dot = jnp.einsum("ia,bja->bij", qp[1:Lq + 1], tp[:, 1:Lt + 1],
                     preferred_element_type=jnp.float32)
    Si = _log2f4(dot) + f32(shift)
    if ss_score is not None:
        Si = Si + ss_score[:, 1:, 1:]
    Si = jnp.pad(Si, ((0, 0), (1, 0), (1, 0)))
    co_add = jnp.where(cell_off, NEG, f32(0.0))
    sico_p = jnp.pad(Si + co_add, ((0, Bp - B), (0, Wp - Wi), (0, 0)))
    sico_d = _diag_stream(sico_p)
    co_p = jnp.pad(co_add, ((0, Bp - B), (0, Wp - Wi), (0, 0)))
    co_d = _diag_stream(co_p)

    # q transitions per lane (Wp,) f32
    iidx = np.arange(Wp)
    idx_m1 = jnp.asarray(np.maximum(iidx - 1, 0).clip(0, Lq + 1))
    idx_0 = jnp.asarray(iidx.clip(0, Lq + 1))
    qvecs = jnp.stack([
        qtr[idx_m1, M2M], qtr[idx_m1, D2M], qtr[idx_m1, I2M],
        qtr[idx_m1, M2D], qtr[idx_m1, D2D],
        qtr[idx_0, M2I], qtr[idx_0, I2I],
    ]).astype(jnp.float32)                       # (7, Wp)

    # template transitions padded (for shift-register init)
    Ltp2 = _round_up(Lt + 2, 128)
    ttr_p = jnp.pad(ttr.transpose(0, 2, 1),
                    ((0, Bp - B), (0, 0), (0, Ltp2 - (Lt + 2))),
                    constant_values=-FLT_MAX)

    # per-diagonal new shift-register elements entering lane 0:
    # news[t, b, r] = ttr[b, col_r, (t+2) + off_r], t = 0..Dp-1
    cols_np = np.array([M2M, D2M, I2M, M2D, D2D, M2I, I2I])
    offs_np = np.array([-1, -1, -1, -1, -1, 0, 0])
    dnew = (np.arange(Dp) + 2)[:, None] + offs_np[None, :]
    dnew_ok = (dnew >= 0) & (dnew <= Lt + 1)
    dnew_c = np.clip(dnew, 0, Ltp2 - 1)
    news = ttr_p[:, jnp.asarray(cols_np)[None, :], jnp.asarray(dnew_c)]
    news = jnp.where(jnp.asarray(dnew_ok)[None], news, NEG)
    news = jnp.transpose(news, (1, 0, 2))        # (Dp, Bp, 7)
    news = jnp.pad(news, ((0, 0), (0, 0), (0, 128 - 7)))

    sminf = 0.0 if local else -FLT_MAX
    n_btiles = Bp // TB
    n_dchunks = Dp // DC

    def kernel(sico_ref, co_ref, qv_ref, ttr_ref, news_ref,
               score_ref, bi_ref, bj_ref, bt_ref,
               st_ref, tdiag_ref, best_ref):
        c_idx = pl.program_id(1)
        lanes = jax.lax.broadcasted_iota(jnp.int32, (TB, Wp), 1)

        @pl.when(c_idx == 0)
        def _():
            for s in range(10):
                st_ref[s] = jnp.full((TB, Wp), -FLT_MAX)
            mm_d1 = jnp.where(lanes == 0, -1.0 * ptv,
                              jnp.where(lanes == 1, -1.0 * pqv,
                                        -FLT_MAX))
            mm_d0 = jnp.where(lanes == 0, 0.0, -FLT_MAX)
            st_ref[0] = mm_d1
            st_ref[5] = mm_d0
            cols0 = (M2M, D2M, I2M, M2D, D2D, M2I, I2I)
            offs0 = (-1, -1, -1, -1, -1, 0, 0)
            for r in range(7):
                v0 = jnp.zeros((TB, Wp), f32)
                j_l0 = 1 + offs0[r]
                v_l0 = ttr_ref[:, cols0[r], j_l0][:, None]
                v0 = jnp.where(lanes == 0, v_l0, v0)
                j_l1 = 0 + offs0[r]
                if j_l1 >= 0:
                    v_l1 = ttr_ref[:, cols0[r], j_l1][:, None]
                    v0 = jnp.where(lanes == 1, v_l1, v0)
                else:
                    v0 = jnp.where(lanes == 1, -FLT_MAX, v0)
                tdiag_ref[r] = v0
            best_ref[0] = jnp.full((TB, 128), -FLT_MAX)
            best_ref[1] = jnp.zeros((TB, 128), f32)
            best_ref[2] = jnp.zeros((TB, 128), f32)

        qv = qv_ref[...]
        qm2m = qv[0][None, :]
        qd2m = qv[1][None, :]
        qi2m = qv[2][None, :]
        qm2d = qv[3][None, :]
        qd2d = qv[4][None, :]
        qm2i = qv[5][None, :]
        qi2i = qv[6][None, :]

        def up(x):
            r = pltpu.roll(x, 1, 1)
            return jnp.where(lanes == 0, -FLT_MAX, r)

        def body(t, _):
            d = c_idx * DC + t + 2

            newvals = news_ref[t]                # (TB, 128)
            tcur = []
            for r in range(7):
                rolled = pltpu.roll(tdiag_ref[r], 1, 1)
                v = jnp.where(lanes == 0, newvals[:, r][:, None], rolled)
                tdiag_ref[r] = v
                tcur.append(v)
            tm2m1, td2m1, ti2m1, tm2d1, td2d1, tm2i0, ti2i0 = tcur

            mm1 = st_ref[0]
            dg1 = st_ref[1]
            mi1 = st_ref[2]
            gd1 = st_ref[3]
            im1 = st_ref[4]
            mm2 = st_ref[5]
            dg2 = st_ref[6]
            mi2 = st_ref[7]
            gd2 = st_ref[8]
            im2 = st_ref[9]

            c_mm = up(mm2) + qm2m + tm2m1
            best5 = jnp.maximum(sminf, c_mm)
            code = jnp.where(c_mm > sminf, MM, STOP)
            c_gd = up(gd2) + qm2m + td2m1
            code = jnp.where(c_gd > best5, GD, code)
            best5 = jnp.maximum(best5, c_gd)
            c_im = up(im2) + qi2m + tm2m1
            code = jnp.where(c_im > best5, IM, code)
            best5 = jnp.maximum(best5, c_im)
            c_dg = up(dg2) + qd2m + tm2m1
            code = jnp.where(c_dg > best5, DG, code)
            best5 = jnp.maximum(best5, c_dg)
            c_mi = up(mi2) + qm2m + ti2m1
            code = jnp.where(c_mi > best5, MI, code)
            best5 = jnp.maximum(best5, c_mi)
            mm_new = best5 + sico_ref[t]

            co = co_ref[t]
            a_dg = up(mm1) + qm2d
            b_dg = up(dg1) + qd2d
            bit_dg = a_dg > b_dg
            dg_new = jnp.maximum(a_dg, b_dg) + co
            a_mi = up(mm1) + qm2m + tm2i0
            b_mi = up(mi1) + qm2m + ti2i0
            bit_mi = a_mi > b_mi
            mi_new = jnp.maximum(a_mi, b_mi) + co
            a_gd = mm1 + tm2d1
            b_gd = gd1 + td2d1
            bit_gd = a_gd > b_gd
            gd_new = jnp.maximum(a_gd, b_gd) + co
            a_im = mm1 + qm2i + tm2m1
            b_im = im1 + qi2i + tm2m1
            bit_im = a_im > b_im
            im_new = jnp.maximum(a_im, b_im) + co

            j_lane = d - lanes
            on = (lanes >= 1) & (j_lane >= 1) & (j_lane <= Lt) \
                & (lanes <= Lq)
            mm0 = jnp.where(lanes == 0, -j_lane.astype(f32) * ptv,
                            jnp.where(j_lane == 0,
                                      -lanes.astype(f32) * pqv,
                                      -FLT_MAX))
            mm0 = jnp.where((j_lane < 0) | (j_lane > Lt) | (lanes > Lq),
                            -FLT_MAX, mm0)
            negfull = jnp.full((TB, Wp), -FLT_MAX)
            mm_new = jnp.where(on, mm_new, mm0)
            dg_new = jnp.where(on, dg_new, negfull)
            mi_new = jnp.where(on, mi_new, negfull)
            gd_new = jnp.where(on, gd_new, negfull)
            im_new = jnp.where(on, im_new, negfull)

            byte = (code
                    | jnp.where(bit_gd, 8, 0)
                    | jnp.where(bit_im, 16, 0)
                    | jnp.where(bit_dg, 32, 0)
                    | jnp.where(bit_mi, 64, 0))
            byte = jnp.where(on, byte, 0)
            bt_ref[t] = byte.astype(jnp.int32)

            st_ref[5] = mm1
            st_ref[6] = dg1
            st_ref[7] = mi1
            st_ref[8] = gd1
            st_ref[9] = im1
            st_ref[0] = mm_new
            st_ref[1] = dg_new
            st_ref[2] = mi_new
            st_ref[3] = gd_new
            st_ref[4] = im_new

            if local:
                cand_on = on
            else:
                cand_on = on & ((j_lane == Lt) | (lanes == Lq))
            cand = jnp.where(cand_on, mm_new, -FLT_MAX)
            row_max = jnp.max(cand, axis=1, keepdims=True)
            is_max = (cand == row_max) & cand_on
            big = jnp.where(is_max, lanes, Wp + 1)
            row_i = jnp.min(big, axis=1, keepdims=True)
            row_maxb = jnp.broadcast_to(row_max, (TB, 128))
            row_ib = jnp.broadcast_to(row_i.astype(f32), (TB, 128))
            best = best_ref[0]
            best_i = best_ref[1]
            upd = (row_maxb > best) | ((row_maxb == best)
                                       & (row_ib < best_i))
            best_ref[0] = jnp.where(upd, row_maxb, best)
            best_ref[1] = jnp.where(upd, row_ib, best_i)
            best_ref[2] = jnp.where(upd, d.astype(f32) - row_ib,
                                    best_ref[2])
            return 0

        jax.lax.fori_loop(0, DC, body, 0)

        @pl.when(c_idx == n_dchunks - 1)
        def _():
            score_ref[0] = best_ref[0][:, :1]
            bi_ref[0] = best_ref[1][:, :1]
            bj_ref[0] = best_ref[2][:, :1]

    grid = (n_btiles, n_dchunks)
    out_shape = (
        jax.ShapeDtypeStruct((n_btiles, TB, 1), jnp.float32),
        jax.ShapeDtypeStruct((n_btiles, TB, 1), jnp.float32),
        jax.ShapeDtypeStruct((n_btiles, TB, 1), jnp.float32),
        jax.ShapeDtypeStruct((Dp, Bp, Wp), jnp.int32),
    )
    res = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((DC, TB, Wp), lambda b, c: (c, b, 0)),
            pl.BlockSpec((DC, TB, Wp), lambda b, c: (c, b, 0)),
            pl.BlockSpec((7, Wp), lambda b, c: (0, 0)),
            pl.BlockSpec((TB, 7, Ltp2), lambda b, c: (b, 0, 0)),
            pl.BlockSpec((DC, TB, 128), lambda b, c: (c, b, 0)),
        ],
        out_specs=(
            pl.BlockSpec((1, TB, 1), lambda b, c: (b, 0, 0)),
            pl.BlockSpec((1, TB, 1), lambda b, c: (b, 0, 0)),
            pl.BlockSpec((1, TB, 1), lambda b, c: (b, 0, 0)),
            pl.BlockSpec((DC, TB, Wp), lambda b, c: (c, b, 0)),
        ),
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((10, TB, Wp), jnp.float32),
            pltpu.VMEM((7, TB, Wp), jnp.float32),
            pltpu.VMEM((3, TB, 128), jnp.float32),
        ],
        interpret=interpret,
    )(sico_d, co_d, qvecs, ttr_p, news)
    score_t, bi_t, bj_t, bt_diag = res

    score = score_t.reshape(Bp)[:B]
    best_i = bi_t.reshape(Bp)[:B].astype(jnp.int32)
    best_j = bj_t.reshape(Bp)[:B].astype(jnp.int32)

    if need_bt:
        # inverse skew: bt[b, i, j] = bt_diag[i + j - 2, b, i]
        m = jnp.transpose(bt_diag, (1, 2, 0))     # (Bp, Wp, Dp)
        m = jnp.pad(m, ((0, 0), (0, 0), (2, 0)))  # column index = i + j
        Wd2 = Dp + 2
        flat = m.reshape(Bp, Wp * Wd2)
        flat = jnp.pad(flat, ((0, 0), (0, Wp)))
        un = flat.reshape(Bp, Wp, Wd2 + 1)[:, :, : Lt + 1]
        bt = un[:B, :Wi, :].astype(jnp.uint8)
        bt = bt.at[:, 0, :].set(0)
        bt = bt.at[:, :, 0].set(0)
    else:
        bt = jnp.zeros((B, 1, 1), dtype=jnp.uint8)
    return score, best_i, best_j, bt
