"""Lean Pallas Viterbi wavefront, lane = template position j.

With lanes indexed by j (not i), the seven template transitions are
CONSTANT per lane across diagonals — no shift registers, no per-step
transition stream.  The query transitions (shared by the whole batch)
become the shifting quantity: seven (8, Wp) shift registers rolled once
per diagonal with a scalar insert from SMEM.  Best-cell tracking is a
2-op running per-lane max; the row-major tie-break reduction runs outside
the kernel on the (B, Wp) per-lane results.

Cell-off corridors are a separate (static) variant so the common
no-exclusion case pays nothing for them.
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
    static_argnames=("local", "need_bt", "tb", "interpret", "dc"))
def viterbi_batch_pallas2(qp, qtr, tp, ttr, cell_off, t_L, shift,
                          ss_score=None, local=True, need_bt=True,
                          tb=8, dc=64, interpret=False):
    """Contract of ops.viterbi.viterbi_batch (egq=egt=0 assumed).

    Returns (score, i2, j2, bt) with bt (B, Lq+1, Lt+1) uint8.
    """
    import jax
    import jax.numpy as jnp
    from jax import lax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from .viterbi import _log2f4

    Lq = qp.shape[0] - 2
    Lt = tp.shape[1] - 2
    B = tp.shape[0]
    D = Lq + Lt - 1
    Wj = Lt + 1
    Wp = _round_up(Wj, 128)
    TB = min(tb, B)
    Bp = _round_up(B, TB)
    DC = dc
    Dp = _round_up(D, DC)
    f32 = jnp.float32
    NEG = f32(-FLT_MAX)

    # ---- Si + cell-off (MXU + fused elementwise), j-major, skewed ----
    def _skew_fast(x):
        b_, r_, c_ = x.shape
        w_ = r_ + c_
        xp = jnp.pad(x, ((0, 0), (0, 0), (0, r_ + 1)))
        return xp.reshape(b_, r_ * (w_ + 1))[:, : r_ * w_] \
            .reshape(b_, r_, w_)

    def _diag_stream(xjmaj):
        """(Bp, Wp(j), Lq+1(i)) -> (Dp, Bp, Wp): row t = diagonal t+2."""
        skv = _skew_fast(xjmaj)                   # skv[b, j, j+i]
        t = jnp.transpose(skv, (2, 0, 1))
        need = 2 + Dp
        if t.shape[0] < need:
            t = jnp.pad(t, ((0, need - t.shape[0]), (0, 0), (0, 0)))
        return lax.dynamic_slice_in_dim(t, 2, Dp, axis=0)

    dot = jnp.einsum("ia,bja->bji", qp[1:Lq + 1], tp[:, 1:Lt + 1],
                     preferred_element_type=jnp.float32)   # (B, Lt, Lq)
    Si = _log2f4(dot) + f32(shift)
    if ss_score is not None:
        Si = Si + jnp.transpose(ss_score[:, 1:, 1:], (0, 2, 1))
    Si = jnp.pad(Si, ((0, 0), (1, 0), (1, 0)))             # (B, Wj, Lq+1)
    has_co = cell_off is not None
    if has_co:
        co_add = jnp.where(jnp.transpose(cell_off, (0, 2, 1)), NEG,
                           f32(0.0))
        Si = Si + co_add
    sico_p = jnp.pad(Si, ((0, Bp - B), (0, Wp - Wj), (0, 0)))
    sico_d = _diag_stream(sico_p)
    if has_co:
        co_p = jnp.pad(co_add, ((0, Bp - B), (0, Wp - Wj), (0, 0)))
        co_d = _diag_stream(co_p)
    else:
        co_d = jnp.zeros((1, 1, 128), f32)      # placeholder

    # template transitions: constant per lane j (broadcast over diag)
    jidx = np.arange(Wp)
    jm1 = jnp.asarray(np.maximum(jidx - 1, 0).clip(0, Lt + 1))
    j0 = jnp.asarray(jidx.clip(0, Lt + 1))
    ttr_f = ttr.astype(jnp.float32)
    tvec = jnp.stack([
        ttr_f[:, :, M2M][:, jm1], ttr_f[:, :, D2M][:, jm1],
        ttr_f[:, :, I2M][:, jm1], ttr_f[:, :, M2D][:, jm1],
        ttr_f[:, :, D2D][:, jm1],
        ttr_f[:, :, M2I][:, j0], ttr_f[:, :, I2I][:, j0],
    ], axis=1)                                   # (B, 7, Wp)
    tvec = jnp.pad(tvec, ((0, Bp - B), (0, 0), (0, 0)))

    # query transitions into SMEM-friendly (7, Lqp) f32
    Lqp = _round_up(Lq + 2, 8)
    qtr_s = jnp.pad(qtr.astype(jnp.float32).T,
                    ((0, 0), (0, Lqp - (Lq + 2))),
                    constant_values=-FLT_MAX)     # (7, Lqp)

    sminf = 0.0 if local else -FLT_MAX
    n_btiles = Bp // TB
    n_dchunks = Dp // DC

    def kernel(*refs):
        if has_co:
            (sico_ref, co_ref, tv_ref, qtr_ref,
             bestS_ref, bestD_ref, bt_ref,
             st_ref, qreg_ref, bl_ref) = refs
        else:
            (sico_ref, tv_ref, qtr_ref,
             bestS_ref, bestD_ref, bt_ref,
             st_ref, qreg_ref, bl_ref) = refs
        c_idx = pl.program_id(1)
        lanes = jax.lax.broadcasted_iota(jnp.int32, (TB, Wp), 1)
        lanes8 = jax.lax.broadcasted_iota(jnp.int32, (8, Wp), 1)

        @pl.when(c_idx == 0)
        def _():
            for s in range(10):
                st_ref[s] = jnp.full((TB, Wp), -FLT_MAX)
            # d=1: mm(0,1) lane j=1 value 0-pen(=0 here); mm(1,0) lane 0
            mm_d1 = jnp.where((lanes == 0) | (lanes == 1), 0.0, -FLT_MAX)
            mm_d0 = jnp.where(lanes == 0, 0.0, -FLT_MAX)
            st_ref[0] = mm_d1
            st_ref[5] = mm_d0
            # q shift registers at d-1=1: lane j holds qtr[1-j+off]
            offs0 = (-1, -1, -1, -1, -1, 0, 0)
            rows0 = (M2M, D2M, I2M, M2D, D2D, M2I, I2I)
            for r in range(7):
                v0 = jnp.full((8, Wp), -FLT_MAX)
                i_l0 = 1 + offs0[r]
                v0 = jnp.where(lanes8 == 0, qtr_ref[rows0[r], i_l0], v0)
                i_l1 = offs0[r]
                if i_l1 >= 0:
                    v0 = jnp.where(lanes8 == 1, qtr_ref[rows0[r], i_l1],
                                   v0)
                qreg_ref[r] = v0
            bl_ref[0] = jnp.full((TB, Wp), -FLT_MAX)   # per-lane best
            bl_ref[1] = jnp.zeros((TB, Wp), f32)       # its diagonal

        tv = tv_ref[...]
        tm2m1 = tv[:, 0]
        td2m1 = tv[:, 1]
        ti2m1 = tv[:, 2]
        tm2d1 = tv[:, 3]
        td2d1 = tv[:, 4]
        tm2i0 = tv[:, 5]
        ti2i0 = tv[:, 6]

        def body(t, _):
            d = c_idx * DC + t + 2

            # q transition diagonals via shift registers (8, Wp)
            qcur = []
            rows = (M2M, D2M, I2M, M2D, D2D, M2I, I2I)
            offs = (-1, -1, -1, -1, -1, 0, 0)
            for r in range(7):
                inew = d + offs[r]
                ic = jnp.clip(inew, 0, Lqp - 1)
                newv = qtr_ref[rows[r], ic]
                newv = jnp.where((inew >= 0) & (inew <= Lq + 1), newv,
                                 -FLT_MAX)
                rolled = pltpu.roll(qreg_ref[r], 1, 1)
                v = jnp.where(lanes8 == 0, newv, rolled)
                qreg_ref[r] = v
                qcur.append(v[:TB] if TB <= 8 else
                            jnp.broadcast_to(v[:1], (TB, Wp)))
            qm2m1, qd2m1, qi2m1, qm2d1, qd2d1, qm2i0, qi2i0 = qcur

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

            def upj(x):
                r = pltpu.roll(x, 1, 1)
                return jnp.where(lanes == 0, -FLT_MAX, r)

            # MM update: predecessors at (i-1, j-1) = diag d-2, lane j-1
            c_mm = upj(mm2) + qm2m1 + tm2m1
            best5 = jnp.maximum(sminf, c_mm)
            code = jnp.where(c_mm > sminf, MM, STOP)
            c_gd = upj(gd2) + qm2m1 + td2m1
            code = jnp.where(c_gd > best5, GD, code)
            best5 = jnp.maximum(best5, c_gd)
            c_im = upj(im2) + qi2m1 + tm2m1
            code = jnp.where(c_im > best5, IM, code)
            best5 = jnp.maximum(best5, c_im)
            c_dg = upj(dg2) + qd2m1 + tm2m1
            code = jnp.where(c_dg > best5, DG, code)
            best5 = jnp.maximum(best5, c_dg)
            c_mi = upj(mi2) + qm2m1 + ti2m1
            code = jnp.where(c_mi > best5, MI, code)
            best5 = jnp.maximum(best5, c_mi)
            mm_new = best5 + sico_ref[t]

            # GD/IM: (i, j-1) = diag d-1, lane j-1 (rolled)
            mm1r = upj(mm1)
            a_gd = mm1r + tm2d1
            b_gd = upj(gd1) + td2d1
            bit_gd = a_gd > b_gd
            gd_new = jnp.maximum(a_gd, b_gd)
            a_im = mm1r + qm2i0 + tm2m1
            b_im = upj(im1) + qi2i0 + tm2m1
            bit_im = a_im > b_im
            im_new = jnp.maximum(a_im, b_im)
            # DG/MI: (i-1, j) = diag d-1, lane j (unshifted)
            a_dg = mm1 + qm2d1
            b_dg = dg1 + qd2d1
            bit_dg = a_dg > b_dg
            dg_new = jnp.maximum(a_dg, b_dg)
            a_mi = mm1 + qm2m1 + tm2i0
            b_mi = mi1 + qm2m1 + ti2i0
            bit_mi = a_mi > b_mi
            mi_new = jnp.maximum(a_mi, b_mi)
            if has_co:
                co = co_ref[t]
                gd_new = gd_new + co
                im_new = im_new + co
                dg_new = dg_new + co
                mi_new = mi_new + co

            i_lane = d - lanes
            on = (lanes >= 1) & (i_lane >= 1) & (i_lane <= Lq) \
                & (lanes <= Lt)
            bnd = ((lanes == 0) & (i_lane >= 0) & (i_lane <= Lq)) \
                | ((i_lane == 0) & (lanes <= Lt))
            mm0 = jnp.where(bnd, 0.0, -FLT_MAX)
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

            # per-lane running best (first-d-wins on strictly greater)
            if local:
                cand = jnp.where(on, mm_new, -FLT_MAX)
            else:
                cand = jnp.where(on & ((lanes == Lt) | (i_lane == Lq)),
                                 mm_new, -FLT_MAX)
            prev = bl_ref[0]
            better = cand > prev
            bl_ref[0] = jnp.where(better, cand, prev)
            bl_ref[1] = jnp.where(better, d.astype(f32), bl_ref[1])
            return 0

        jax.lax.fori_loop(0, DC, body, 0)

        @pl.when(c_idx == n_dchunks - 1)
        def _():
            bestS_ref[0] = bl_ref[0]
            bestD_ref[0] = bl_ref[1]

    grid = (n_btiles, n_dchunks)
    out_shape = (
        jax.ShapeDtypeStruct((n_btiles, TB, Wp), jnp.float32),
        jax.ShapeDtypeStruct((n_btiles, TB, Wp), jnp.float32),
        jax.ShapeDtypeStruct((Dp, Bp, Wp), jnp.int32),
    )
    in_specs = [pl.BlockSpec((DC, TB, Wp), lambda b, c: (c, b, 0))]
    inputs = [sico_d]
    if has_co:
        in_specs.append(pl.BlockSpec((DC, TB, Wp), lambda b, c: (c, b, 0)))
        inputs.append(co_d)
    in_specs += [
        pl.BlockSpec((TB, 7, Wp), lambda b, c: (b, 0, 0)),
        pl.BlockSpec((7, Lqp), lambda b, c: (0, 0),
                     memory_space=pltpu.SMEM),
    ]
    inputs += [tvec, qtr_s]
    res = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((1, TB, Wp), lambda b, c: (b, 0, 0)),
            pl.BlockSpec((1, TB, Wp), lambda b, c: (b, 0, 0)),
            pl.BlockSpec((DC, TB, Wp), lambda b, c: (c, b, 0)),
        ),
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((10, TB, Wp), jnp.float32),
            pltpu.VMEM((7, 8, Wp), jnp.float32),
            pltpu.VMEM((2, TB, Wp), jnp.float32),
        ],
        interpret=interpret,
    )(*inputs)
    bestS, bestD, bt_diag = res

    # ---- final reduction with row-major tie-break (XLA, tiny) ----
    bestS = bestS.reshape(Bp, Wp)[:B, :Wj]       # (B, Wj)
    bestD = bestD.reshape(Bp, Wp)[:B, :Wj].astype(jnp.int32)
    lanes = jnp.arange(Wj)[None, :]
    i_of = bestD - lanes
    # order: score desc, then i asc, then j asc
    key_i = jnp.where(jnp.isfinite(bestS), i_of, 10 ** 6)
    neg = bestS <= -FLT_MAX
    smax = jnp.max(bestS, axis=1, keepdims=True)
    tied = (bestS == smax) & ~neg
    big = 10 ** 6
    i_cand = jnp.where(tied, i_of, big)
    imin = jnp.min(i_cand, axis=1, keepdims=True)
    tied2 = tied & (i_of == imin)
    j_cand = jnp.where(tied2, lanes, big)
    jmin = jnp.min(j_cand, axis=1)
    score = smax[:, 0]
    best_j = jmin.astype(jnp.int32)
    best_i = (imin[:, 0]).astype(jnp.int32)
    empty = jnp.all(neg, axis=1)
    score = jnp.where(empty, NEG, score)
    best_i = jnp.where(empty, 0, best_i)
    best_j = jnp.where(empty, 0, best_j)

    if need_bt:
        # bt[b, i, j] = bt_diag[i + j - 2, b, j]  (j-major unskew)
        m = jnp.transpose(bt_diag, (1, 2, 0))     # (Bp, Wp, Dp)
        m = jnp.pad(m, ((0, 0), (0, 0), (2, 0)))
        Wd2 = Dp + 2
        flat = m.reshape(Bp, Wp * Wd2)
        flat = jnp.pad(flat, ((0, 0), (0, Wp)))
        un = flat.reshape(Bp, Wp, Wd2 + 1)[:, :, : Lq + 1]
        bt = jnp.transpose(un[:B, :Wj, :], (0, 2, 1)).astype(jnp.uint8)
        bt = bt.at[:, 0, :].set(0)
        bt = bt.at[:, :, 0].set(0)
    else:
        bt = jnp.zeros((B, 1, 1), dtype=jnp.uint8)
    return score, best_i, best_j, bt
