"""Row-sweep Pallas Viterbi: lanes = template positions, one step per
query row.

Anti-diagonal wavefront kernels (tried first) advance one diagonal per
step, so every step does a handful of (8, Wp) vector ops plus ~15
`pltpu.roll`s — the rolls dominate and cap throughput around 2.5 GCUPS.
This kernel instead sweeps query rows: each grid step
computes a FULL row of cells (TB × Lt lanes) with wide element-wise ops.

The cross-row recurrences (MM/DG/MI from row i-1, hhviterbialgorithm.cpp
:45-497) are plain element-wise work per row.  The two same-row
recurrences

    GD[i][j] = max(MM[i][j-1] + t_m2d[j-1], GD[i][j-1] + t_d2d[j-1])
    IM[i][j] = max(MM[i][j-1] + q_m2i[i] + t_m2m[j-1],
                   IM[i][j-1] + q_i2i[i] + t_m2m[j-1])

are first-order (max, +) linear recurrences along j and are solved with a
Kogge-Stone scan over the lane axis (log2(Wp) steps): combine
(A, C) ⊕ (A', C') = (max(A, A' + C), C + C').  Rolls now cost
O(log Lt) per ROW instead of O(1) per CELL.

In the common no-cell-off case the carry tensors C are row-independent
(GD: window sums of td2d1; IM: window sums of tm2m1 plus an exact
power-of-two multiple of the per-row scalar qi2i0), so they are
precomputed once per template with the identical tree-doubling order and
the per-row scan needs only the two A rolls per step, with the roll wrap
mask folded into the precomputed carries.  GD/IM state rows are stored
pre-shifted (they are only consumed at j-1), reusing the backtrace-bit
rolls, and padding lanes are left unmasked (their garbage provably never
reaches a live lane or output).  All outputs stay bit-identical to the
original in-row scan.

Exactness: the scan evaluates the gap-run sums in tree order, so values
can differ from the reference's row-sequential loop by ~1 ulp along long
gap runs (which can flip an argmax in exact ties).  This is the
throughput kernel; `ops.viterbi.viterbi_batch` remains the bit-exact
reference/parity path (used on CPU and in golden tests).
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
    static_argnames=("local", "need_bt", "tb", "rps", "interpret"))
def viterbi_batch_rows(qp, qtr, tp, ttr, cell_off, t_L, shift,
                       ss_score=None, local=True, need_bt=True,
                       tb=32, rps=8, interpret=False, Lq_true=None):
    """Contract of ops.viterbi.viterbi_batch (egq=egt=0 assumed).

    ``rps`` query rows are computed per grid step (python-unrolled, must
    divide 8) to amortize Mosaic's fixed per-step cost; every row's float
    expressions are unchanged, so outputs are bit-identical for any rps.

    Returns (score, i2, j2, bt) with bt (B, Lq+1, Lt+1) uint8.
    """
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from .viterbi import _log2f4

    Lq = qp.shape[0] - 2
    Lt = tp.shape[1] - 2
    B = tp.shape[0]
    Wj = Lt + 1
    Wp = _round_up(Wj, 128)
    # clamp the template block so the kernel's scoped VMEM stays under
    # the ~16 MiB budget for ANY Lt: measured 18.91 MiB at TB=64,
    # Wp=512 (need_bt, no cell-off), i.e. ~577 B per (TB, Wp) element;
    # callers' tb is an upper bound, not a guarantee
    tb_vmem = max(8, int(14e6 / (580 * Wp)) // 8 * 8)
    TB = min(tb, B, tb_vmem)
    Bp = _round_up(B, TB)
    f32 = jnp.float32
    NEG = f32(-FLT_MAX)

    # ---- per-row match scores (MXU) ----
    # qp broadcast over b makes b a true dot_general batch dim, so the
    # natural output order (b, i, j) is already the kernel layout and
    # XLA fuses the log2/shift epilogue into the dot instead of
    # emitting dot + transpose + elementwise passes over (B, Lq, Lt)
    qp_b = jnp.broadcast_to(qp[1:Lq + 1], (B, Lq, 20))
    dot = jnp.einsum("bia,bja->bij", qp_b, tp[:, 1:Lt + 1],
                     preferred_element_type=jnp.float32)   # (B, Lq, Lt)
    Si = _log2f4(dot) + f32(shift)
    if ss_score is not None:
        Si = Si + ss_score[:, 1:, 1:]
    Lq8 = _round_up(Lq, 8)
    Si = jnp.pad(Si, ((0, Bp - B), (0, Lq8 - Lq), (1, Wp - Wj)))
    # kept in (Bp, Lq8, Wp) layout and block-sliced 8 rows at a time:
    # saves the full HBM transpose pass over the biggest input that the
    # (Lq, Bp, Wp) layout needed, while keeping the block's trailing
    # dims (8, Wp) tile-aligned
    has_co = cell_off is not None
    if has_co:
        co_add = jnp.where(cell_off[:, 1:, :], NEG, f32(0.0))
        co_add = jnp.pad(co_add, ((0, Bp - B), (0, Lq8 - Lq),
                                  (0, Wp - Wj)))
        Si = Si + co_add
    else:
        co_add = jnp.zeros((1, 1, 128), f32)    # placeholder

    # template transitions as lane vectors (shared with pallas2 layout)
    jidx = np.arange(Wp)
    jm1 = jnp.asarray(np.maximum(jidx - 1, 0).clip(0, Lt + 1))
    j0 = jnp.asarray(jidx.clip(0, Lt + 1))
    ttr_f = ttr.astype(jnp.float32)
    # channel 7: global-mode last-column mask — 0 at each template's
    # TRUE last column t_L (hhviterbialgorithm.cpp:461-463 maximizes
    # over the real last column, not the padded width), -inf elsewhere
    colmask = jnp.where(
        jnp.asarray(t_L, jnp.int32)[:, None] == jnp.arange(Wp)[None, :],
        f32(0.0), NEG)                           # (B, Wp)
    tvec = jnp.stack([
        ttr_f[:, :, M2M][:, jm1], ttr_f[:, :, D2M][:, jm1],
        ttr_f[:, :, I2M][:, jm1], ttr_f[:, :, M2D][:, jm1],
        ttr_f[:, :, D2D][:, jm1],
        ttr_f[:, :, M2I][:, j0], ttr_f[:, :, I2I][:, j0],
        colmask,
    ], axis=1)                                   # (B, 8, Wp)
    tvec = jnp.pad(tvec, ((0, Bp - B), (0, 0), (0, 0)),
                   constant_values=-FLT_MAX)

    # padded tail rows (rows-per-step fill) read qtr up to index
    # round_up(Lq, 8), so pad at least one past that
    Lqp = _round_up(max(Lq + 2, _round_up(Lq, 8) + 1), 8)
    qtr_s = jnp.pad(qtr.astype(jnp.float32).T,
                    ((0, 0), (0, Lqp - (Lq + 2))),
                    constant_values=-FLT_MAX)     # (7, Lqp)
    # channel 7: per-row validity mask for QUERY-length bucketing —
    # 0 for real rows i <= Lq_true, -FLT_MAX for padding rows, added to
    # the best-score candidates so a padded row can never win the
    # argmax (a fully-cell-off lane would otherwise report the padded
    # row's ~-127 Si floor instead of -FLT_MAX).  Lq_true is traced, so
    # queries sharing one Lq bucket share one compiled program.
    if Lq_true is None:
        rowmask = jnp.zeros((1, Lqp), jnp.float32)
    else:
        rowmask = jnp.where(
            jnp.arange(Lqp)[None, :] <= jnp.asarray(Lq_true, jnp.int32),
            f32(0.0), NEG)
    qtr_s = jnp.concatenate([qtr_s, rowmask], axis=0)   # (8, Lqp)

    sminf = 0.0 if local else -FLT_MAX
    n_btiles = Bp // TB
    scan_steps = []
    s = 1
    while s < Wp:
        scan_steps.append(s)
        s *= 2

    if not has_co:
        # The Kogge-Stone carry tensors are ROW-INDEPENDENT (for GD the
        # per-step window sums of td2d1; for IM those of tm2m1 plus a
        # per-row scalar qi2i0 * window, exact because the window is a
        # power of two).  Precompute them once per template with the
        # same tree-doubling order the in-row loop used, store the
        # step-entry value with the roll wrap mask folded in, and the
        # per-row scan drops from 4 rolls + 2 masks to 2 rolls per step.
        lane_row = jnp.arange(Wp)
        C1k = tvec[:, 4]                       # td2d1 (Bp, Wp)
        T2k = tvec[:, 0]                       # tm2m1 (Bp, Wp)
        C1s, T2s = [], []
        for s_ in scan_steps:
            C1s.append(jnp.where(lane_row < s_, NEG, C1k))
            T2s.append(jnp.where(lane_row < s_, NEG, T2k))
            C1k = C1k + jnp.roll(C1k, s_, axis=1)
            T2k = T2k + jnp.roll(T2k, s_, axis=1)
        c1_arr = jnp.stack(C1s, axis=1)        # (Bp, S, Wp)
        t2_arr = jnp.stack(T2s, axis=1)

    # rows per grid step: python-unrolled so Mosaic's fixed per-step
    # cost (bounds checks, copy setup) is paid once per `R` rows.
    R = max(1, min(rps, 8))
    while 8 % R:
        R -= 1
    grid_r = -(-Lq // R)
    Lq_r = grid_r * R           # <= Lq8 because R | 8

    def kernel(*refs):
        if has_co:
            si_ref, co_ref, tv_ref, qtr_ref, *rest = refs
        else:
            si_ref, tv_ref, c1_ref, t2_ref, qtr_ref, *rest = refs
        if need_bt:
            bestS_ref, bestI_ref, bt_ref, st_ref, bl_ref = rest
        else:
            bestS_ref, bestI_ref, st_ref, bl_ref = rest
        step = pl.program_id(1)
        lanes = jax.lax.broadcasted_iota(jnp.int32, (TB, Wp), 1)

        @pl.when(step == 0)
        def _():
            # row i=0 boundary: MM = 0 everywhere (egq=egt=0), rest -inf
            st_ref[0] = jnp.zeros((TB, Wp), f32)
            for s_ in range(1, 5):
                st_ref[s_] = jnp.full((TB, Wp), -FLT_MAX)
            bl_ref[0] = jnp.full((TB, Wp), -FLT_MAX)
            bl_ref[1] = jnp.zeros((TB, Wp), f32)

        tv = tv_ref[...]
        tm2m1 = tv[:, 0]
        td2m1 = tv[:, 1]
        ti2m1 = tv[:, 2]
        tm2d1 = tv[:, 3]
        td2d1 = tv[:, 4]
        tm2i0 = tv[:, 5]
        ti2i0 = tv[:, 6]
        colmask = tv[:, 7]

        # When there is at least one padding lane (Wj < Wp), the value
        # wrapped into lane 0 by the circular roll comes from a padding
        # lane that every consumer either masks (A1/A2 lane-0 init, the
        # `on` mask on bytes) or ignores (lane 0 is a boundary cell), so
        # the explicit lane-0 mask is dropped.  Only when Lt+1 == Wp does
        # the wrap deliver live data and need masking.
        if Wj < Wp:
            def upj(x):
                return pltpu.roll(x, 1, 1)
        else:
            def upj(x):
                r = pltpu.roll(x, 1, 1)
                return jnp.where(lanes == 0, -FLT_MAX, r)

        on = (lanes >= 1) & (lanes <= Lt)
        lane0 = lanes == 0

        mm_p = st_ref[0]
        dg_p = st_ref[1]
        mi_p = st_ref[2]
        gd_p = st_ref[3]
        im_p = st_ref[4]
        bl_s = bl_ref[0]
        bl_i = bl_ref[1]

        for r in range(R):
            r_idx = step * R + r
            i = r_idx + 1
            si_off = (step * R) % 8 + r if R < 8 else r

            qm2m1 = qtr_ref[M2M, i - 1]
            qd2m1 = qtr_ref[D2M, i - 1]
            qi2m1 = qtr_ref[I2M, i - 1]
            qm2d1 = qtr_ref[M2D, i - 1]
            qd2d1 = qtr_ref[D2D, i - 1]
            qm2i0 = qtr_ref[M2I, i]
            qi2i0 = qtr_ref[I2I, i]

            # ---- MM row: predecessors at (i-1, j-1); gd_p/im_p were
            # stored pre-shifted so only three rolls remain ----
            c_mm = upj(mm_p) + qm2m1 + tm2m1
            best5 = jnp.maximum(sminf, c_mm)
            if need_bt:
                code = jnp.where(c_mm > sminf, MM, STOP)
            c_gd = gd_p + qm2m1 + td2m1
            if need_bt:
                code = jnp.where(c_gd > best5, GD, code)
            best5 = jnp.maximum(best5, c_gd)
            c_im = im_p + qi2m1 + tm2m1
            if need_bt:
                code = jnp.where(c_im > best5, IM, code)
            best5 = jnp.maximum(best5, c_im)
            c_dg = upj(dg_p) + qd2m1 + tm2m1
            if need_bt:
                code = jnp.where(c_dg > best5, DG, code)
            best5 = jnp.maximum(best5, c_dg)
            c_mi = upj(mi_p) + qm2m1 + ti2m1
            if need_bt:
                code = jnp.where(c_mi > best5, MI, code)
            best5 = jnp.maximum(best5, c_mi)
            mm_row = best5 + si_ref[:, si_off]   # si already carries co
            # boundary lane j=0: MM[i][0] = 0 (zero end-gap penalties)
            mm_row = jnp.where(lane0, 0.0, mm_row)

            # ---- DG/MI rows: predecessors at (i-1, j), element-wise --
            a_dg = mm_p + qm2d1
            b_dg = dg_p + qd2d1
            if need_bt:
                bit_dg = a_dg > b_dg
            dg_row = jnp.maximum(a_dg, b_dg)
            a_mi = mm_p + qm2m1 + tm2i0
            b_mi = mi_p + qm2m1 + ti2i0
            if need_bt:
                bit_mi = a_mi > b_mi
            mi_row = jnp.maximum(a_mi, b_mi)
            if has_co:
                co = co_ref[:, si_off]
                dg_row = dg_row + co
                mi_row = mi_row + co

            # ---- GD/IM rows: same-row recurrence, Kogge-Stone ----
            mm_row_s = upj(mm_row)                # MM[i][j-1]
            a_gd0 = mm_row_s + tm2d1
            c_gd = td2d1
            a_im0 = (mm_row_s + qm2i0) + tm2m1
            c_im = qi2i0 + tm2m1
            if has_co:
                a_gd = a_gd0 + co
                c_gd2 = c_gd + co
                a_im = a_im0 + co
                c_im2 = c_im + co
            else:
                a_gd, c_gd2, a_im, c_im2 = a_gd0, c_gd, a_im0, c_im
            A1 = jnp.where(lane0, -FLT_MAX, a_gd)
            A2 = jnp.where(lane0, -FLT_MAX, a_im)
            if has_co:
                C1 = c_gd2
                C2 = c_im2
                # Kogge-Stone; only the A rolls need wrap masking.  A C
                # value rolled across the origin is garbage only in
                # lanes j < 2^k, and every use of C[j] at the next step
                # pairs it with an A roll that is masked to -FLT_MAX
                # exactly for those lanes, so the garbage never reaches
                # a result.
                for s_ in scan_steps:
                    A1r = jnp.where(lanes < s_, -FLT_MAX,
                                    pltpu.roll(A1, s_, 1))
                    C1r = pltpu.roll(C1, s_, 1)
                    A2r = jnp.where(lanes < s_, -FLT_MAX,
                                    pltpu.roll(A2, s_, 1))
                    C2r = pltpu.roll(C2, s_, 1)
                    A1 = jnp.maximum(A1, A1r + C1)
                    C1 = C1 + C1r
                    A2 = jnp.maximum(A2, A2r + C2)
                    C2 = C2 + C2r
            else:
                # Precomputed carries: the folded wrap mask makes the
                # wrapped-lane candidate <= -FLT_MAX, losing every max
                # exactly as the explicit mask did.
                for k, s_ in enumerate(scan_steps):
                    A1 = jnp.maximum(A1, pltpu.roll(A1, s_, 1)
                                     + c1_ref[:, k])
                    A2 = jnp.maximum(A2, pltpu.roll(A2, s_, 1)
                                     + (t2_ref[:, k]
                                        + qi2i0 * f32(float(s_))))
            gd_row = A1
            im_row = A2
            # backtrace bits against the resolved predecessor (pre-
            # cell-off, matching the wavefront kernels' bit semantics).
            # The rolled copies double as next row's pre-shifted GD/IM
            # reads (those states are only ever consumed at j-1),
            # saving two rolls.
            gd_row_s = upj(gd_row)
            im_row_s = upj(im_row)
            if need_bt:
                b_gd2 = gd_row_s + td2d1
                bit_gd = a_gd0 > b_gd2
                b_im2 = im_row_s + qi2i0 + tm2m1
                bit_im = a_im0 > b_im2

            # Padding lanes (j > Lt) are left unmasked: under the j-1
            # shift they only ever receive live-edge values and feed
            # other padding lanes, the best-score tracker masks with
            # `on`, and the byte output is masked below — so garbage
            # there never reaches a result and the five negfull selects
            # are saved.  Lane 0 of DG/MI is a real boundary (-inf in
            # the reference) that feeds lane 1 through the j-1 shift
            # next row, so it keeps its mask.
            dg_row = jnp.where(lane0, -FLT_MAX, dg_row)
            mi_row = jnp.where(lane0, -FLT_MAX, mi_row)

            if need_bt:
                byte = (code
                        | jnp.where(bit_gd, 8, 0)
                        | jnp.where(bit_im, 16, 0)
                        | jnp.where(bit_dg, 32, 0)
                        | jnp.where(bit_mi, 64, 0))
                byte = jnp.where(on, byte, 0)
                bt_ref[:, r] = byte.astype(jnp.int32)

            if local:
                cand = jnp.where(on, mm_row, -FLT_MAX)
            else:
                cand = jnp.where(on & (i == Lq), mm_row,
                                 jnp.where(on, mm_row + colmask,
                                           -FLT_MAX))
            # query-row validity (Lq bucketing): -FLT_MAX for padded
            # rows, 0 otherwise — padded rows lose every max
            cand = cand + qtr_ref[7, i]
            better = cand > bl_s
            if Lq % R:
                # rows beyond Lq exist only to fill the last grid step;
                # their values must not reach the best tracker
                better = better & (i <= Lq)
            bl_s = jnp.where(better, cand, bl_s)
            bl_i = jnp.where(better, f32(1) * i, bl_i)

            mm_p, dg_p, mi_p = mm_row, dg_row, mi_row
            gd_p, im_p = gd_row_s, im_row_s

        st_ref[0] = mm_p
        st_ref[1] = dg_p
        st_ref[2] = mi_p
        st_ref[3] = gd_p
        st_ref[4] = im_p
        bl_ref[0] = bl_s
        bl_ref[1] = bl_i

        @pl.when(step == grid_r - 1)
        def _():
            bestS_ref[0] = bl_s
            bestI_ref[0] = bl_i

    grid = (n_btiles, grid_r)
    out_shape = [
        jax.ShapeDtypeStruct((n_btiles, TB, Wp), jnp.float32),
        jax.ShapeDtypeStruct((n_btiles, TB, Wp), jnp.float32),
    ]
    if need_bt:
        # batch-major so the (B, Lq, Lt) result needs no transpose pass
        out_shape.append(jax.ShapeDtypeStruct((Bp, Lq_r, Wp), jnp.int32))
    out_shape = tuple(out_shape)
    in_specs = [pl.BlockSpec((TB, 8, Wp),
                             lambda b, s: (b, (s * R) // 8, 0))]
    inputs = [Si]
    if has_co:
        in_specs.append(
            pl.BlockSpec((TB, 8, Wp), lambda b, s: (b, (s * R) // 8, 0)))
        inputs.append(co_add)
    in_specs += [
        pl.BlockSpec((TB, 8, Wp), lambda b, s: (b, 0, 0)),
    ]
    inputs += [tvec]
    if not has_co:
        S = len(scan_steps)
        in_specs += [
            pl.BlockSpec((TB, S, Wp), lambda b, s: (b, 0, 0)),
            pl.BlockSpec((TB, S, Wp), lambda b, s: (b, 0, 0)),
        ]
        inputs += [c1_arr, t2_arr]
    in_specs += [
        pl.BlockSpec((8, Lqp), lambda b, s: (0, 0),
                     memory_space=pltpu.SMEM),
    ]
    inputs += [qtr_s]
    out_specs = [
        pl.BlockSpec((1, TB, Wp), lambda b, s: (b, 0, 0)),
        pl.BlockSpec((1, TB, Wp), lambda b, s: (b, 0, 0)),
    ]
    if need_bt:
        out_specs.append(pl.BlockSpec((TB, R, Wp), lambda b, s: (b, s, 0)))
    res = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((5, TB, Wp), jnp.float32),
            pltpu.VMEM((2, TB, Wp), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        interpret=interpret,
    )(*inputs)
    if need_bt:
        bestS, bestI, bt_rows = res
    else:
        bestS, bestI = res

    # ---- final reduction: score desc, then i asc, then j asc ----
    bestS = bestS.reshape(Bp, Wp)[:B, :Wj]
    bestI = bestI.reshape(Bp, Wp)[:B, :Wj].astype(jnp.int32)
    lanes = jnp.arange(Wj)[None, :]
    neg = bestS <= -FLT_MAX
    smax = jnp.max(bestS, axis=1, keepdims=True)
    tied = (bestS == smax) & ~neg
    big = 10 ** 6
    i_cand = jnp.where(tied, bestI, big)
    imin = jnp.min(i_cand, axis=1, keepdims=True)
    tied2 = tied & (bestI == imin)
    j_cand = jnp.where(tied2, lanes, big)
    jmin = jnp.min(j_cand, axis=1)
    score = smax[:, 0]
    best_j = jmin.astype(jnp.int32)
    best_i = imin[:, 0].astype(jnp.int32)
    empty = jnp.all(neg, axis=1)
    score = jnp.where(empty, NEG, score)
    best_i = jnp.where(empty, 0, best_i)
    best_j = jnp.where(empty, 0, best_j)

    if need_bt:
        bt = bt_rows[:B, :Lq, :Wj]
        bt = jnp.pad(bt.astype(jnp.uint8), ((0, 0), (1, 0), (0, 0)))
    else:
        bt = jnp.zeros((B, 1, 1), dtype=jnp.uint8)
    return score, best_i, best_j, bt
