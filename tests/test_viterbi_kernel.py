"""Viterbi kernel self-consistency: wavefront JAX kernel vs a direct
row-sequential numpy transcription of the reference recurrence
(src/hhviterbialgorithm.cpp:156-487)."""

import numpy as np
import pytest

from hhsuite_tpu import fastmath as fm
from hhsuite_tpu.ops import viterbi as V

FLT_MAX = float(np.finfo(np.float32).max)
M2M, M2I, M2D, I2M, I2I, D2M, D2D = range(7)


def ref_viterbi(qp, qtr, tp, ttr, cell_off, shift, local=True,
                pq=0.0, pt=0.0):
    """Straightforward row-loop implementation of the reference kernel."""
    Lq = qp.shape[0] - 2
    Lt = tp.shape[0] - 2
    smin = np.float32(0.0) if local else np.float32(-FLT_MAX)
    NEG = np.float32(-FLT_MAX)

    sMM = np.full(Lt + 1, NEG, dtype=np.float32)
    sGD = np.full(Lt + 1, NEG, dtype=np.float32)
    sIM = np.full(Lt + 1, NEG, dtype=np.float32)
    sDG = np.full(Lt + 1, NEG, dtype=np.float32)
    sMI = np.full(Lt + 1, NEG, dtype=np.float32)
    for j in range(0, Lt + 1):
        sMM[j] = -j * pt
    bt = np.zeros((Lq + 1, Lt + 1), dtype=np.uint8)
    best = NEG
    bi = bj = 0

    for i in range(1, Lq + 1):
        mm_diag = np.float32(-(i - 1) * pq)
        gd_diag = im_diag = dg_diag = mi_diag = NEG
        sMM_prev0 = sMM[0]
        sMM[0] = np.float32(-i * pq)
        sGD_0 = sGD[0]
        sGD[0] = NEG
        sIM_0 = sIM[0]
        sIM[0] = NEG
        sDG_0 = sDG[0]
        sDG[0] = NEG
        sMI_0 = sMI[0]
        sMI[0] = NEG
        for j in range(1, Lt + 1):
            c_mm = mm_diag + qtr[i - 1, M2M] + ttr[j - 1, M2M]
            code = V.MM if c_mm > smin else V.STOP
            b5 = max(smin, c_mm)
            c = gd_diag + qtr[i - 1, M2M] + ttr[j - 1, D2M]
            if c > b5:
                code = V.GD
                b5 = c
            c = im_diag + qtr[i - 1, I2M] + ttr[j - 1, M2M]
            if c > b5:
                code = V.IM
                b5 = c
            c = dg_diag + qtr[i - 1, D2M] + ttr[j - 1, M2M]
            if c > b5:
                code = V.DG
                b5 = c
            c = mi_diag + qtr[i - 1, M2M] + ttr[j - 1, I2M]
            if c > b5:
                code = V.MI
                b5 = c
            si = fm.log2f4(np.float32(
                _scalarprod20vec(qp[i], tp[j]))) + np.float32(shift)
            mm_new = np.float32(b5 + si)

            byte = code
            # save diagonal values for next j
            mm_diag = sMM[j]
            dg_diag = sDG[j]
            mi_diag = sMI[j]
            gd_diag = sGD[j]
            im_diag = sIM[j]

            a = sMM[j - 1] + ttr[j - 1, M2D]
            b = sGD[j - 1] + ttr[j - 1, D2D]
            if a > b:
                byte |= 8
            gd_new = max(a, b)
            a = sMM[j - 1] + qtr[i, M2I] + ttr[j - 1, M2M]
            b = sIM[j - 1] + qtr[i, I2I] + ttr[j - 1, M2M]
            if a > b:
                byte |= 16
            im_new = max(a, b)
            a = sMM[j] + qtr[i - 1, M2D]
            b = sDG[j] + qtr[i - 1, D2D]
            if a > b:
                byte |= 32
            dg_new = max(a, b)
            a = sMM[j] + qtr[i - 1, M2M] + ttr[j, M2I]
            b = sMI[j] + qtr[i - 1, M2M] + ttr[j, I2I]
            if a > b:
                byte |= 64
            mi_new = max(a, b)

            if cell_off[i, j]:
                mm_new = np.float32(mm_new - FLT_MAX)
                gd_new = np.float32(gd_new - FLT_MAX)
                im_new = np.float32(im_new - FLT_MAX)
                dg_new = np.float32(dg_new - FLT_MAX)
                mi_new = np.float32(mi_new - FLT_MAX)

            sMM[j] = mm_new
            sGD[j] = np.float32(gd_new)
            sIM[j] = np.float32(im_new)
            sDG[j] = np.float32(dg_new)
            sMI[j] = np.float32(mi_new)
            bt[i, j] = byte

            if local or i == Lq:
                if mm_new > best:
                    best, bi, bj = mm_new, i, j
        if not local:
            if sMM[Lt] > best:
                best, bi, bj = sMM[Lt], i, Lt
    return best, bi, bj, bt


def _scalarprod20vec(a, b):
    r = [np.float32(a[l] * b[l]) for l in range(4)]
    for blk in range(1, 5):
        for l in range(4):
            r[l] = np.float32(np.float32(a[blk * 4 + l] * b[blk * 4 + l])
                              + r[l])
    return np.float32(np.float32(r[0] + r[1]) + np.float32(r[2] + r[3]))


def _rand_hmm(L, rng):
    p = rng.dirichlet(np.ones(20), size=L + 2).astype(np.float32) * 20.0
    tr = np.log2(rng.dirichlet(np.ones(3), size=L + 2)).astype(np.float32)
    full = np.full((L + 2, 7), -9.0, dtype=np.float32)
    full[:, M2M] = tr[:, 0]
    full[:, M2I] = tr[:, 1]
    full[:, M2D] = tr[:, 2]
    full[:, I2M] = np.float32(-0.3)
    full[:, I2I] = np.float32(-2.2)
    full[:, D2M] = np.float32(-0.4)
    full[:, D2D] = np.float32(-1.9)
    return p, full


@pytest.mark.parametrize("local", [True, False])
@pytest.mark.parametrize("seed", [0, 1])
def test_wavefront_matches_rowloop(local, seed):
    rng = np.random.default_rng(seed)
    Lq, Lt = 37, 29
    qp, qtr = _rand_hmm(Lq, rng)
    tp, ttr = _rand_hmm(Lt, rng)
    cell_off = np.zeros((Lq + 1, Lt + 1), dtype=bool)
    if seed == 1:
        cell_off[5:15, 3:9] = True

    want_s, want_i, want_j, want_bt = ref_viterbi(
        qp, qtr, tp, ttr, cell_off, shift=-0.03, local=local)

    s, i2, j2, bt = V.viterbi_batch(
        qp, qtr, tp[None], ttr[None], cell_off[None],
        np.array([Lt], np.int32), -0.03, 0.0, 0.0, 0.0,
        local=local)
    s = np.asarray(s)[0]
    bt = np.asarray(bt)[0]
    assert abs(s - want_s) < 2e-3 * max(1.0, abs(want_s)), (s, want_s)
    assert (int(np.asarray(i2)[0]), int(np.asarray(j2)[0])) == (want_i,
                                                                want_j)
    # backtrace codes should agree except where float ties flip
    agree = (bt == want_bt).mean()
    assert agree > 0.995, f"bt agreement only {agree}"


def test_batched_lanes_independent():
    rng = np.random.default_rng(2)
    Lq, Lt = 25, 21
    qp, qtr = _rand_hmm(Lq, rng)
    tps, ttrs = [], []
    for _ in range(4):
        tp, ttr = _rand_hmm(Lt, rng)
        tps.append(tp)
        ttrs.append(ttr)
    tp_b = np.stack(tps)
    ttr_b = np.stack(ttrs)
    co = np.zeros((4, Lq + 1, Lt + 1), dtype=bool)
    s_b, i_b, j_b, bt_b = V.viterbi_batch(
        qp, qtr, tp_b, ttr_b, co, np.full(4, Lt, np.int32),
        -0.03, 0.0, 0.0, 0.0, local=True)
    for b in range(4):
        s1, i1, j1, bt1 = V.viterbi_batch(
            qp, qtr, tp_b[b:b + 1], ttr_b[b:b + 1], co[b:b + 1],
            np.array([Lt], np.int32), -0.03, 0.0, 0.0, 0.0, local=True)
        np.testing.assert_allclose(np.asarray(s_b)[b], np.asarray(s1)[0],
                                   rtol=1e-6)
        assert np.asarray(i_b)[b] == np.asarray(i1)[0]
        np.testing.assert_array_equal(np.asarray(bt_b)[b],
                                      np.asarray(bt1)[0])


def test_backtrace_simple():
    # identity-ish alignment: diagonal backtrace
    rng = np.random.default_rng(3)
    L = 15
    qp, qtr = _rand_hmm(L, rng)
    # template = same profile -> strong diagonal
    s, i2, j2, bt = V.viterbi_batch(
        qp, qtr, qp[None], qtr[None],
        np.zeros((1, L + 1, L + 1), dtype=bool),
        np.array([L], np.int32), -0.03, 0.0, 0.0, 0.0, local=True)
    i_steps, j_steps, states, mc = V.backtrace(
        np.asarray(bt)[0], int(np.asarray(i2)[0]), int(np.asarray(j2)[0]))
    assert mc >= 1
    assert states[-1] == V.MM
    # path is monotone
    assert np.all(np.diff(i_steps[1:]) <= 0)
    assert np.all(np.diff(j_steps[1:]) <= 0)


def test_global_mode_padding_invariant():
    """Global-mode argmax must use each template's TRUE last column:
    padding the template axis (as the search's bucketed batches do)
    must not change the score or endpoint.  The reference's own
    hhsearch LOSES these cells to SIMD lane padding (its last-column
    scan at hhviterbialgorithm.cpp:461-475 runs at the lane group's
    padded width), so for templates shorter than their lane group it
    reports lower global scores than its own (unpadded) hhalign on the
    same pair; this framework follows the unpadded behavior for every
    pair."""
    rng = np.random.default_rng(11)
    Lq, Lt = 40, 23
    qp, qtr = _rand_hmm(Lq, rng)
    tp, ttr = _rand_hmm(Lt, rng)
    co = np.zeros((1, Lq + 1, Lt + 1), bool)
    s0, i0, j0, _bt = V.viterbi_batch(
        qp, qtr, tp[None], ttr[None], co,
        np.array([Lt], np.int32), -0.03, 0.0, 0.0, 0.0, local=False)
    pad = 17
    FLT_MAX = np.float32(np.finfo(np.float32).max)
    tp_p = np.pad(tp, ((0, pad), (0, 0)))
    ttr_p = np.pad(ttr, ((0, pad), (0, 0)), constant_values=-FLT_MAX)
    co_p = np.zeros((1, Lq + 1, Lt + 1 + pad), bool)
    s1, i1, j1, _bt = V.viterbi_batch(
        qp, qtr, tp_p[None], ttr_p[None], co_p,
        np.array([Lt], np.int32), -0.03, 0.0, 0.0, 0.0, local=False)
    assert float(np.asarray(s0)[0]) == float(np.asarray(s1)[0])
    assert int(np.asarray(i0)[0]) == int(np.asarray(i1)[0])
    assert int(np.asarray(j0)[0]) == int(np.asarray(j1)[0])
