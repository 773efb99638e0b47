"""Bit-parity of the template-lanes backtrace kernel vs the EXACT
anti-diagonal kernel (`ops.viterbi.viterbi_batch`, the golden-parity
path).

`viterbi_backtrace_lanes` forms each DP candidate with the exact
kernel's left-associated adds, the same strict-> backtrace-code chain,
the same post-add continuation-bit compares, and the same best-cell
tie rules (score desc, i asc, j asc) — its same-row GD/IM recurrences
are the natural sequential form, so unlike `viterbi_batch_rows` (whose
Kogge-Stone gap sums are tree-ordered, documented ~1-ulp divergence)
it is bit-exact against the reference semantics.  Scores, endpoints
and WALKED PATHS must agree exactly; the packed payloads (words-layout
walk vs bt-matrix walk) must byte-match after decode.
"""

import numpy as np
import pytest

from __graft_entry__ import _example_pair
from hhsuite_tpu.ops import viterbi as V
from hhsuite_tpu.ops.viterbi_lanes import viterbi_backtrace_lanes

pytestmark = pytest.mark.slow    # interpret-mode Pallas


def _pad_query(qp, qtr, Lq_true, Lq_pad):
    qp_p = np.zeros((Lq_pad + 2, 20), np.float32)
    qp_p[: Lq_true + 2] = qp
    qtr_p = np.full((Lq_pad + 2, 7), -V.FLT_MAX, np.float32)
    qtr_p[: Lq_true + 2] = qtr
    return qp_p, qtr_p


def _compare(Lq, Lt, B, seed, shift=-0.03, Lq_pad=None,
             score_exact=True):
    qp, qtr, tp, ttr, _co, tL = _example_pair(Lq=Lq, Lt=Lt, B=B,
                                              seed=seed)
    co0 = np.zeros((B, Lq + 1, Lt + 1), bool)
    s_x, i_x, j_x, bt = V.viterbi_batch(
        qp, qtr, tp, ttr, co0, tL, np.float32(shift), 0.0, 0.0, 0.0,
        local=True, need_bt=True)
    kmax = Lq + Lt + 1
    pk_x = np.asarray(V._backtrace_walk_packed8(bt, i_x, j_x, s_x,
                                                kmax=kmax))

    if Lq_pad is None:
        qp_l, qtr_l, lqt = qp, qtr, None
    else:
        qp_l, qtr_l = _pad_query(qp, qtr, Lq, Lq_pad)
        lqt = np.int32(Lq)
        kmax = Lq_pad + Lt + 1
        # re-pack the exact payload at the padded kmax so byte compare
        # lines up
        pk_x = np.asarray(V._backtrace_walk_packed8(bt, i_x, j_x, s_x,
                                                    kmax=kmax))
    s_l, i_l, j_l, btw = viterbi_backtrace_lanes(
        qp_l, qtr_l, tp, ttr, tL, np.float32(shift), Lq_true=lqt,
        interpret=True)
    pk_l = np.asarray(V.backtrace_walk_packed8_words(
        btw, i_l, j_l, s_l, kmax=kmax, B=B))

    if score_exact:
        np.testing.assert_array_equal(np.asarray(s_x), np.asarray(s_l))
    else:
        # padding the query changes the Si einsum's i-extent, which
        # can re-block the backend's 20-term contraction (±1 ulp);
        # endpoints/paths must still agree
        np.testing.assert_allclose(np.asarray(s_x), np.asarray(s_l),
                                   rtol=3e-7)
    np.testing.assert_array_equal(np.asarray(i_x), np.asarray(i_l))
    np.testing.assert_array_equal(np.asarray(j_x), np.asarray(j_l))

    ux = V.backtrace_walk_unpack8(pk_x, kmax)
    ul = V.backtrace_walk_unpack8(pk_l, kmax)
    for b in range(B):
        ir, jr, sr, mr = ux(b)
        il, jl, sl, ml = ul(b)
        np.testing.assert_array_equal(ir, il, err_msg=f"lane {b} i")
        np.testing.assert_array_equal(jr, jl, err_msg=f"lane {b} j")
        np.testing.assert_array_equal(sr, sl, err_msg=f"lane {b} st")
        assert mr == ml


def test_lanes_bt_matches_exact_small():
    _compare(Lq=24, Lt=19, B=4, seed=0)


def test_lanes_bt_matches_exact_mixed_lengths():
    _compare(Lq=33, Lt=41, B=6, seed=2)


def test_lanes_bt_matches_exact_lq_bucketed():
    # padded query rows (kernel view 40 > true 29) must not win
    _compare(Lq=29, Lt=21, B=3, seed=5, Lq_pad=40, score_exact=False)


def test_lanes_bt_more_lanes_than_tile():
    # B > G*BK forces nB > 1 (multi-block lane addressing in the walk)
    _compare(Lq=9, Lt=7, B=1100, seed=3)
