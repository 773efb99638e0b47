"""Row-sweep Pallas Viterbi kernel vs the bit-exact lax.scan kernel.

Runs in Pallas interpret mode on CPU.  The rows kernel evaluates the
same-row GD/IM recurrences with a tree scan, so it is documented as
ulp-level-equivalent rather than bit-exact; on these random profiles the
outputs (scores, end cells, full backtrace byte matrices) come out
identical, which the test asserts to catch structural regressions.
"""

import numpy as np
import pytest

from __graft_entry__ import _example_pair
from hhsuite_tpu.ops.viterbi import viterbi_batch
from hhsuite_tpu.ops.viterbi_rows import viterbi_batch_rows


CASES = [
    (37, 53, 4, 0),
    (64, 40, 8, 1),
    (60, 127, 4, 3),   # Wj == Wp edge (Lt + 1 == 128): wrap masking path
    (50, 128, 4, 4),
]


@pytest.mark.parametrize("Lq,Lt,B,seed", CASES)
@pytest.mark.parametrize("with_co", [False, True])
def test_rows_matches_scan(Lq, Lt, B, seed, with_co):
    qp, qtr, tp, ttr, _co, tL = _example_pair(Lq=Lq, Lt=Lt, B=B, seed=seed)
    if with_co:
        rng = np.random.RandomState(seed)
        co = rng.rand(B, Lq + 1, Lt + 1) < 0.15
        co_rows = co
    else:
        co = np.zeros((B, Lq + 1, Lt + 1), bool)
        co_rows = None
    s0, i0, j0, bt0 = viterbi_batch(qp, qtr, tp, ttr, co, tL, -0.03,
                                    0.0, 0.0, 0.0, local=True,
                                    need_bt=True)
    s1, i1, j1, bt1 = viterbi_batch_rows(qp, qtr, tp, ttr, co_rows, tL,
                                         np.float32(-0.03), local=True,
                                         need_bt=True, tb=8,
                                         interpret=True)
    np.testing.assert_allclose(np.asarray(s0), np.asarray(s1), rtol=2e-6)
    assert np.array_equal(np.asarray(i0), np.asarray(i1))
    assert np.array_equal(np.asarray(j0), np.asarray(j1))
    assert np.array_equal(np.asarray(bt0), np.asarray(bt1))


def test_rows_global_mode():
    qp, qtr, tp, ttr, _co, tL = _example_pair(Lq=33, Lt=45, B=4, seed=7)
    co = np.zeros((4, 34, 46), bool)
    s0, i0, j0, bt0 = viterbi_batch(qp, qtr, tp, ttr, co, tL, -0.03,
                                    0.0, 0.0, 0.0, local=False,
                                    need_bt=True)
    s1, i1, j1, bt1 = viterbi_batch_rows(qp, qtr, tp, ttr, None, tL,
                                         np.float32(-0.03), local=False,
                                         need_bt=True, tb=4,
                                         interpret=True)
    np.testing.assert_allclose(np.asarray(s0), np.asarray(s1), rtol=2e-6)
    assert np.array_equal(np.asarray(i0), np.asarray(i1))
    assert np.array_equal(np.asarray(j0), np.asarray(j1))
    assert np.array_equal(np.asarray(bt0), np.asarray(bt1))


def test_rows_score_only_matches_bt_mode():
    """need_bt=False (score-only fast path) must return the same
    score/i2/j2 as the full-backtrace mode."""
    qp, qtr, tp, ttr, _co, tL = _example_pair(Lq=41, Lt=59, B=8, seed=11)
    s0, i0, j0, _bt = viterbi_batch_rows(qp, qtr, tp, ttr, None, tL,
                                         np.float32(-0.03), local=True,
                                         need_bt=True, tb=8,
                                         interpret=True)
    s1, i1, j1, bt1 = viterbi_batch_rows(qp, qtr, tp, ttr, None, tL,
                                         np.float32(-0.03), local=True,
                                         need_bt=False, tb=8,
                                         interpret=True)
    assert np.array_equal(np.asarray(s0), np.asarray(s1))
    assert np.array_equal(np.asarray(i0), np.asarray(i1))
    assert np.array_equal(np.asarray(j0), np.asarray(j1))
    assert np.asarray(bt1).shape == (8, 1, 1)
