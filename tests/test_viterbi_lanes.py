"""Template-lanes score-only Pallas Viterbi vs the bit-exact lax.scan
kernel.

Runs in Pallas interpret mode on CPU.  The lanes kernel uses the same
add groupings as the rows kernel, and on these random profiles its
scores come out bit-identical to the scan kernel, which the test
asserts to catch structural regressions (allclose is the documented
contract).
"""

import numpy as np
import pytest

from __graft_entry__ import _example_pair
from hhsuite_tpu.ops.viterbi import viterbi_batch
from hhsuite_tpu.ops.viterbi_lanes import viterbi_score_lanes


CASES = [
    (37, 53, 4, 0),
    (64, 40, 8, 1),
    (23, 67, 3, 5),
    (50, 128, 4, 4),
]


@pytest.mark.parametrize("Lq,Lt,B,seed", CASES)
def test_lanes_matches_scan(Lq, Lt, B, seed):
    qp, qtr, tp, ttr, _co, tL = _example_pair(Lq=Lq, Lt=Lt, B=B, seed=seed)
    co = np.zeros((B, Lq + 1, Lt + 1), bool)
    s0, _i, _j, _bt = viterbi_batch(qp, qtr, tp, ttr, co, tL, -0.03,
                                    0.0, 0.0, 0.0, local=True,
                                    need_bt=False)
    s1 = viterbi_score_lanes(qp, qtr, tp, ttr, tL, np.float32(-0.03),
                             interpret=True)
    np.testing.assert_allclose(np.asarray(s0), np.asarray(s1),
                               rtol=2e-6, atol=1e-4)


def test_lanes_with_ss_score():
    Lq, Lt, B = 33, 47, 4
    qp, qtr, tp, ttr, _co, tL = _example_pair(Lq=Lq, Lt=Lt, B=B, seed=9)
    rng = np.random.RandomState(9)
    ss = (rng.rand(B, Lq + 1, Lt + 1) * 0.4 - 0.2).astype(np.float32)
    co = np.zeros((B, Lq + 1, Lt + 1), bool)
    s0, _i, _j, _bt = viterbi_batch(qp, qtr, tp, ttr, co, tL, -0.03,
                                    0.0, 0.0, 0.0, ss_score=ss,
                                    local=True, need_bt=False)
    s1 = viterbi_score_lanes(qp, qtr, tp, ttr, tL, np.float32(-0.03),
                             ss_score=ss, interpret=True)
    np.testing.assert_allclose(np.asarray(s0), np.asarray(s1),
                               rtol=2e-6, atol=1e-4)
