"""Template-lanes score-only Pallas Viterbi vs the bit-exact lax.scan
kernel.

Runs in Pallas interpret mode on CPU.  With si_dtype='float32' the
lanes kernel computes the same recurrence as the scan kernel up to
f32 max/add reassociation (allclose is the documented contract); the
default bfloat16 Si streaming adds ~0.1% score noise and is covered
by a loose-tolerance case.  Row panelling (panel_rows) is bit-exact
by construction and asserted against the unpanelled result.
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
                             si_dtype="float32", interpret=True)
    np.testing.assert_allclose(np.asarray(s0), np.asarray(s1),
                               rtol=2e-6, atol=1e-4)


@pytest.mark.parametrize("panel", [16, 24])
def test_lanes_panelled_bitexact(panel):
    """Panelling passes the 5 DP states through the HBM boundary array
    instead of VMEM, which must not change a single bit."""
    Lq, Lt, B, seed = 50, 64, 8, 3
    qp, qtr, tp, ttr, _co, tL = _example_pair(Lq=Lq, Lt=Lt, B=B, seed=seed)
    s0 = viterbi_score_lanes(qp, qtr, tp, ttr, tL, np.float32(-0.03),
                             si_dtype="float32", panel_rows=1024,
                             interpret=True)
    s1 = viterbi_score_lanes(qp, qtr, tp, ttr, tL, np.float32(-0.03),
                             si_dtype="float32", panel_rows=panel,
                             interpret=True)
    np.testing.assert_array_equal(np.asarray(s0), np.asarray(s1))


def test_lanes_bf16_si_close():
    Lq, Lt, B, seed = 64, 40, 8, 1
    qp, qtr, tp, ttr, _co, tL = _example_pair(Lq=Lq, Lt=Lt, B=B, seed=seed)
    co = np.zeros((B, Lq + 1, Lt + 1), bool)
    s0, _i, _j, _bt = viterbi_batch(qp, qtr, tp, ttr, co, tL, -0.03,
                                    0.0, 0.0, 0.0, local=True,
                                    need_bt=False)
    s1 = viterbi_score_lanes(qp, qtr, tp, ttr, tL, np.float32(-0.03),
                             interpret=True)   # default bfloat16 Si
    # ~0.4% per-cell rounding, partially cancelling along the path
    np.testing.assert_allclose(np.asarray(s0), np.asarray(s1),
                               rtol=2e-2, atol=0.2)


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
                             ss_score=ss, si_dtype="float32",
                             interpret=True)
    np.testing.assert_allclose(np.asarray(s0), np.asarray(s1),
                               rtol=2e-6, atol=1e-4)


def test_lanes_with_ss_lut():
    """LUT form == dense form (same table, device-side gather)."""
    Lq, Lt, B = 21, 30, 4
    qp, qtr, tp, ttr, _co, tL = _example_pair(Lq=Lq, Lt=Lt, B=B, seed=2)
    rng = np.random.RandomState(2)
    lut = (rng.rand(64) * 0.5 - 0.25).astype(np.float32)
    qidx = rng.randint(0, 8, size=Lq).astype(np.int32) * 8
    tidx = rng.randint(0, 8, size=(B, Lt)).astype(np.int32)
    ss = lut[qidx[None, :, None] + tidx[:, None, :]]
    ss_full = np.zeros((B, Lq + 1, Lt + 1), np.float32)
    ss_full[:, 1:, 1:] = ss
    s0 = viterbi_score_lanes(qp, qtr, tp, ttr, tL, np.float32(-0.03),
                             ss_score=ss_full, si_dtype="float32",
                             interpret=True)
    s1 = viterbi_score_lanes(qp, qtr, tp, ttr, tL, np.float32(-0.03),
                             ss_lut=lut, ss_qidx=qidx, ss_tidx=tidx,
                             si_dtype="float32", interpret=True)
    np.testing.assert_allclose(np.asarray(s0), np.asarray(s1),
                               rtol=1e-6, atol=1e-5)
