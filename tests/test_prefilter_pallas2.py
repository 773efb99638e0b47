"""Pallas stage-2 gapped SW kernel vs the lax.scan reference kernel.

Runs in interpret mode on CPU; both compute the exact SW fixpoint with
saturated-int semantics, so they must agree exactly.
"""

import numpy as np
import pytest

from hhsuite_tpu.ops.prefilter import gapped_scores
from hhsuite_tpu.ops.prefilter_pallas2 import gapped_scores_pallas


@pytest.mark.parametrize("Lq,Ld,B,seed", [
    (100, 64, 24, 1),
    (33, 50, 7, 2),      # B far below one lane tile
    (128, 40, 130, 3),   # Ld not a multiple of the unroll
    (200, 90, 16, 4),    # Lq above one 128-lane tile
])
def test_stage2_pallas_matches_scan(Lq, Ld, B, seed):
    rng = np.random.RandomState(seed)
    qc = (rng.randint(0, 24, size=(220, Lq))
          * (rng.rand(220, Lq) < 0.4)).astype(np.int32)
    qc[219] = 49          # ANY state: score_offset - 1 (pure decay)
    db = rng.randint(0, 219, size=(B, Ld)).astype(np.int32)
    dl = rng.randint(Ld // 2, Ld + 1, size=B).astype(np.int32)
    for b in range(B):
        db[b, dl[b]:] = 219
    gi, ge, off = np.int32(24), np.int32(4), np.int32(50)
    r0 = np.asarray(gapped_scores(qc, db, dl, gi, ge, off))
    r1 = np.asarray(gapped_scores_pallas(qc, db, dl, gi, ge, off,
                                         interpret=True))
    assert np.array_equal(r0, r1)
