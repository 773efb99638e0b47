"""Pallas stage-1 prefilter kernel vs the lax.scan reference kernel.

Runs in interpret mode on CPU; both paths must agree exactly (integer
arithmetic throughout).
"""

import numpy as np
import pytest

from hhsuite_tpu.ops.prefilter import ungapped_scores
from hhsuite_tpu.ops.prefilter_pallas import ungapped_scores_pallas


@pytest.mark.parametrize("Lq,Ld,B,seed", [
    (100, 64, 24, 1),
    (33, 50, 7, 2),      # B far below one lane tile
    (128, 40, 130, 3),   # Ld not a multiple of the unroll
])
def test_stage1_pallas_matches_scan(Lq, Ld, B, seed):
    rng = np.random.RandomState(seed)
    qc = (rng.randint(0, 12, size=(220, Lq))
          * (rng.rand(220, Lq) < 0.3)).astype(np.int32)
    qc[219] = 4           # ANY state: score_offset - 1 (pure decay)
    db = rng.randint(0, 219, size=(B, Ld)).astype(np.int32)
    dl = rng.randint(Ld // 2, Ld + 1, size=B).astype(np.int32)
    for b in range(B):
        db[b, dl[b]:] = 219
    r0 = np.asarray(ungapped_scores(qc, db, dl, np.int32(5)))
    r1 = np.asarray(ungapped_scores_pallas(qc, db, dl, np.int32(5),
                                           interpret=True))
    assert np.array_equal(r0, r1)
