"""Device-batched backtrace decode vs the scalar host walk.

`backtrace_walk` must reproduce `backtrace` (src/hhviterbi.cpp:83-160)
exactly for every lane: same step lists, same matched-column counts,
including the border-stop rules and the final-state-overwritten-to-MM
reference quirk.  Random byte matrices cover all decision-bit
combinations, including invalid 3-bit MM predecessor codes.
"""

import numpy as np

from hhsuite_tpu.ops import viterbi as V


def test_walk_matches_scalar_random():
    rng = np.random.RandomState(7)
    B, Lq, Lt = 16, 33, 47
    bt = rng.randint(0, 256, size=(B, Lq + 1, Lt + 1)).astype(np.uint8)
    i2 = rng.randint(0, Lq + 1, size=B).astype(np.int32)
    j2 = rng.randint(0, Lt + 1, size=B).astype(np.int32)

    unpack = V.backtrace_walk_host(bt, i2, j2, kmax=Lq + Lt + 1)
    for b in range(B):
        ih, jh, sh, mh = V.backtrace(bt[b], int(i2[b]), int(j2[b]))
        iw, jw, sw, mw = unpack(b)
        np.testing.assert_array_equal(ih, iw)
        np.testing.assert_array_equal(jh, jw)
        np.testing.assert_array_equal(sh, sw)
        assert mh == mw


def test_walk_empty_lane():
    bt = np.zeros((2, 5, 6), dtype=np.uint8)
    unpack = V.backtrace_walk_host(bt, np.zeros(2, np.int32),
                                   np.zeros(2, np.int32), kmax=11)
    ih, jh, sh, mh = V.backtrace(bt[0], 0, 0)
    iw, jw, sw, mw = unpack(0)
    np.testing.assert_array_equal(ih, iw)
    np.testing.assert_array_equal(jh, jw)
    np.testing.assert_array_equal(sh, sw)
    assert mh == mw


def test_packed_walk_matches_unpacked():
    """backtrace_walk_host(score=...) must reproduce the plain path:
    one packed f32 transfer, identical step lists and scores."""
    rng = np.random.default_rng(5)
    Lq = Lt = 24
    from tests.test_viterbi_kernel import _rand_hmm

    qp, qtr = _rand_hmm(Lq, rng)
    tp, ttr = _rand_hmm(Lt, rng)
    co = np.zeros((2, Lq + 1, Lt + 1), bool)
    tpb = np.stack([tp, tp * 0.9 + 0.1])
    ttrb = np.stack([ttr, ttr])
    s, i2, j2, bt = V.viterbi_batch(qp, qtr, tpb, ttrb, co,
                                    np.full(2, Lt, np.int32),
                                    -0.03, 0.0, 0.0, 0.0, local=True)
    kmax = Lq + Lt + 1
    plain = V.backtrace_walk_host(bt, i2, j2, kmax=kmax)
    packed = V.backtrace_walk_host(bt, i2, j2, kmax=kmax, score=s)
    np.testing.assert_allclose(packed.score, np.asarray(s), rtol=0)
    np.testing.assert_array_equal(packed.i2, np.asarray(i2))
    np.testing.assert_array_equal(packed.j2, np.asarray(j2))
    for b in range(2):
        for x, y in zip(plain(b), packed(b)):
            np.testing.assert_array_equal(x, y)
