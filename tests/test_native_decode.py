"""Parity: native vit_decode_rescore == the Python phase-2 decode loop.

The native call replaces, for the no-SS TPU fast path, the chain
backtrace_walk_unpack8 -> per-hit unpack -> batched
scalar_prod20/fast_log2 -> backtrace_score_terms (reference semantics:
src/hhhit.cpp backtrace + hhviterbi.cpp:224-252 rescoring).  This test
drives both paths from the same device-built int8 walk payload
(ops/viterbi._backtrace_walk_packed8 runs fine on CPU) over random DP
backtrace matrices and asserts bit-identical outputs.
"""

import numpy as np
import pytest

from hhsuite_tpu import fastmath as fm
from hhsuite_tpu.native import load as load_native
from hhsuite_tpu.ops import viterbi as V

nat = load_native()
pytestmark = pytest.mark.skipif(
    nat is None or not hasattr(nat, "vit_decode_rescore"),
    reason="native module unavailable")


def _random_payload(rng, B, Lq, Lt):
    """Random-but-valid bt matrices: every cell gets a random pair
    state and random continuation bits; endpoints inside the DP."""
    bt = rng.randint(0, 128, size=(B, Lq + 1, Lt + 1)).astype(np.uint8)
    # bt low-3 bits must be a valid state code for MM moves
    state_codes = np.array([V.STOP, V.MM, V.GD, V.IM, V.DG, V.MI],
                           np.uint8)
    low = state_codes[rng.randint(0, 6, size=bt.shape)]
    bt = (bt & 0xF8) | low
    i2 = rng.randint(1, Lq + 1, size=B).astype(np.int32)
    j2 = rng.randint(1, Lt + 1, size=B).astype(np.int32)
    score = rng.randn(B).astype(np.float32) * 10
    kmax = Lq + Lt + 1
    packed = np.asarray(V._backtrace_walk_packed8(
        bt, i2, j2, score, kmax=kmax))
    return packed, kmax


def test_native_decode_matches_python():
    rng = np.random.RandomState(7)
    B, Lq, Lt = 13, 37, 29
    packed, kmax = _random_payload(rng, B, Lq, Lt)
    qp = rng.rand(Lq + 2, 20).astype(np.float32) + 0.01
    tps = [rng.rand(Lt + 2, 20).astype(np.float32) + 0.01
           for _ in range(B)]
    corr = 0.1

    dec = V.decode_rescore_native(
        np.ascontiguousarray(packed), kmax, qp, tps, corr, nat)

    unpack = V.backtrace_walk_unpack8(packed, kmax)
    for b in range(B):
        i_steps, j_steps, states, matched = unpack(b)
        nb = len(i_steps) - 1
        assert int(dec.n[b]) == nb
        assert int(dec.matched[b]) == matched
        np.testing.assert_array_equal(dec.ii2[b, : nb + 1], i_steps)
        np.testing.assert_array_equal(dec.jj2[b, : nb + 1], j_steps)
        np.testing.assert_array_equal(dec.st2[b, : nb + 1], states)
        # python reference rescore (the phase-2 loop's exact ops)
        mm = states[1:] == V.MM
        mi = i_steps[1:][mm]
        mj = j_steps[1:][mm]
        S = np.zeros(nb + 1, np.float32)
        if len(mi):
            S[1:][mm] = fm.fast_log2(fm.scalar_prod20(qp[mi],
                                                      tps[b][mj]))
        S_ss = np.zeros(nb + 1, np.float32)
        sc_ss, corr_term = nat.backtrace_score_terms(
            np.ascontiguousarray(S), np.ascontiguousarray(S_ss),
            int(nb), float(np.float32(corr)))
        sc = np.float32(unpack.score[b])
        if nb:
            sc = np.float32(sc + np.float32(corr_term))
        np.testing.assert_array_equal(dec.S2[b, : nb + 1], S)
        assert dec.score[b] == np.float32(sc)
        assert dec.sc_ss[b] == np.float32(sc_ss)
        assert int(dec.i2[b]) == int(unpack.i2[b])
        assert int(dec.j2[b]) == int(unpack.j2[b])


def test_native_decode_pnul_division_matches_prediv():
    """Raw profiles + per-lane pnul == pre-divided profiles: the in-C
    f32 division is the deferred include_null_model (hhhmm.cpp:
    2139-2142) and must be bit-identical to dividing the array."""
    rng = np.random.RandomState(3)
    B, Lq, Lt = 6, 21, 17
    packed, kmax = _random_payload(rng, B, Lq, Lt)
    packed = np.ascontiguousarray(packed)
    qp = rng.rand(Lq + 2, 20).astype(np.float32) + 0.01
    raw = [rng.rand(Lt + 2, 20).astype(np.float32) + 0.01
           for _ in range(B)]
    pnul = rng.rand(B, 20).astype(np.float32) + 0.2
    prediv = [(raw[b] / pnul[b][None, :]).astype(np.float32)
              for b in range(B)]
    d_raw = V.decode_rescore_native(packed, kmax, qp, raw, 0.07, nat,
                                    pnul=pnul)
    d_div = V.decode_rescore_native(packed, kmax, qp, prediv, 0.07, nat)
    np.testing.assert_array_equal(d_raw.S2, d_div.S2)
    np.testing.assert_array_equal(d_raw.score, d_div.score)


def test_native_decode_corrupt_header_is_safe():
    """Adversarial payload headers (huge/negative n, out-of-range
    endpoints) must not crash or read out of bounds — S lookups for
    positions outside the profile buffers are skipped, the walk count
    is clamped to [0, kmax]."""
    rng = np.random.RandomState(5)
    B, Lq, Lt = 3, 11, 9
    packed, kmax = _random_payload(rng, B, Lq, Lt)
    packed = np.ascontiguousarray(packed).copy()
    packed[0, 8:12].view(np.int32)[0] = 2 ** 30                # n huge
    packed[1, 8:12].view(np.int32)[0] = -7                     # n < 0
    packed[2, 4:6].view(np.int16)[0] = 32000                   # i2 OOB
    qp = rng.rand(Lq + 2, 20).astype(np.float32)
    tps = [rng.rand(Lt + 2, 20).astype(np.float32) for _ in range(B)]
    dec = V.decode_rescore_native(packed, kmax, qp, tps, 0.1, nat)
    assert int(dec.n[0]) <= kmax
    assert int(dec.n[1]) == 0
    assert np.isfinite(dec.S2).all()


def test_native_decode_empty_and_padding():
    rng = np.random.RandomState(11)
    B, Lq, Lt = 4, 9, 7
    packed, kmax = _random_payload(rng, B, Lq, Lt)
    # force lane 1 to an empty walk (n=0) by zeroing its header count
    packed = np.ascontiguousarray(packed).copy()
    packed[1, 8:12] = 0
    qp = rng.rand(Lq + 2, 20).astype(np.float32)
    tps = [rng.rand(Lt + 2, 20).astype(np.float32) for _ in range(2)]
    # only 2 real lanes: padding lanes must stay untouched zeros
    dec = V.decode_rescore_native(packed, kmax, qp, tps, 0.05, nat)
    assert int(dec.n[1]) == 0
    assert dec.st2[1, 0] == 0
    assert float(dec.score[1]) == np.float32(
        packed[1, 0:4].copy().view(np.float32)[0])
    assert not dec.score[2:].any()
    assert not dec.n[2:].any()
