"""Batched device Forward/Backward/MAC vs the reference-exact host
decoder.

fb_mac_batch is the bulk-throughput float32 path; this test pins it to
the scalar/native float64 decoder on the real PF02826 fixture profile
(strong self-alignment signal, so MAC decisions are far from ties and
the float32 path must reproduce the exact MAC alignment)."""

import os

import numpy as np
import pytest

from hhsuite_tpu.constants import Parameters
from hhsuite_tpu.core.hit import Hit
from hhsuite_tpu.matrices import get_substitution_matrix
from hhsuite_tpu.search.engine import (prepare_query_hmm,
                                       prepare_template_hmm,
                                       read_query_text)
from hhsuite_tpu.search.posterior import (PosteriorDecoder,
                                          prepare_query_transitions,
                                          prepare_template_transitions)

FIX = os.path.join(os.path.dirname(__file__), "fixtures")


@pytest.fixture(scope="module")
def qt_pair():
    par = Parameters()
    par.nocontxt = True
    mats = get_substitution_matrix(par.matrix)
    text = open(os.path.join(FIX, "query.a3m")).read()
    q, _qali, fmt = read_query_text(par, text, "query.a3m", mats)
    prepare_query_hmm(par, q, mats, fmt)
    import copy

    # the prepared query doubles as the template; divide its emissions
    # by the background like IncludeNullModelInHMM does for templates
    # (hhhmm.cpp:2059) so match odds are > 1 along the self-alignment
    t = copy.deepcopy(q)
    t.p = (t.p / mats.pb[None, :]).astype(t.p.dtype)
    q.log2lin_transitions()
    prepare_query_transitions(q)
    t.log2lin_transitions()
    prepare_template_transitions(t)
    return par, q, t


def test_device_matches_host(qt_pair):
    par, q, t = qt_pair
    Lq, Lt = q.L, t.L
    co = np.zeros((Lq + 1, Lt + 1), dtype=bool)

    hit = Hit()
    hit.ssm1 = hit.ssm2 = 0
    p_mm = np.zeros((Lq + 1, Lt + 1), dtype=np.float64)
    scale = np.ones(Lq + 2, dtype=np.float64)
    dec = PosteriorDecoder(local=True, ssw=par.ssw_realign)
    dec._forward(q, t, hit, p_mm, co.copy(), par.shift, scale)
    dec._backward(q, t, hit, p_mm, co.copy(), par.shift, scale)
    bmac = dec._mac(q, t, hit, p_mm, co.copy(), par.mact)
    host_score = hit.score
    host_i2, host_j2 = hit.i2, hit.j2

    from hhsuite_tpu.ops.posterior_batch import fb_mac_batch, mac_walk

    score, b_mac, i2, j2, pmm_d = fb_mac_batch(
        q.p.astype(np.float32), q.tr.astype(np.float32),
        t.p.astype(np.float32)[None], t.tr.astype(np.float32)[None],
        co[None], float(par.shift), float(par.mact), local=True)
    score = np.asarray(score)[0]
    pmm_d = np.asarray(pmm_d)[0]
    b_d = np.asarray(b_mac)[0]

    assert score == pytest.approx(host_score, rel=1e-3, abs=0.05)
    # posteriors: float32 vs float64, band-free full matrices
    np.testing.assert_allclose(pmm_d, p_mm, rtol=5e-3, atol=1e-5)
    assert int(np.asarray(i2)[0]) == host_i2
    assert int(np.asarray(j2)[0]) == host_j2
    # MAC decisions agree except at numerical plateaus
    agree = (b_d == bmac).mean()
    assert agree > 0.995

    # device walk reproduces the host backtrace path
    st, ii, jj, post, n, mm_count, empty = mac_walk(
        b_mac, pmm_d[None], i2, j2, kmax=Lq + Lt + 2)
    dec2 = PosteriorDecoder(local=True, ssw=par.ssw_realign)
    dec2._backtrace_mac(q, t, hit, p_mm, co.copy(), bmac, par.corr)
    nb = int(np.asarray(n)[0])
    assert not bool(np.asarray(empty)[0])
    np.testing.assert_array_equal(np.asarray(ii)[0, :nb], hit.i[1:])
    np.testing.assert_array_equal(np.asarray(jj)[0, :nb], hit.j[1:])
    np.testing.assert_array_equal(np.asarray(st)[0, :nb - 1],
                                  hit.states[1:-1])
    assert 1 + int(np.asarray(mm_count)[0]) == hit.matched_cols
    pp = np.asarray(post)[0, :nb]
    np.testing.assert_allclose(pp, hit.P_posterior[1:], rtol=5e-3,
                               atol=1e-5)


def test_device_banded_and_batched(qt_pair):
    """Corridor mask + B=2 batch: each lane independent, co respected."""
    par, q, t = qt_pair
    Lq, Lt = q.L, t.L
    co0 = np.zeros((Lq + 1, Lt + 1), dtype=bool)
    co1 = np.zeros((Lq + 1, Lt + 1), dtype=bool)
    # band lane 1 to ±40 around the diagonal (the self-alignment path)
    ii, jj = np.meshgrid(np.arange(Lq + 1), np.arange(Lt + 1),
                         indexing="ij")
    co1[np.abs(ii - jj) > 40] = True
    co1[0, :] = False

    from hhsuite_tpu.ops.posterior_batch import fb_mac_batch, mac_walk

    tp = np.stack([t.p.astype(np.float32)] * 2)
    ttr = np.stack([t.tr.astype(np.float32)] * 2)
    co = np.stack([co0, co1])
    score, b_mac, i2, j2, pmm_d = fb_mac_batch(
        q.p.astype(np.float32), q.tr.astype(np.float32), tp, ttr, co,
        float(par.shift), float(par.mact), local=True)

    # host oracle for the banded lane
    hit = Hit()
    hit.ssm1 = hit.ssm2 = 0
    p_mm = np.zeros((Lq + 1, Lt + 1), dtype=np.float64)
    scale = np.ones(Lq + 2, dtype=np.float64)
    dec = PosteriorDecoder(local=True, ssw=par.ssw_realign)
    dec._forward(q, t, hit, p_mm, co1, par.shift, scale)
    dec._backward(q, t, hit, p_mm, co1, par.shift, scale)
    bmac = dec._mac(q, t, hit, p_mm, co1, par.mact)

    assert np.asarray(score)[1] == pytest.approx(hit.score, rel=2e-4,
                                                 abs=2e-3)
    np.testing.assert_allclose(np.asarray(pmm_d)[1], p_mm, rtol=5e-3,
                               atol=1e-5)
    assert int(np.asarray(i2)[1]) == hit.i2
    assert int(np.asarray(j2)[1]) == hit.j2
    # banded posterior must be zero outside the corridor
    assert np.asarray(pmm_d)[1][co1].max() == 0.0
