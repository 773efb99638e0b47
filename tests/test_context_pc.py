"""Context-specific pseudocounts (CRF + library engines).

The stock context_data.crf isn't shipped, so these tests build small
synthetic CRFs in the exact CrfState::Write serialization
(src/cs/crf_state-inl.h:79-108) and check the vectorized engine against
a direct per-position transcription of the reference loops
(crf_pseudocounts-inl.h AddToProfile, pseudocounts-inl.h AdmixTo).
"""

import numpy as np
import pytest

from hhsuite_tpu.cs.pseudocounts import (
    Crf, CrfPseudocounts, LibraryPseudocounts, CSBlastAdmix,
    HHsearchAdmix, make_admix, add_to_profile, get_context_engine)
from hhsuite_tpu.cs.context_lib import ContextLibrary, emission_weights


def _make_crf_text(K=7, wlen=5, seed=0):
    rng = np.random.RandomState(seed)
    lines = ["CRF", f"SIZE\t{K}", f"LENG\t{wlen}"]
    for k in range(K):
        lines.append("CrfState")
        lines.append(f"NAME\tstate{k}")
        lines.append(f"BIAS\t{rng.randn() * 2:.8g}")
        lines.append(f"LENG\t{wlen}")
        lines.append("ALPH\t20")
        lines.append("WEIGHTS\t" + "\t".join("ARNDCQEGHILKMFPSTWYV"))
        for i in range(wlen):
            w = np.round(rng.randn(20) * 1500).astype(int)
            lines.append(str(i + 1) + "\t" + "\t".join(map(str, w)))
        pcw = np.round(rng.randn(20) * 800).astype(int)
        lines.append("PC\t" + "\t".join(map(str, pcw)))
        lines.append("//")
    return "\n".join(lines) + "\n"


def _crf_predict_slow(crf, counts):
    """Direct transcription of CrfPseudocounts::AddToProfile."""
    L = counts.shape[0]
    K, wlen = crf.size, crf.wlen
    center = crf.center
    out = np.zeros((L, 20))
    for i in range(L):
        ppi = np.zeros(K)
        for k in range(K):
            s = crf.bias[k]
            beg = max(0, i - center)
            end = min(L, i + center + 1)
            for ii in range(beg, end):
                j = ii - i + center
                s += float(crf.weights[k, j] @ counts[ii])
            ppi[k] = s
        m = ppi.max()
        tmp = m + np.log(np.exp(ppi - m).sum())
        ppi = np.exp(ppi - tmp)
        pc = ppi @ crf.pc
        out[i] = pc / pc.sum()
    return out


def test_crf_parse_shapes():
    crf = Crf.from_text(_make_crf_text(K=5, wlen=3, seed=1))
    assert crf.size == 5 and crf.wlen == 3 and crf.center == 1
    # pc rows are softmaxed pc_weights: positive, sum 1
    np.testing.assert_allclose(crf.pc.sum(axis=1), 1.0, rtol=1e-12)
    assert (crf.pc > 0).all()


def test_crf_predict_matches_reference_loops():
    crf = Crf.from_text(_make_crf_text(K=7, wlen=5, seed=2))
    rng = np.random.RandomState(3)
    L = 17
    neff = 1.0 + 9.0 * rng.rand(L)
    f = rng.dirichlet(np.ones(20) * 0.5, size=L)
    counts = f * neff[:, None]
    fast = CrfPseudocounts(crf).predict(counts)
    slow = _crf_predict_slow(crf, counts)
    np.testing.assert_allclose(fast, slow, rtol=1e-10, atol=1e-14)


def test_admix_functors():
    a = CSBlastAdmix(0.8, 2.0)
    np.testing.assert_allclose(a(np.array([1.0])), [0.8])
    np.testing.assert_allclose(a(np.array([10.0])), [0.8 * 3.0 / 12.0])
    h = HHsearchAdmix(0.9, 4.0, 1.0)
    np.testing.assert_allclose(h(np.array([1.0])), [0.9 / 1.25])
    h2 = HHsearchAdmix(0.9, 4.0, 2.0)
    np.testing.assert_allclose(h2(np.array([8.0])), [0.9 / 5.0])
    assert isinstance(make_admix(3, 0.8, 2.0), CSBlastAdmix)


def test_add_to_profile_admixture():
    crf = Crf.from_text(_make_crf_text(K=4, wlen=3, seed=5))
    eng = CrfPseudocounts(crf)
    rng = np.random.RandomState(7)
    L = 11
    neff = 1.0 + 4.0 * rng.rand(L)
    f = rng.dirichlet(np.ones(20), size=L)
    counts = f * neff[:, None]
    admix = CSBlastAdmix(0.8, 2.0)
    p = add_to_profile(eng, counts, neff, admix)
    pred = eng.predict(counts)
    tau = np.minimum(1.0, 0.8 * 3.0 / (2.0 + neff))
    expect = tau[:, None] * pred + (1 - tau[:, None]) * f
    np.testing.assert_allclose(p, expect, rtol=1e-12)
    np.testing.assert_allclose(p.sum(axis=1), 1.0, rtol=1e-9)


def test_target_neff_bisection():
    crf = Crf.from_text(_make_crf_text(K=4, wlen=3, seed=8))
    eng = CrfPseudocounts(crf)
    rng = np.random.RandomState(9)
    L = 25
    # sharp columns: low Neff without admixture
    f = rng.dirichlet(np.ones(20) * 0.05, size=L)
    neff = np.ones(L)
    counts = f.copy()
    admix = CSBlastAdmix(0.9, 2.0)
    target = 3.0
    p = add_to_profile(eng, counts, neff, admix, target_neff=target)
    ent = -(np.where(p > 0, p * np.log2(np.where(p > 0, p, 1)), 0)).sum()
    got = 2 ** (ent / L)
    assert abs(got - target) < 0.35   # bisection tolerance on pca grid


def test_library_engine_matches_slow():
    lib = ContextLibrary.default_cs219()
    sub = ContextLibrary(priors=lib.priors[:13].copy(),
                         probs=lib.probs[:13].copy(), wlen=lib.wlen)
    eng = LibraryPseudocounts(sub, 1.6, 0.85)
    rng = np.random.RandomState(11)
    L = 9
    neff = 1.0 + 3.0 * rng.rand(L)
    counts = rng.dirichlet(np.ones(20), size=L) * neff[:, None]
    fast = eng.predict(counts)
    # slow path: Emission over log probs, no background subtraction
    w = emission_weights(sub.wlen, 1.6, 0.85)
    logp = np.log(sub.probs)
    logprior = np.log(sub.priors)
    K = sub.size
    center = (sub.wlen - 1) // 2
    slow = np.zeros((L, 20))
    for i in range(L):
        ppi = np.zeros(K)
        for k in range(K):
            s = logprior[k]
            for ii in range(max(0, i - center), min(L, i + center + 1)):
                j = ii - i + center
                s += w[j] * float(counts[ii] @ logp[k, j])
            ppi[k] = s
        m = ppi.max()
        ppi = np.exp(ppi - (m + np.log(np.exp(ppi - m).sum())))
        pc = ppi @ sub.probs[:, center, :]
        slow[i] = pc / pc.sum()
    np.testing.assert_allclose(fast, slow, rtol=1e-10, atol=1e-14)


def test_prepare_query_hmm_with_crf(tmp_path):
    from hhsuite_tpu.constants import Parameters
    from hhsuite_tpu.matrices import get_substitution_matrix
    from hhsuite_tpu.search.query import read_query_text, prepare_query_hmm

    crf_file = tmp_path / "ctx.crf"
    crf_file.write_text(_make_crf_text(K=9, wlen=5, seed=13))
    a3m = (">q\nMKVLAAGITGRQW\n>s1\nMKVLA-GITGKQW\n"
           ">s2\nMRVLAAGLTGRQF\n")

    par = Parameters()
    par.clusterfile = str(crf_file)
    mats = get_substitution_matrix(par.matrix)
    q, _ali, fmt = read_query_text(par, a3m, "q", mats)
    prepare_query_hmm(par, q, mats, fmt)
    p_ctx = q.p[1:q.L + 1, :20].copy()
    np.testing.assert_allclose(p_ctx.sum(axis=1), 1.0, atol=2e-3)

    par2 = Parameters()
    par2.nocontxt = True
    q2, _a, fmt2 = read_query_text(par2, a3m, "q", mats)
    prepare_query_hmm(par2, q2, mats, fmt2)
    assert not np.allclose(p_ctx, q2.p[1:q2.L + 1, :20])

    # engine cache returns the same object
    e1 = get_context_engine(par)
    e2 = get_context_engine(par)
    assert e1 is e2 and e1 is not None
    par.nocontxt = True
    assert get_context_engine(par) is None


def test_crf_serialization_crossvalidated_against_reference_binary():
    """The committed synthetic CRF (fixtures/crossval_syn.crf, the SAME
    bytes _make_crf_text emits) was fed to the round-2 REFERENCE
    cstranslate build (-D syn.crf, its real Crf::Read parser,
    src/cs/crf-inl.h:54-74); its output is committed as
    cstranslate_crf.golden.  This framework's CRF loader + engine must
    reproduce it byte-for-byte — pinning our reader against the real
    serialization, not just our own writer."""
    import os

    from hhsuite_tpu.cli.main import cmd_cstranslate

    fix = os.path.join(os.path.dirname(__file__), "fixtures")
    # the fixture must stay in sync with the generator
    assert open(os.path.join(fix, "crossval_syn.crf")).read() \
        == _make_crf_text()
    out = os.path.join(fix, "..", "..", "/tmp/crf_out.as")
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        out = os.path.join(td, "out.as")
        rc = cmd_cstranslate(
            ["-i", os.path.join(fix, "cst_in.a3m"), "-o", out,
             "-A", "internal",
             "-D", os.path.join(fix, "crossval_syn.crf"),
             "-x", "0.3", "-c", "4", "-I", "a3m"])
        assert rc == 0
        assert open(out, "rb").read() == open(
            os.path.join(fix, "cstranslate_crf.golden"), "rb").read()


def test_context_discovery_via_hhlib_and_nocontxt_warning(tmp_path,
                                                          monkeypatch,
                                                          capsys):
    """Reference hhblits defaults to CRF context pseudocounts
    (hhfunc.cpp:221-236, embedded context_data.crf).  Without -contxt we
    must (a) discover $HHLIB/data/context_data.crf like
    scripts/HHPaths.pm, and (b) otherwise warn loudly ONCE that the run
    degrades to -nocontxt semantics."""
    import hhsuite_tpu.cs.pseudocounts as pc
    from hhsuite_tpu.constants import Parameters

    # (a) discovery: synthetic CRF at $HHLIB/data/context_data.crf
    hhlib = tmp_path / "hh"
    (hhlib / "data").mkdir(parents=True)
    (hhlib / "data" / "context_data.crf").write_text(
        _make_crf_text(K=5, wlen=3, seed=21))
    monkeypatch.setenv("HHLIB", str(hhlib))
    par = Parameters()
    assert par.clusterfile == ""
    eng = pc.get_context_engine(par)
    assert eng is not None
    assert par.clusterfile == str(hhlib / "data" / "context_data.crf")

    # (b) no HHLIB, no -contxt: None + one-time warning mentioning
    # -nocontxt and the reference default
    monkeypatch.delenv("HHLIB", raising=False)
    monkeypatch.delenv("HHSUITE_TPU_DATA", raising=False)
    monkeypatch.setattr(pc, "_warned_no_context", False)
    par2 = Parameters()
    assert pc.get_context_engine(par2) is None
    err = capsys.readouterr().err
    assert "WARNING" in err and "-nocontxt" in err and "-contxt" in err
    # second call: silent (one-time)
    assert pc.get_context_engine(par2) is None
    assert "WARNING" not in capsys.readouterr().err

    # (c) explicit -nocontxt: silent None
    monkeypatch.setattr(pc, "_warned_no_context", False)
    par3 = Parameters()
    par3.nocontxt = True
    assert pc.get_context_engine(par3) is None
    assert "WARNING" not in capsys.readouterr().err
