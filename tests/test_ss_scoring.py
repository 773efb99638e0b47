"""End-to-end secondary-structure scoring (PRED_PRED mode).

Fixtures: query_ss.a3m and ss_db_* carry synthetic >ss_pred/>ss_conf
annotations on both sides; golden_ss.{hhr,m8} are reference hhsearch
outputs (default -ssm 2, ssw 0.11).  The SS score column (34.6 for the
self hit) only appears when build_ss_score/ScoreSS and the S33 matrix
path work end to end.
"""

import os
import re
import shutil

import pytest

from hhsuite_tpu.constants import Parameters

FIX = os.path.join(os.path.dirname(__file__), "fixtures")


@pytest.fixture(scope="module")
def ss_search(tmp_path_factory):
    import jax

    jax.config.update("jax_platforms", "cpu")
    from hhsuite_tpu.search.engine import HHDatabase, run_hhsearch

    tmp = tmp_path_factory.mktemp("ssdb")
    for f in ("a3m", "cs219"):
        shutil.copy(f"{FIX}/ss_db_{f}.ffdata", tmp / f"db_{f}.ffdata")
        shutil.copy(f"{FIX}/ss_db_{f}.ffindex", tmp / f"db_{f}.ffindex")
    par = Parameters()
    par.nocontxt = True
    par.prefilter = False
    par.num_rounds = 1
    db = HHDatabase(str(tmp / "db"))
    with open(f"{FIX}/query_ss.a3m") as f:
        query = f.read()
    q, hitlist = run_hhsearch(par, query, db, "query_ss.a3m")
    return par, q, hitlist


def test_ss_scores_match_golden(ss_search):
    par, q, hitlist = ss_search
    # golden summary: score 1376.0, SS 34.6, 431 cols 1-431/1-431
    h = hitlist.hits[0]
    assert h.matched_cols == 431
    assert (h.i1, h.i2, h.j1, h.j2) == (1, 431, 1, 431)
    assert abs(h.score - 1376.0) < 0.2
    assert abs(h.score_ss - 34.6) < 0.05
    h2 = hitlist.hits[1]
    assert abs(h2.score - 14.4) < 0.2
    assert abs(h2.score_ss - 0.5) < 0.05


def test_ss_m8_token_tolerant(ss_search):
    from hhsuite_tpu.io.results import print_m8

    par, q, hitlist = ss_search
    got = print_m8(q, hitlist, par.nseqdis, par.p, par.E)
    with open(f"{FIX}/golden_ss.m8") as f:
        want = f.read()
    gl, wl = got.splitlines(), want.splitlines()
    assert len(gl) == len(wl)
    for g, w in zip(gl, wl):
        gt, wt = g.split("\t"), w.split("\t")
        assert gt[:10] == wt[:10]
        assert abs(float(gt[10]) - float(wt[10])) \
            <= 0.02 * max(float(wt[10]), 1e-300)
        assert abs(float(gt[11]) - float(wt[11])) <= 0.15


def test_ss_hhr_rows_present(ss_search):
    """The hhr alignment blocks must carry Q/T ss_pred rows."""
    from hhsuite_tpu.io.alignments import print_alignments
    from hhsuite_tpu.matrices import get_substitution_matrix

    par, q, hitlist = ss_search
    mats = get_substitution_matrix(0)
    out = print_alignments(q, hitlist, par, mats.S)
    assert "Q ss_pred" in out
    assert "T ss_pred" in out
    with open(f"{FIX}/golden_ss.hhr") as f:
        want = f.read()
    want_lines = [l for l in want.splitlines() if l.startswith("Q ss_pred")]
    got_lines = [l for l in out.splitlines() if l.startswith("Q ss_pred")]
    assert got_lines == want_lines


def test_ssm1_scores_ss_after_alignment(ss_search):
    """-ssm 1: SS contributes score_ss (computed along the backtrace,
    hhviterbi.cpp:230-236) but is NOT added during the DP, so the
    alignment score equals the no-SS alignment and hit.ssm1 (not ssm2)
    is set for CalcProbab."""
    import shutil as _sh

    import jax

    jax.config.update("jax_platforms", "cpu")
    from hhsuite_tpu.search.engine import HHDatabase, run_hhsearch

    par2, _q, hitlist2 = ss_search
    tmp = os.path.dirname(hitlist2.hits[0].file) or None

    par = Parameters()
    par.nocontxt = True
    par.prefilter = False
    par.num_rounds = 1
    par.ssm = 1
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        for f in ("a3m", "cs219"):
            _sh.copy(f"{FIX}/ss_db_{f}.ffdata", f"{td}/db_{f}.ffdata")
            _sh.copy(f"{FIX}/ss_db_{f}.ffindex", f"{td}/db_{f}.ffindex")
        db = HHDatabase(f"{td}/db")
        with open(f"{FIX}/query_ss.a3m") as f:
            query = f.read()
        _q1, hl1 = run_hhsearch(par, query, db, "query_ss.a3m")
    h1 = hl1.hits[0]
    h2 = hitlist2.hits[0]
    # same SS sum reported, flags swapped to the "after" slot
    assert h1.score_ss == pytest.approx(h2.score_ss, abs=0.05)
    assert h1.ssm1 == 3 and h1.ssm2 == 0
    assert h2.ssm2 == 3 and h2.ssm1 == 0
    # ssm=1 score has no SS inside the DP: for the self-hit the path is
    # the diagonal either way, so score(ssm1) == score(ssm2) - ss
    assert h1.score == pytest.approx(h2.score, abs=0.2)
