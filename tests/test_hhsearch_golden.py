"""End-to-end hhsearch vs reference golden outputs (data/test.sh flow).

Runs the full pipeline — query MSA -> HMM -> Viterbi -> EVD statistics ->
MAC realign -> writers — against the single-entry database built by the
reference tools, and diffs blasttab (must be byte-identical) and hhr
(identical modulo documented float-drift classes: rcpps-class profile
drift can flip symbol/confidence glyph thresholds and the last digit of
Sum_probs/Neff).
"""

import os
import re
import shutil

import numpy as np
import pytest

from hhsuite_tpu.constants import Parameters
from hhsuite_tpu.io.alignments import print_alignments
from hhsuite_tpu.io.results import print_hit_list, print_m8
from hhsuite_tpu.matrices import get_substitution_matrix
from hhsuite_tpu.search.engine import HHDatabase, run_hhsearch

FIX = os.path.join(os.path.dirname(__file__), "fixtures")


@pytest.fixture(scope="module")
def search_result(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("db")
    for src, dst in [("single_a3m", "single_a3m"),
                     ("single_hhm", "single_hhm"),
                     ("golden_single_cs219", "single_cs219")]:
        shutil.copy(f"{FIX}/{src}.ffdata", tmp / f"{dst}.ffdata")
        shutil.copy(f"{FIX}/{src}.ffindex", tmp / f"{dst}.ffindex")
    par = Parameters()
    par.nocontxt = True
    par.prefilter = False
    par.num_rounds = 1
    db = HHDatabase(str(tmp / "single"))
    with open(f"{FIX}/query.a3m") as f:
        query = f.read()
    q, hitlist = run_hhsearch(par, query, db, "query.a3m")
    return par, q, hitlist


def test_blasttab_byte_identical(search_result):
    par, q, hitlist = search_result
    got = print_m8(q, hitlist, nhits_min_b=par.b, p=par.p, E=par.E)
    with open(f"{FIX}/golden_hhsearch.blasttab") as f:
        want = f.read()
    assert got == want


def test_hit_statistics(search_result):
    par, q, hitlist = search_result
    hits = hitlist.hits
    assert len(hits) == 2
    h = hits[0]
    assert h.matched_cols == 431
    assert (h.i1, h.i2, h.j1, h.j2) == (1, 431, 1, 431)
    assert abs(h.score - 1378.39) < 0.05
    assert abs(-h.score_aass - 953.8) < 0.05
    assert h.Probab > 99.99


def test_hhr_matches_golden(search_result):
    par, q, hitlist = search_result
    mats = get_substitution_matrix(0)
    got = (print_hit_list(q, hitlist, z=par.z, Z=par.Z, p=par.p, E=par.E,
                          datestr="X")
           + print_alignments(q, hitlist, par, mats.S))
    with open(f"{FIX}/golden_hhsearch.hhr") as f:
        want = f.read()
    got_l = [l for l in got.splitlines()
             if not l.startswith(("Date", "Command"))]
    want_l = [l for l in want.splitlines()
              if not l.startswith(("Date", "Command"))]
    assert len(got_l) == len(want_l)
    exact = 0
    for g, w in zip(got_l, want_l):
        if g == w:
            exact += 1
            continue
        if g.startswith("Neff"):
            assert abs(float(g.split()[1]) - float(w.split()[1])) < 1e-3
            continue
        if g.startswith("Probab="):
            gs = re.sub(r"Sum_probs=\S+", "", g)
            ws = re.sub(r"Sum_probs=\S+", "", w)
            assert gs == ws, (g, w)
            gp = float(re.search(r"Sum_probs=(\S+)", g).group(1))
            wp = float(re.search(r"Sum_probs=(\S+)", w).group(1))
            assert abs(gp - wp) < 0.5
            continue
        # symbol / confidence rows: glyph thresholds can flip on
        # ulp-level score drift
        agree = sum(1 for a, b in zip(g, w) if a == b) / max(len(w), 1)
        assert agree > 0.9, (g, w)
    assert exact / len(want_l) > 0.85, f"only {exact}/{len(want_l)} exact"


def _tokens_close(got, want, tol=0.02):
    gl = got.splitlines()
    wl = want.splitlines()
    assert len(gl) == len(wl)
    for g, w in zip(gl, wl):
        if g == w:
            continue
        gt, wt = g.split(), w.split()
        assert len(gt) == len(wt), (g, w)
        for a, b in zip(gt, wt):
            if a == b:
                continue
            fa, fb = float(a), float(b)
            assert abs(fa - fb) <= tol * max(1.0, abs(fb)), (g, w)


def test_scores_file(search_result):
    from hhsuite_tpu.io.results import print_score_file

    par, q, hitlist = search_result
    got = print_score_file(q, hitlist)
    with open(f"{FIX}/golden_hhsearch.scores") as f:
        want = f.read()
    _tokens_close(got, want)


def test_alitab_file(search_result):
    from hhsuite_tpu.io.results import write_alitab

    par, q, hitlist = search_result
    got = write_alitab(q, hitlist, par.b, par.B, par.z, par.Z, par.p,
                       par.E)
    with open(f"{FIX}/golden_hhsearch.atab") as f:
        want = f.read()
    gl, wl = got.splitlines(), want.splitlines()
    assert len(gl) == len(wl)
    exact = sum(1 for a, b in zip(gl, wl) if a == b)
    assert exact / len(wl) > 0.97


@pytest.mark.parametrize("fmt,name", [(1, "fas"), (2, "a2m"), (3, "a3m")])
def test_pairwise_formats_byte_identical(search_result, fmt, name):
    """-Ofas/-Oa2m/-Oa3m outputs (PrintFASTA/PrintA2M/PrintA3M) against
    reference-generated goldens; these writers see the premerge-mutated
    query profile (realign_q)."""
    from hhsuite_tpu.io.alignments import print_alignments

    par, q, hitlist = search_result
    mats = get_substitution_matrix(0)
    got = print_alignments(q.realign_q, hitlist, par, mats.S,
                           outformat=fmt)
    with open(f"{FIX}/golden_hhsearch_O{name}.txt") as f:
        want = f.read()
    assert got == want
