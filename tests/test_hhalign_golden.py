"""hhalign -i query.a3m -t query.a3m vs the reference golden hhr
(data/test.sh:10 smoke test)."""

import os
import re

import pytest

from hhsuite_tpu.constants import Parameters
from hhsuite_tpu.io.alignments import print_alignments
from hhsuite_tpu.io.results import print_hit_list
from hhsuite_tpu.matrices import get_substitution_matrix
from hhsuite_tpu.search.engine import run_hhalign

FIX = os.path.join(os.path.dirname(__file__), "fixtures")


@pytest.fixture(scope="module")
def align_result():
    par = Parameters.hhalign_defaults()
    par.nocontxt = True
    with open(f"{FIX}/query.a3m") as f:
        query = f.read()
    q, hitlist, _qali = run_hhalign(par, query, [("query.a3m", query)],
                             "query.a3m")
    return par, q, hitlist


def test_hhalign_summary(align_result):
    par, q, hitlist = align_result
    with open(f"{FIX}/golden_hhalign_self.hhr") as f:
        want = f.read()
    want_rows = [l for l in want.splitlines()
                 if re.match(r"\s*\d+ sp\|", l)]
    got = print_hit_list(q, hitlist, z=par.z, Z=par.Z, p=par.p, E=par.E,
                         datestr="X")
    got_rows = [l for l in got.splitlines()
                if re.match(r"\s*\d+ sp\|", l)]
    assert len(got_rows) == len(want_rows)
    for g, w in zip(got_rows, want_rows):
        if g == w:
            continue
        # allow last-digit drift in the Score column only
        gt, wt = g.split(), w.split()
        assert len(gt) == len(wt)
        for a, b in zip(gt, wt):
            if a == b:
                continue
            assert abs(float(a) - float(b)) < 0.2, (g, w)


def test_hhalign_blocks(align_result):
    par, q, hitlist = align_result
    mats = get_substitution_matrix(0)
    got = print_alignments(q, hitlist, par, mats.S)
    with open(f"{FIX}/golden_hhalign_self.hhr") as f:
        want = f.read()
    # golden file = hit list + alignments; take the alignment section
    want_blocks = want[want.index("No 1"):]
    got_l = got.splitlines()
    want_l = want_blocks.splitlines()
    assert len(got_l) == len(want_l)
    exact = 0
    for g, w in zip(got_l, want_l):
        if g == w:
            exact += 1
            continue
        if g.startswith("Probab="):
            gs = re.sub(r"Sum_probs=\S+", "", g)
            ws = re.sub(r"Sum_probs=\S+", "", w)
            assert gs == ws, (g, w)
            continue
        agree = sum(1 for a, b in zip(g, w) if a == b) / max(len(w), 1)
        assert agree > 0.9, (g, w)
    assert exact / len(want_l) > 0.85


def test_hhalign_oa3m_merge_matches_reference():
    """-oa3m after hhalign merges the template into the query MSA
    (hhalign.cpp:658-668); golden produced by a reference binary build:
    hhalign -i query.a3m -t query.a3m -oa3m ... -nocontxt."""
    from hhsuite_tpu.apps import write_alignment_a3m
    from hhsuite_tpu.constants import Parameters
    from hhsuite_tpu.search.engine import run_hhalign

    par = Parameters.hhalign_defaults()
    par.nocontxt = True
    with open(f"{FIX}/query.a3m") as f:
        query = f.read()
    _q, _hl, qali = run_hhalign(par, query, [("query.a3m", query)],
                                "query.a3m")
    got = write_alignment_a3m(qali)
    with open(f"{FIX}/golden_hhalign_merge.a3m") as f:
        assert got == f.read()
