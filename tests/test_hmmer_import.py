"""HMMER3 template import vs reference hhsearch golden.

The fixture hmmer3_model.hmm is a synthetic HMMER3/f model generated
from the single-template profile; golden_hmmer3.{hhr,m8,atab} are the
reference hhsearch outputs searching query.a3m against a database whose
hhm ffindex holds that HMMER3 file (format=1 path: no pseudocounts
added, COMPO background, entropy/EFFN-derived Neff).
"""

import os
import re
import shutil

import pytest

from hhsuite_tpu.constants import Parameters
from hhsuite_tpu.io.hmmer import read_hmmer2, read_hmmer3

FIX = os.path.join(os.path.dirname(__file__), "fixtures")


def test_read_hmmer3_basic():
    with open(f"{FIX}/hmmer3_model.hmm") as f:
        t = read_hmmer3(f.read(), filestr="hmmer3_model.hmm")
    assert t.L == 431
    assert t.name == "FAM69B_test"
    assert t.longname.startswith("T0001.1 FAM69B_test synthetic")
    assert t.has_pseudocounts
    assert abs(t.Neff_HMM - (-1.403534 * 4.274305 ** 0.1
                             + 4.428118 * 4.274305 ** 0.5
                             - 0.2885410 * 4.274305 - 1.108568)) < 1e-4
    # emission rows are probabilities
    assert abs(float(t.f[1].sum()) - 1.0) < 0.05
    assert t.nfirst >= 0 and len(t.seq[t.nfirst]) == t.L + 1


@pytest.fixture(scope="module")
def hmmer_search(tmp_path_factory):
    import jax

    jax.config.update("jax_platforms", "cpu")
    from hhsuite_tpu.io.ffindex import FFindexDatabase, FFindexWriter
    from hhsuite_tpu.search.engine import HHDatabase, run_hhsearch

    tmp = tmp_path_factory.mktemp("hmmerdb")
    a3m = FFindexDatabase(f"{FIX}/single_a3m.ffdata",
                          f"{FIX}/single_a3m.ffindex")
    name = a3m.entries[0].name
    with open(f"{FIX}/hmmer3_model.hmm", "rb") as f:
        model = f.read()
    with FFindexWriter(str(tmp / "db_hhm.ffdata"),
                       str(tmp / "db_hhm.ffindex")) as w:
        w.add(name, model)
    shutil.copy(f"{FIX}/single_a3m.ffdata", tmp / "db_a3m.ffdata")
    shutil.copy(f"{FIX}/single_a3m.ffindex", tmp / "db_a3m.ffindex")
    shutil.copy(f"{FIX}/golden_single_cs219.ffdata",
                tmp / "db_cs219.ffdata")
    shutil.copy(f"{FIX}/golden_single_cs219.ffindex",
                tmp / "db_cs219.ffindex")
    par = Parameters()
    par.nocontxt = True
    par.prefilter = False
    par.num_rounds = 1
    db = HHDatabase(str(tmp / "db"))
    with open(f"{FIX}/query.a3m") as f:
        query = f.read()
    q, hitlist = run_hhsearch(par, query, db, "query.a3m")
    return par, q, hitlist


def test_hmmer3_hit_statistics(hmmer_search):
    par, q, hitlist = hmmer_search
    hits = hitlist.hits
    assert len(hits) == 2
    h = hits[0]
    # golden summary line:
    #  1 T0001.1 ... 100.0 9E-185 9E-185 1373.6 0.0 431 1-431 1-431 (431)
    assert h.matched_cols == 431
    assert (h.i1, h.i2, h.j1, h.j2) == (1, 431, 1, 431)
    assert abs(h.score - 1373.6) < 0.5
    assert h.Probab > 99.9
    h2 = hits[1]
    assert (h2.i1, h2.i2) == (78, 96)
    assert (h2.j1, h2.j2) == (344, 359)
    assert abs(h2.score - 14.4) < 0.3


def test_hmmer3_m8_matches_golden(hmmer_search):
    from hhsuite_tpu.io.results import print_m8

    par, q, hitlist = hmmer_search
    got = print_m8(q, hitlist, nhits_min_b=par.b, p=par.p, E=par.E)
    with open(f"{FIX}/golden_hmmer3.m8") as f:
        want = f.read()
    gl, wl = got.splitlines(), want.splitlines()
    assert len(gl) == len(wl)
    for g, w in zip(gl, wl):
        gt, wt = g.split("\t"), w.split("\t")
        assert gt[:10] == wt[:10], (g, w)
        # E-value/score columns: allow last-digit drift
        assert abs(float(gt[11]) - float(wt[11])) <= 0.11
