"""Interim filter when the merged MSA approaches -maxseq.

Regression: merging near par.maxseq triggers the interim filter on an
alignment whose X matrix predates the in-round merges; the reference
filters those rows as all-GAP (initX, hhalignment.cpp:70-76) and drops
them in Shrink, and must not crash on the size mismatch."""

import os

import numpy as np

import hhsuite_tpu.search.engine as eng
from hhsuite_tpu.constants import Parameters
from hhsuite_tpu.io.ffindex import FFindexDatabase, build_ffindex
from hhsuite_tpu.search.hhblits import run_hhblits

FIX = os.path.join(os.path.dirname(__file__), "fixtures")


def _mkdb(tmp_path, n):
    for comp, src in [("a3m", "single_a3m"), ("hhm", "single_hhm"),
                      ("cs219", "golden_single_cs219")]:
        db = FFindexDatabase(os.path.join(FIX, src + ".ffdata"),
                             os.path.join(FIX, src + ".ffindex"))
        data = db.read_bytes(db.entries[0])
        items = [(f"t{i}", data) for i in range(n)]
        build_ffindex(str(tmp_path / f"db_{comp}.ffdata"),
                      str(tmp_path / f"db_{comp}.ffindex"), items)
    return str(tmp_path / "db")


def test_hhblits_interim_filter_near_maxseq(tmp_path):
    base = _mkdb(tmp_path, 8)
    par = Parameters()
    par.nocontxt = True
    par.num_rounds = 2
    par.maxseq = 120          # 59-seq query + two 59-seq merges > cap
    db = eng.HHDatabase(base)
    query = open(os.path.join(FIX, "query.a3m")).read()
    q, hitlist, qali = run_hhblits(par, query, db, "query.a3m")
    assert qali.N_in <= par.maxseq
    assert len(list(hitlist)) >= 8
    # the merged MSA still contains the query row and parses cleanly
    assert qali.kfirst >= 0
    assert qali.X.shape[0] == qali.N_in
