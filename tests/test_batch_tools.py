"""hhsuitedb builder + batch driver + early-stopping filter."""

import os
import shutil

import pytest

from hhsuite_tpu.constants import Parameters

FIX = os.path.join(os.path.dirname(__file__), "fixtures")


@pytest.fixture(scope="module")
def built_db(tmp_path_factory):
    import jax

    jax.config.update("jax_platforms", "cpu")
    from hhsuite_tpu.tools.hhsuitedb import build_hhsuite_db

    tmp = tmp_path_factory.mktemp("dbbuild")
    shutil.copy(f"{FIX}/query.a3m", tmp / "fam1.a3m")
    shutil.copy(f"{FIX}/omat_template.a3m", tmp / "fam2.a3m") \
        if os.path.exists(f"{FIX}/omat_template.a3m") else None
    # derive a second family from the omat fixture db
    from hhsuite_tpu.io.ffindex import FFindexDatabase

    src = FFindexDatabase(f"{FIX}/omat_db_a3m.ffdata",
                          f"{FIX}/omat_db_a3m.ffindex")
    (tmp / "fam2.a3m").write_text(src.read_text(src.entries[0].name))
    build_hhsuite_db(str(tmp / "mydb"),
                     [str(tmp / "fam1.a3m"), str(tmp / "fam2.a3m")],
                     threads=1, log=lambda *a: None)
    return tmp


def test_hhsuitedb_layout(built_db):
    tmp = built_db
    for suffix in ("_a3m", "_hhm", "_cs219"):
        assert os.path.exists(tmp / f"mydb{suffix}.ffdata")
        assert os.path.exists(tmp / f"mydb{suffix}.ffindex")
    from hhsuite_tpu.io.ffindex import FFindexDatabase

    cs = FFindexDatabase(str(tmp / "mydb_cs219.ffdata"),
                         str(tmp / "mydb_cs219.ffindex"))
    assert len(cs) == 2
    hhm = FFindexDatabase(str(tmp / "mydb_hhm.ffdata"),
                          str(tmp / "mydb_hhm.ffindex"))
    assert len(hhm) == 1        # only the >50-sequence MSA gets an HHM


def test_search_against_built_db(built_db):
    from hhsuite_tpu.search.engine import HHDatabase, run_hhsearch

    tmp = built_db
    par = Parameters()
    par.nocontxt = True
    par.prefilter = False
    par.num_rounds = 1
    db = HHDatabase(str(tmp / "mydb"))
    with open(f"{FIX}/query.a3m") as f:
        query = f.read()
    q, hl = run_hhsearch(par, query, db, "query.a3m")
    by_cols = {h.matched_cols for h in hl.hits}
    assert 431 in by_cols       # self hit over full length
    top = hl.hits[0]
    assert abs(top.score - 1378.39) < 0.1


def test_batch_driver(built_db, tmp_path):
    from hhsuite_tpu.io.ffindex import FFindexDatabase, FFindexWriter
    from hhsuite_tpu.tools.batch import merge_shards, run_batch

    tmp = built_db
    with open(f"{FIX}/query.a3m") as f:
        query = f.read()
    with FFindexWriter(str(tmp_path / "queries.ffdata"),
                       str(tmp_path / "queries.ffindex")) as w:
        w.add("q1", query.encode())
    run_batch(str(tmp_path / "queries"), str(tmp / "mydb"),
              str(tmp_path / "res"), mode="hhsearch",
              par_overrides={"nocontxt": True, "prefilter": False,
                             "num_rounds": 1},
              threads=1, log=lambda *a: None)
    hhr = FFindexDatabase(str(tmp_path / "res_hhr.ffdata"),
                          str(tmp_path / "res_hhr.ffindex"))
    out = hhr.read_text("q1")
    assert "Match_columns 431" in out
    m8 = FFindexDatabase(str(tmp_path / "res_m8.ffdata"),
                         str(tmp_path / "res_m8.ffindex"))
    assert m8.read_text("q1").count("\n") >= 1
    # shard merging (hhblits_mpi ffmerge_splits semantics)
    merge_shards(str(tmp_path / "merged"), [str(tmp_path / "res")],
                 kinds=("hhr", "m8"))
    merged = FFindexDatabase(str(tmp_path / "merged_hhr.ffdata"),
                             str(tmp_path / "merged_hhr.ffindex"))
    assert merged.read_text("q1") == out


def test_early_stopping_filter(built_db):
    """With an absurdly high filter threshold the first 2000-block stops
    the scan; hits from the first block are still reported."""
    from hhsuite_tpu.search.engine import HHDatabase
    from hhsuite_tpu.search.hhblits import run_hhblits

    tmp = built_db
    par = Parameters.hhblits_defaults()
    par.nocontxt = True
    par.num_rounds = 1
    assert par.early_stopping_filter
    db = HHDatabase(str(tmp / "mydb"))
    with open(f"{FIX}/query.a3m") as f:
        query = f.read()
    q, hl, qali = run_hhblits(par, query, db, "query.a3m")
    assert len(hl.hits) >= 1
