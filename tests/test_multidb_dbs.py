"""Multiple -d databases searched as one (hhblits.cpp:1165-1175)."""

import os
import shutil

import pytest

from hhsuite_tpu.constants import Parameters
from hhsuite_tpu.io.ffindex import FFindexDatabase, FFindexWriter
from hhsuite_tpu.io.results import print_m8
from hhsuite_tpu.search.engine import open_databases, run_hhsearch

FIX = os.path.join(os.path.dirname(__file__), "fixtures")


def _split_db(tmp):
    """Split the 26-entry fixture DB into two halves dbA / dbB."""
    full = {}
    for suffix in ("a3m", "hhm", "cs219"):
        db = FFindexDatabase(f"{FIX}/multi_{suffix}.ffdata",
                             f"{FIX}/multi_{suffix}.ffindex")
        full[suffix] = [(e.name, db.read_bytes(e)) for e in db.entries]
    names = sorted({n for n, _ in full["a3m"]})
    half = set(names[: len(names) // 2])
    for tag, keep in (("dbA", lambda n: n in half),
                      ("dbB", lambda n: n not in half)):
        for suffix in ("a3m", "hhm", "cs219"):
            with FFindexWriter(str(tmp / f"{tag}_{suffix}.ffdata"),
                               str(tmp / f"{tag}_{suffix}.ffindex")) as w:
                for n, payload in full[suffix]:
                    if keep(n):
                        w.add(n, payload)
        # copy the full db too
        for suffix in ("a3m", "hhm", "cs219"):
            shutil.copy(f"{FIX}/multi_{suffix}.ffdata",
                        tmp / f"full_{suffix}.ffdata")
            shutil.copy(f"{FIX}/multi_{suffix}.ffindex",
                        tmp / f"full_{suffix}.ffindex")
    return str(tmp / "dbA"), str(tmp / "dbB"), str(tmp / "full")


def test_two_dbs_equal_one(tmp_path):
    a, b, full = _split_db(tmp_path)
    with open(f"{FIX}/query.a3m") as f:
        query = f.read()

    def search(db):
        par = Parameters()
        par.nocontxt = True
        par.prefilter = False
        par.num_rounds = 1
        q, hitlist = run_hhsearch(par, query, db, "query.a3m")
        return print_m8(q, hitlist, nhits_min_b=par.b, p=par.p, E=par.E)

    m8_two = search(open_databases([a, b]))
    m8_one = search(open_databases([full]))
    # same hit set and statistics (summary line order may differ only
    # for exactly tied scores; here scores are distinct)
    assert sorted(m8_two.splitlines()) == sorted(m8_one.splitlines())
