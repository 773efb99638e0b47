"""-omat binary alignment-matrices output vs reference golden.

golden_omat.bin was produced by reference hhblits -n 1 -omat against a
single distant-homolog template DB (fixtures omat_db_*).  The sparse
forward/backward/posterior triples ride on the double-precision F/B
pass; bytes may differ where ulp-level drift flips a 4-bit-mantissa
minifloat bucket, so the test requires identical length/structure and
>= 99.5% byte equality.
"""

import os

import pytest

from hhsuite_tpu.constants import Parameters

FIX = os.path.join(os.path.dirname(__file__), "fixtures")


def test_omat_matches_golden(tmp_path):
    import jax

    jax.config.update("jax_platforms", "cpu")
    import shutil

    from hhsuite_tpu.io.results import print_matrices
    from hhsuite_tpu.matrices import get_substitution_matrix
    from hhsuite_tpu.search.engine import HHDatabase
    from hhsuite_tpu.search.hhblits import run_hhblits

    for f in ("a3m", "cs219"):
        shutil.copy(f"{FIX}/omat_db_{f}.ffdata", tmp_path / f"db_{f}.ffdata")
        shutil.copy(f"{FIX}/omat_db_{f}.ffindex",
                    tmp_path / f"db_{f}.ffindex")
    par = Parameters.hhblits_defaults()
    par.nocontxt = True
    par.num_rounds = 1
    db = HHDatabase(str(tmp_path / "db"))
    with open(f"{FIX}/query.a3m") as f:
        query = f.read()
    q, hitlist, qali = run_hhblits(par, query, db, "query.a3m")
    mats = get_substitution_matrix(0)
    got = print_matrices(q.realign_q, hitlist, False,
                         par.max_number_matrices, mats.S)
    with open(f"{FIX}/golden_omat.bin", "rb") as f:
        want = f.read()
    assert len(got) == len(want)
    assert got[:40] == want[:40]          # header: names, lengths, probab
    same = sum(1 for a, b in zip(got, want) if a == b)
    assert same / len(want) > 0.995
