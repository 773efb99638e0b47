"""hhblits -n 1 (with cs219 prefilter + composite E-values) vs reference
golden blasttab, plus cstranslate byte parity (data/test.sh:30-37)."""

import os
import shutil

import numpy as np
import pytest

from hhsuite_tpu.constants import Parameters
from hhsuite_tpu.cs.context_lib import cstranslate_a3m
from hhsuite_tpu.io.ffindex import FFindexDatabase
from hhsuite_tpu.io.results import print_m8
from hhsuite_tpu.search.engine import HHDatabase
from hhsuite_tpu.search.hhblits import run_hhblits

FIX = os.path.join(os.path.dirname(__file__), "fixtures")


def test_cstranslate_byte_identical():
    """cstranslate -x 0.3 -c 4 (the data/test.sh:30-33 flags) matches the
    reference binary byte for byte."""
    from hhsuite_tpu.cs.context_lib import default_pc_engine

    golden = FFindexDatabase(f"{FIX}/golden_single_cs219.ffdata",
                             f"{FIX}/golden_single_cs219.ffindex")
    with open(f"{FIX}/query.a3m") as f:
        got = cstranslate_a3m(f.read(), pc_engine=default_pc_engine(),
                              pc_admix=0.3, pc_ali=4.0)
    want = golden.read_bytes(golden.entries[0].name)
    assert got == want


def test_cstranslate_nopc_byte_identical():
    """cstranslate -x 0 (pseudocounts admixed with tau=0) equals the
    plain no-pseudocount translation and the reference's -x 0 output."""
    golden = FFindexDatabase(f"{FIX}/golden_single_cs219_nopc.ffdata",
                             f"{FIX}/golden_single_cs219_nopc.ffindex")
    with open(f"{FIX}/query.a3m") as f:
        text = f.read()
    want = golden.read_bytes(golden.entries[0].name)
    assert cstranslate_a3m(text) == want


@pytest.fixture(scope="module")
def blits_result(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("db")
    for src, dst in [("single_a3m", "single_a3m"),
                     ("single_hhm", "single_hhm"),
                     ("golden_single_cs219", "single_cs219")]:
        shutil.copy(f"{FIX}/{src}.ffdata", tmp / f"{dst}.ffdata")
        shutil.copy(f"{FIX}/{src}.ffindex", tmp / f"{dst}.ffindex")
    par = Parameters.hhblits_defaults()
    par.nocontxt = True
    par.num_rounds = 1
    db = HHDatabase(str(tmp / "single"))
    with open(f"{FIX}/query.a3m") as f:
        query = f.read()
    q, hitlist, qali = run_hhblits(par, query, db, "query.a3m")
    return par, q, hitlist


def test_hhblits_blasttab_byte_identical(blits_result):
    par, q, hitlist = blits_result
    got = print_m8(q, hitlist, nhits_min_b=par.b, p=par.p, E=par.E)
    with open(f"{FIX}/golden_hhblits_n1.blasttab") as f:
        want = f.read()
    assert got == want


def test_hhblits_n1_consistent_with_hhsearch(blits_result):
    """data/test.sh:52: hhblits -n 1 and hhsearch agree on all blasttab
    columns except the E-value."""
    par, q, hitlist = blits_result
    got = print_m8(q, hitlist, nhits_min_b=par.b, p=par.p, E=par.E)
    with open(f"{FIX}/golden_hhsearch.blasttab") as f:
        want = f.read()

    def strip_eval(text):
        return ["\t".join(l.split("\t")[:10] + l.split("\t")[11:])
                for l in text.splitlines()]

    assert strip_eval(got) == strip_eval(want)
