"""hhblits -n 2: the iterative MSA merge (MergeMasterSlave + interim
filters + profile rebuild) vs reference golden -oa3m output."""

import os
import shutil

import pytest

from hhsuite_tpu.apps import write_alignment_a3m
from hhsuite_tpu.constants import Parameters
from hhsuite_tpu.io.results import print_m8
from hhsuite_tpu.search.engine import HHDatabase
from hhsuite_tpu.search.hhblits import run_hhblits

FIX = os.path.join(os.path.dirname(__file__), "fixtures")


def test_hhblits_n2_merged_msa(tmp_path):
    for src, dst in [("single_a3m", "single_a3m"),
                     ("single_hhm", "single_hhm"),
                     ("golden_single_cs219", "single_cs219")]:
        shutil.copy(f"{FIX}/{src}.ffdata", tmp_path / f"{dst}.ffdata")
        shutil.copy(f"{FIX}/{src}.ffindex", tmp_path / f"{dst}.ffindex")
    par = Parameters.hhblits_defaults()
    par.nocontxt = True
    par.num_rounds = 2
    par.alnfile = "x"     # request -oa3m -> exercise the merge branch
    db = HHDatabase(str(tmp_path / "single"))
    with open(f"{FIX}/query.a3m") as f:
        query = f.read()
    q, hitlist, qali = run_hhblits(par, query, db, "query.a3m")

    with open(f"{FIX}/blits_n2.a3m") as f:
        want_a3m = f.read()
    assert write_alignment_a3m(qali) == want_a3m

    with open(f"{FIX}/blits_n2.m8") as f:
        want_m8 = f.read()
    assert print_m8(q, hitlist, par.nseqdis, par.p, par.E) == want_m8
