"""prefilter_db funnel semantics on a synthetic many-entry DB.

The kernel-parity tests (test_prefilter_pallas*.py) cover the scoring
math; this file exercises the funnel policy of prefilter_db
(hhprefilter.cpp:430-606) at a scale where none of the cuts are
degenerate: the stage-1 min-hit floor and smax cut, the stage-2
E-value thresholds, the maxnumdb cap, and the previous-hits split.
"""

import os

import numpy as np
import pytest

from hhsuite_tpu.constants import Parameters
from hhsuite_tpu.cs.context_lib import ContextLibrary
from hhsuite_tpu.matrices import get_substitution_matrix
from hhsuite_tpu.search.prefilter import prefilter_db
from hhsuite_tpu.search.query import prepare_query_hmm, read_query_text

FIX = os.path.join(os.path.dirname(__file__), "fixtures")


@pytest.fixture(scope="module")
def setup():
    par = Parameters.hhblits_defaults()
    par.nocontxt = True
    mats = get_substitution_matrix(par.matrix)
    with open(f"{FIX}/query.a3m") as f:
        text = f.read()
    q, _qali, fmt = read_query_text(par, text, "query.a3m", mats)
    q_tmp = __import__("copy").deepcopy(q)
    prepare_query_hmm(par, q_tmp, mats, fmt)
    q_tmp.prepare_pseudocounts(mats.R)
    q_tmp.add_amino_acid_pseudocounts(
        par.pc_prefilter_nocontext_mode, par.pc_prefilter_nocontext_a,
        par.pc_prefilter_nocontext_b, par.pc_prefilter_nocontext_c)
    q_tmp.calculate_aa_background(mats.pb)
    lib = ContextLibrary.default_cs219()

    # real cs219 sequences (26 homologs of the query) + random filler
    from hhsuite_tpu.io.ffindex import FFindexDatabase

    cs = FFindexDatabase(f"{FIX}/multi_cs219.ffdata",
                         f"{FIX}/multi_cs219.ffindex")
    names = [e.name for e in cs.entries]
    seqs = [cs.read_bytes(e).rstrip(b"\x00") for e in cs.entries]
    rng = np.random.RandomState(0)
    for k in range(400):
        L = rng.randint(30, 500)
        names.append(f"rand{k:04d}")
        seqs.append(bytes(rng.randint(0, 219, L, dtype=np.uint8)))
    return par, q_tmp, lib, names, seqs


def test_funnel_ranks_homologs_first(setup):
    par, q_tmp, lib, names, seqs = setup
    new, old = prefilter_db(par, q_tmp, lib, names, seqs)
    assert old == []
    got = [n for (_l, n) in new]
    # every family entry (s* = 18 true homologs) must survive both
    # stages; the shuffled decoys (d*) and random noise need not
    real = {n for n in names if n.startswith("s")}
    assert real.issubset(set(got))
    # E-value order puts the strong homologs ahead of all noise
    assert set(got[:10]).issubset(real)


def test_funnel_evalue_cut_drops_noise(setup):
    par, q_tmp, lib, names, seqs = setup
    par = __import__("copy").deepcopy(par)
    # tight E-value window: noise sequences must all be cut by the
    # stage-2 threshold (min_prefilter_hits floor lowered so it does
    # not force them back in)
    par.prefilter_evalue_thresh = 1e-3
    par.min_prefilter_hits = 1
    new, _old = prefilter_db(par, q_tmp, lib, names, seqs)
    got = [n for (_l, n) in new]
    assert got and not any(n.startswith("rand") for n in got)


def test_funnel_min_hit_floor(setup):
    par, q_tmp, lib, names, seqs = setup
    par = __import__("copy").deepcopy(par)
    # impossible E-value threshold: the min_prefilter_hits floor must
    # still admit exactly that many (hhprefilter.cpp:569-575)
    par.prefilter_evalue_thresh = 0.0
    par.prefilter_evalue_coarse_thresh = 1e30
    par.min_prefilter_hits = 7
    new, _old = prefilter_db(par, q_tmp, lib, names, seqs)
    assert len(new) == 7


def test_funnel_maxnumdb_cap(setup):
    par, q_tmp, lib, names, seqs = setup
    par = __import__("copy").deepcopy(par)
    par.maxnumdb = 9
    new, _old = prefilter_db(par, q_tmp, lib, names, seqs)
    assert len(new) == 9


def test_funnel_previous_hits_split(setup):
    par, q_tmp, lib, names, seqs = setup
    new_all, _ = prefilter_db(par, q_tmp, lib, names, seqs)
    top = [n for (_l, n) in new_all][:3]
    # previous_hits keys use the extension-stripped base (prefilter.py
    # matches hit.file, which Alignment derives from the entry name)
    prev = {n.rsplit(".", 1)[0] + "__1" for n in top}
    new, old = prefilter_db(par, q_tmp, lib, names, seqs,
                            previous_hit_names=prev)
    assert sorted(n for (_l, n) in old) == sorted(top)
    assert not set(top) & {n for (_l, n) in new}
