"""Funnel worst case (VERDICT r4 next #10): a database where the
score-only sweep filters NOTHING — every template is identical to the
query, so 100% of a junk survives the keep rule and the funnel's
degeneracy detector (search/viterbi_search.py: ``len(full) >= 0.9 *
len(junk)`` -> ``funnel_on = False``) must fall back to
backtrace-everything.

Contract: on such a workload the funnel run produces hits IDENTICAL to
the single-pass search (no light hits at all — everything earned a
real backtrace path) and completes within a bounded wall budget, so a
low-specificity query cannot collapse the pipeline.  Reference
behavior being preserved: hhviterbirunner.cpp:75-330 backtraces every
surviving template unconditionally.
"""

import copy
import os
import time

import numpy as np
import pytest

from hhsuite_tpu.constants import Parameters
from hhsuite_tpu.matrices import get_substitution_matrix
from hhsuite_tpu.search import viterbi_search as vs_mod
from hhsuite_tpu.search.engine import (prepare_query_hmm,
                                       prepare_template_hmm,
                                       read_query_text)
from tests.test_viterbi_funnel import _truncate_a3m

FIX = os.path.join(os.path.dirname(__file__), "fixtures")


@pytest.fixture(scope="module")
def degenerate_searched():
    par = Parameters()
    par.nocontxt = True
    par.prefilter = False
    par.corr = 0.0
    par.altali = 1
    par.Z = par.B = 3
    par.z = par.b = 1
    par.realign_max = 3
    par.early_stopping_filter = False
    par.smin = 1e9
    mats = get_substitution_matrix(par.matrix)
    with open(f"{FIX}/query.a3m") as f:
        text = f.read()
    text = _truncate_a3m(text, 96)
    q, _qali, fmt = read_query_text(par, text, "query.a3m", mats)
    prepare_query_hmm(par, q, mats, fmt)

    # 12 IDENTICAL templates (> K_cap = 6): every lanes score is
    # bit-equal, the keep rule keeps 12/12 = 100% >= 90% -> the
    # degeneracy fallback fires on the first junk
    t0, tfmt = read_query_text(par, text, "tmpl.a3m", mats)[0], 0
    templates = []
    for k in range(12):
        t = copy.deepcopy(t0)
        t.name = t.file = f"t{k:02d}"
        prepare_template_hmm(par, q, t, mats, tfmt)
        templates.append((f"t{k:02d}", t))

    base = vs_mod.viterbi_search(par, q, templates)

    orig = vs_mod._funnel_ok
    vs_mod._funnel_ok = lambda: True
    try:
        t_start = time.perf_counter()
        fun = vs_mod.viterbi_search(par, q, templates)
        fun_wall = time.perf_counter() - t_start
    finally:
        vs_mod._funnel_ok = orig
    return par, base, fun, fun_wall


def test_degenerate_funnel_backtraces_everything(degenerate_searched):
    """100% survival: no light hits — every template got a full
    backtrace, exactly like the single-pass run."""
    _par, base, fun, _w = degenerate_searched
    assert len(fun) == len(base) == 12
    assert not any(h.light for h in fun), \
        "degenerate workload must backtrace every template"


def test_degenerate_funnel_output_parity(degenerate_searched):
    _par, base, fun, _w = degenerate_searched
    by_entry = {h.entry: h for h in base}
    for h in fun:
        ref = by_entry[h.entry]
        assert h.score == pytest.approx(ref.score, rel=2e-6)
        assert (h.i1, h.i2, h.j1, h.j2) == (ref.i1, ref.i2,
                                            ref.j1, ref.j2)
        assert h.matched_cols == ref.matched_cols


def test_degenerate_funnel_bounded_wall(degenerate_searched):
    """The backtrace-everything fallback must not collapse: the funnel
    run (one wasted sweep + full backtrace pass) stays within 10x of a
    generous per-template budget on the CPU interpret path.  On real
    TPU hardware the same path rides the batched lanes backtrace
    kernel (bench: viterbi_backtrace_pipeline_gcups)."""
    _par, _base, _fun, wall = degenerate_searched
    # 12 templates x 96 cols on CPU: single-pass takes ~seconds; allow
    # a wide margin for slow CI machines while still catching an
    # accidental O(n^2) or per-hit-dispatch regression
    assert wall < 240.0, f"degenerate funnel took {wall:.1f}s"
