"""Two-pass score-only funnel vs the single-pass Viterbi search.

Forces the funnel on the CPU interpret path and checks that
(a) every hit that can be displayed/realigned (the top-K) is a full
    hit with a backtrace path, identical to the single-pass run, and
(b) the remaining light hits carry kernel scores matching the
    single-pass scores (par.corr=0 so the correlation term does not
    split the two) to the lanes sweep's bfloat16-Si tolerance: light
    hits rank BELOW the backtrace/display caps, so their scores are
    never printed at better than %.1f precision and only order the
    unreported tail (viterbi_lanes.py si_dtype).
"""

import copy
import os

import numpy as np
import pytest

from hhsuite_tpu.constants import Parameters
from hhsuite_tpu.matrices import get_substitution_matrix
from hhsuite_tpu.search import viterbi_search as vs_mod
from hhsuite_tpu.search.engine import (prepare_query_hmm,
                                       prepare_template_hmm,
                                       read_query_text)

FIX = os.path.join(os.path.dirname(__file__), "fixtures")


def _truncate_a3m(text: str, ncols: int) -> str:
    """Cut every sequence after its first ``ncols`` match states."""
    out = []
    for line in text.splitlines():
        if line.startswith((">", "#")):
            out.append(line)
            continue
        kept, nm = [], 0
        for c in line:
            if c.isupper() or c == "-":
                if nm >= ncols:
                    break
                nm += 1
            kept.append(c)
        out.append("".join(kept))
    return "\n".join(out) + "\n"


@pytest.fixture(scope="module")
def searched():
    par = Parameters()
    par.nocontxt = True
    par.prefilter = False
    par.corr = 0.0
    par.altali = 1
    par.Z = par.B = 3
    par.z = par.b = 1
    par.realign_max = 3
    par.early_stopping_filter = False
    # altali=1 makes smin irrelevant for correctness; push it out of
    # reach so the smin keep-rule doesn't swallow every self-hit and
    # the test actually exercises light hits
    par.smin = 1e9
    mats = get_substitution_matrix(par.matrix)
    # a shortened copy of the fixture MSA (first 120 match columns):
    # the funnel logic is length-independent, and the interpret-mode
    # lanes sweep is O(Lq * lanes) of per-op Python — the full 431-col
    # query costs ~20 CPU-minutes in this test alone
    with open(f"{FIX}/query.a3m") as f:
        text = f.read()
    text = _truncate_a3m(text, 120)
    q, _qali, fmt = read_query_text(par, text, "query.a3m", mats)
    prepare_query_hmm(par, q, mats, fmt)

    t0, tfmt = read_query_text(par, text, "tmpl.a3m", mats)[0], 0
    templates = []
    rng = np.random.RandomState(0)
    for k in range(14):
        t = copy.deepcopy(t0)
        # perturb the emission profile to spread the scores
        noise = 1.0 + 0.5 * rng.rand(*t.f.shape) * (k / 10.0)
        t.f = (t.f * noise).astype(np.float32)
        t.f /= np.maximum(t.f.sum(axis=1, keepdims=True), 1e-30)
        t.name = t.file = f"t{k:02d}"
        prepare_template_hmm(par, q, t, mats, tfmt)
        templates.append((f"t{k:02d}", t))

    base = vs_mod.viterbi_search(par, q, templates)

    orig = vs_mod._funnel_ok
    vs_mod._funnel_ok = lambda: True
    try:
        fun = vs_mod.viterbi_search(par, q, templates)
    finally:
        vs_mod._funnel_ok = orig
    return par, base, fun, q, templates


def test_funnel_full_hits_match(searched):
    par, base, fun, _q, _tmpls = searched
    by_entry = {h.entry: h for h in base}
    n_full = 0
    for h in fun:
        if h.light:
            continue
        n_full += 1
        ref = by_entry[h.entry]
        assert h.score == pytest.approx(ref.score, rel=2e-6)
        assert (h.i1, h.i2, h.j1, h.j2) == (ref.i1, ref.i2, ref.j1, ref.j2)
        assert h.matched_cols == ref.matched_cols
    # the funnel must keep at least 2*max(Z,B,realign_max) full hits
    assert n_full >= min(len(base), 2 * max(par.Z, par.B, par.realign_max))


def test_funnel_light_scores_match(searched):
    _par, base, fun, _q, _tmpls = searched
    by_entry = {h.entry: h for h in base}
    lights = [h for h in fun if h.light]
    assert lights, "expected some light hits with 14 templates and K=6"
    for h in lights:
        ref = by_entry[h.entry]
        assert h.score == pytest.approx(ref.score, rel=1e-3, abs=0.1)
        assert h.nsteps == 0 and h.matched_cols == 0


def test_funnel_keeps_all_hits(searched):
    _par, base, fun, _q, _tmpls = searched
    assert len(fun) == len(base)
    assert {h.entry for h in fun} == {h.entry for h in base}


def test_promote_light_hits(searched):
    """The merge-window backstop: any light hit whose E-value lands
    inside the MSA-merge window (Eval <= 100*par.e) must be replaced
    by a full hit with a real backtrace path matching the single-pass
    run (hhblits merges such hits, hhblits.cpp:832-838)."""
    from hhsuite_tpu.core.hit import HitList

    par, base, fun, q, templates = searched
    hitlist = HitList()
    hitlist.N_searched = len(templates)
    hitlist.extend(copy.deepcopy(fun))
    hitlist.sort()
    hitlist.calculate_pvalues(q, par.loc, par.ssm, par.ssw)
    lights = [h for h in hitlist if h.light]
    assert lights
    # choose par.e so that some (not all) light hits are in the window
    par2 = copy.deepcopy(par)
    evals = sorted(h.Eval for h in lights)
    par2.e = evals[len(evals) // 2] / 100.0
    promoted = vs_mod.promote_light_hits(par2, q, hitlist, templates)
    assert promoted
    hitlist.sort()
    hitlist.calculate_pvalues(q, par2.loc, par2.ssm, par2.ssw)
    by_entry = {h.entry: h for h in base}
    for h in hitlist:
        if h.Eval <= 100.0 * par2.e:
            assert not h.light
        if h.light:
            continue
        ref = by_entry[h.entry]
        assert h.score == pytest.approx(ref.score, rel=2e-6)
        assert h.matched_cols == ref.matched_cols
