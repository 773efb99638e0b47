"""End-to-end MSA -> HHM parity vs the reference hhmake.

Golden fixture produced by `hhmake -i query.a3m -nocontxt`.  The reference
uses the x86 `rcpps` approximate reciprocal inside position-specific
weights (hhalignment.cpp:2527-2535, ~4e-4 relative error, not reproducible
across ISAs), so we require: every numeric value within 1 fixed-point unit
(= 0.001 log2) and the vast majority of lines byte-identical.
"""

import os

import numpy as np
import pytest

from hhsuite_tpu.constants import Parameters
from hhsuite_tpu.io.hhm import read_hhm_file, write_hhm
from hhsuite_tpu.matrices import get_substitution_matrix
from hhsuite_tpu.search.query import prepare_query_hmm, read_query_text

FIX = os.path.join(os.path.dirname(__file__), "fixtures")
GOLDEN = os.path.join(FIX, "golden_hhmake_nocontxt.hhm")
QUERY = os.path.join(FIX, "query.a3m")


@pytest.fixture(scope="module")
def my_hhm_text():
    par = Parameters()
    par.nseqdis = 10
    par.nocontxt = True
    par.gapb = 0.0     # hhmake default: no transition pseudocounts
    mats = get_substitution_matrix(0)
    with open(QUERY) as f:
        text = f.read()
    q, ali, fmt = read_query_text(par, text, "query.a3m", mats)
    prepare_query_hmm(par, q, mats)
    return write_hhm(q, mats.pb, argv=["hhmake"], datestr="X")


def _numeric_lines(text):
    drop = ("COM", "DATE")
    return [l for l in text.splitlines() if not l.startswith(drop)]


def _tokens(line):
    out = []
    for t in line.split():
        try:
            out.append(int(t))
        except ValueError:
            out.append(t)
    return out


def test_hhm_matches_golden(my_hhm_text):
    with open(GOLDEN) as f:
        golden = f.read()
    mine = _numeric_lines(my_hhm_text)
    gold = _numeric_lines(golden)
    assert len(mine) == len(gold)

    exact = 0
    for lm, lg in zip(mine, gold):
        if lm == lg:
            exact += 1
            continue
        tm, tg = _tokens(lm), _tokens(lg)
        assert len(tm) == len(tg), (lm, lg)
        for a, b in zip(tm, tg):
            if isinstance(a, int) and isinstance(b, int):
                assert abs(a - b) <= 1, (lm, lg)
            else:
                assert a == b, (lm, lg)
    # byte-identity for the overwhelming majority of lines
    assert exact / len(gold) > 0.95, f"only {exact}/{len(gold)} lines exact"


def test_roundtrip_read(my_hhm_text):
    import tempfile

    with tempfile.NamedTemporaryFile("w", suffix=".hhm",
                                     delete=False) as f:
        f.write(my_hhm_text)
        path = f.name
    q = read_hhm_file(path)
    os.unlink(path)
    assert q.L == 431
    assert q.N_filtered == 59
    assert abs(q.Neff_HMM - 4.3) < 0.05
    assert q.has_pseudocounts
    # emission rows are probability-ish (quantized; X columns can underflow)
    s = q.f[1:q.L + 1].sum(axis=1)
    assert np.all(s > 0.8) and np.all(s < 1.2)


def test_golden_reader():
    q = read_hhm_file(GOLDEN)
    assert q.L == 431
    assert q.n_display == 10  # consensus + 9 representatives
    assert q.ncons == 0
    assert q.nfirst == 1
