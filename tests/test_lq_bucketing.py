"""Query-length bucketing: queries of different lengths in one
32-column bucket share kernel input shapes (one compile per bucket,
mirroring the reference's zero per-query setup cost,
src/hhblits_omp.cpp:122-164), and the padded query view changes no
scores or paths.

The TPU resident-pack path is simulated on CPU: _on_tpu is forced True
and the fused gather kernel is replaced by a shape-recording wrapper
around the bit-exact CPU kernel (ops.viterbi.viterbi_batch) fed the
same gathered/divided arrays.  Quick tier."""

import os

import numpy as np
import pytest

import hhsuite_tpu.search.viterbi_search as vs
from hhsuite_tpu.constants import Parameters
from hhsuite_tpu.core.hmm import HMM
from hhsuite_tpu.matrices import get_substitution_matrix
from hhsuite_tpu.search.query import (prepare_query_hmm,
                                      prepare_template_hmm,
                                      read_query_text)

FIX = os.path.join(os.path.dirname(__file__), "fixtures")
AA = "ACDEFGHIKLMNPQRSTVWY"


def _mk_query(par, mats, L, seed):
    rng = np.random.default_rng(seed)
    seq = "".join(rng.choice(list(AA), size=L))
    q, _ali, fmt = read_query_text(par, f">q{L}\n{seq}\n", f"q{L}", mats)
    prepare_query_hmm(par, q, mats, fmt)
    return q


def _mk_templates(par, mats, q, n, L, seed):
    rng = np.random.default_rng(seed)
    out = []
    for k in range(n):
        seq = "".join(rng.choice(list(AA), size=L))
        t, _ali, fmt = read_query_text(par, f">t{k}\n{seq}\n", f"t{k}",
                                       mats)
        prepare_template_hmm(par, q, t, mats, fmt)
        out.append((f"t{k}", t))
    return out


def _search(par, q, templates, shapes_log, monkeypatch, fake):
    if fake:
        from hhsuite_tpu.ops.viterbi import viterbi_batch

        def fake_kernel(qp, qtr, tp_all, ttr_all, tL_all, idx, pnul,
                        cell_off, shift, local=True, tb=32,
                        ss_batch=None, Lq_true=None):
            shapes_log.append((np.asarray(qp).shape,
                               np.asarray(tp_all).shape))
            idx = np.asarray(idx)
            tp = np.asarray(tp_all)[idx] / pnul[:, None, :]
            ttr = np.asarray(ttr_all)[idx]
            tL = np.asarray(tL_all)[idx]
            co = (np.asarray(cell_off) if cell_off is not None
                  else np.zeros((tp.shape[0], qp.shape[0] - 1,
                                 tp.shape[1] - 1), bool))
            return viterbi_batch(np.asarray(qp), np.asarray(qtr), tp,
                                 ttr, co, tL, float(shift), 0.0, 0.0,
                                 0.0, ss_score=None, local=local)

        monkeypatch.setattr(vs, "_on_tpu", lambda: True)
        monkeypatch.setattr(vs, "_gathered_rows_kernel", fake_kernel)
    hits = vs.viterbi_search(par, q, templates)
    return sorted(((h.entry, h.irep, round(h.score, 4),
                    tuple(np.asarray(h.i)), tuple(np.asarray(h.j)))
                   for h in hits))


@pytest.mark.parametrize("Lq", [70, 90])
def test_lq_bucketing_matches_unpadded(Lq, monkeypatch):
    par = Parameters()
    par.nocontxt = True
    par.altali = 1          # keep the exact CPU stand-in exclusion-free
    mats = get_substitution_matrix(par.matrix)
    q = _mk_query(par, mats, Lq, seed=Lq)
    templates = _mk_templates(par, mats, q, 6, 120, seed=Lq + 1)

    plain = _search(par, q, [(n, _copy(t)) for n, t in templates],
                    [], monkeypatch, fake=False)
    shapes = []
    packed = _search(par, q, templates, shapes, monkeypatch, fake=True)
    assert packed == plain
    # the kernel saw the 96-row bucket view (70 and 90 both pad to 96)
    assert all(s[0] == (96 + 2, 20) for s in shapes)


def _copy(t):
    import copy

    c = copy.copy(t)
    c.p = t.p.copy()
    c.tr = t.tr.copy()
    return c


def test_same_bucket_same_shapes(monkeypatch):
    """Two different query lengths in one bucket produce IDENTICAL
    kernel input shape sets — the jit cache compiles once per bucket,
    not once per length."""
    par = Parameters()
    par.nocontxt = True
    par.altali = 1
    mats = get_substitution_matrix(par.matrix)
    all_shapes = {}
    for Lq in (70, 90):
        q = _mk_query(par, mats, Lq, seed=Lq)
        templates = _mk_templates(par, mats, q, 6, 120, seed=5)
        shapes = []
        _search(par, q, templates, shapes, monkeypatch, fake=True)
        all_shapes[Lq] = set(shapes)
        monkeypatch.undo()
    assert all_shapes[70] == all_shapes[90]
