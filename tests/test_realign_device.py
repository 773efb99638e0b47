"""Device-batched realign vs the host decoder through the full
hhsearch engine (both forced on CPU via the _use_device_realign gate).

The float32 device decoder must reproduce the host path's MAC
alignments exactly on the fixture profile (strong signal) and its
posterior-derived quantities to float32 tolerance."""

import os
import shutil

import numpy as np
import pytest

import hhsuite_tpu.search.engine as eng
from hhsuite_tpu.constants import Parameters
from hhsuite_tpu.matrices import get_substitution_matrix

FIX = os.path.join(os.path.dirname(__file__), "fixtures")


@pytest.fixture(scope="module")
def six_db(tmp_path_factory):
    """Six-copy database from the single-entry fixtures."""
    from hhsuite_tpu.io.ffindex import FFindexDatabase, build_ffindex

    tmp = tmp_path_factory.mktemp("sixdb")
    for comp, src in [("a3m", "single_a3m"), ("hhm", "single_hhm"),
                      ("cs219", "golden_single_cs219")]:
        db = FFindexDatabase(os.path.join(FIX, src + ".ffdata"),
                             os.path.join(FIX, src + ".ffindex"))
        data = db.read_bytes(db.entries[0])
        items = [(f"t{i}", data) for i in range(6)]
        build_ffindex(str(tmp / f"six_{comp}.ffdata"),
                      str(tmp / f"six_{comp}.ffindex"), items)
    return str(tmp / "six")


def _run(six_db, force_device, monkeypatch):
    par = Parameters()
    par.nocontxt = True
    monkeypatch.setattr(eng, "_use_device_realign",
                        lambda _par, _sel: force_device)
    db = eng.HHDatabase(six_db)
    query = open(os.path.join(FIX, "query.a3m")).read()
    q, hitlist = eng.run_hhsearch(par, query, db, "query.a3m")
    return q, list(hitlist)


def test_device_realign_matches_host(six_db, monkeypatch):
    _qh, host = _run(six_db, False, monkeypatch)
    _qd, dev = _run(six_db, True, monkeypatch)
    assert len(host) == len(dev) and len(host) >= 6
    for hh, hd in zip(host, dev):
        assert str(hh.entry) == str(hd.entry) and hh.irep == hd.irep
        # MAC alignment identical (strong-signal paths)
        np.testing.assert_array_equal(hh.i, hd.i)
        np.testing.assert_array_equal(hh.j, hd.j)
        np.testing.assert_array_equal(hh.states, hd.states)
        assert hh.matched_cols == hd.matched_cols
        assert (hh.i1, hh.j1, hh.i2, hh.j2) == (hd.i1, hd.j1,
                                                hd.i2, hd.j2)
        # posterior-derived values to float32 tolerance (hits below
        # the realign selection carry no posteriors in either path)
        if hh.P_posterior is None:
            assert hd.P_posterior is None
        else:
            assert hd.sum_of_probs == pytest.approx(hh.sum_of_probs,
                                                    rel=1e-3, abs=1e-2)
            np.testing.assert_allclose(hd.P_posterior, hh.P_posterior,
                                       rtol=5e-3, atol=1e-4)
        # restored search scores untouched
        assert hd.score == pytest.approx(hh.score, rel=1e-6)
        assert hd.Probab == pytest.approx(hh.Probab, rel=1e-6)
