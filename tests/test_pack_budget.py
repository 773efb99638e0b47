"""Resident-pack HBM budget: very large databases must fall back to
per-batch template upload instead of exhausting device memory."""

import os

import numpy as np
import pytest

from hhsuite_tpu.search.viterbi_search import ResidentTemplatePack


def _fake_hmm(L):
    class T:
        pass
    t = T()
    t.L = L
    t.p = np.random.rand(L + 2, 20).astype(np.float32)
    t.tr = np.zeros((L + 2, 7), np.float32)
    return t


def test_pack_accounts_device_bytes():
    pack = ResidentTemplatePack()
    assert pack.approx_bytes == 0
    pack.ensure([(f"t{i}", _fake_hmm(100)) for i in range(5)])
    # bucket 128 -> cap >= 8 rows of (130, 27) f32
    assert pack.approx_bytes >= 8 * 130 * 27 * 4
    before = pack.approx_bytes
    pack.ensure([("u0", _fake_hmm(300))])   # new bucket
    assert pack.approx_bytes > before


def test_budget_falls_back_to_per_batch(monkeypatch, tmp_path):
    import shutil

    from hhsuite_tpu.constants import Parameters
    from hhsuite_tpu.matrices import get_substitution_matrix
    from hhsuite_tpu.search import engine as eng

    fix = os.path.join(os.path.dirname(__file__), "fixtures")
    for suffix in ("a3m", "hhm", "cs219"):
        for ext in ("ffdata", "ffindex"):
            shutil.copy(f"{fix}/multi_{suffix}.{ext}",
                        tmp_path / f"multi_{suffix}.{ext}")
    db = eng.HHDatabase(str(tmp_path / "multi"))
    par = Parameters()
    par.nocontxt = True
    mats = get_substitution_matrix(par.matrix)
    names = [e.name for e in db.cs219.entries][:4]

    # pretend we're on TPU (and meshless) so the pack path engages
    monkeypatch.setattr("hhsuite_tpu.search.viterbi_search._on_tpu",
                        lambda: True)
    monkeypatch.setattr("hhsuite_tpu.parallel.mesh.get_mesh",
                        lambda: None)
    monkeypatch.setenv("HHSUITE_TPU_PACK_HBM_GB", "0.000001")
    from hhsuite_tpu.search.viterbi_search import PACK_DISABLED
    assert eng.get_resident_pack(db, names, par, mats) is PACK_DISABLED
    assert db.__dict__.get("_pack_budget_warned")

    monkeypatch.setenv("HHSUITE_TPU_PACK_HBM_GB", "8")
    pack = eng.get_resident_pack(db, names, par, mats)
    assert pack is not None and pack.approx_bytes > 0
