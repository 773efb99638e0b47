"""Single-device == multi-device consistency oracle.

The analogue of data/test.sh:35-49's serial-vs-omp-vs-mpi diffs: the
same hhsearch / hhblits run must produce byte-identical outputs on one
device and on the 8-device virtual CPU mesh (conftest sets
xla_force_host_platform_device_count=8).  Per-template DP independence
makes this exact — the mesh path (parallel/mesh.py) shards the packed
template batch and the prefilter DB axis over the "db" mesh axis.
"""

import os
import shutil

import pytest

from hhsuite_tpu.constants import Parameters
from hhsuite_tpu.io.alignments import print_alignments
from hhsuite_tpu.io.results import print_hit_list, print_m8
from hhsuite_tpu.matrices import get_substitution_matrix
from hhsuite_tpu.parallel.mesh import make_mesh, use_mesh
from hhsuite_tpu.search.engine import HHDatabase, run_hhsearch
from hhsuite_tpu.search.hhblits import run_hhblits

FIX = os.path.join(os.path.dirname(__file__), "fixtures")


def _make_db(tmp):
    for suffix in ("a3m", "hhm", "cs219"):
        for ext in ("ffdata", "ffindex"):
            shutil.copy(f"{FIX}/multi_{suffix}.{ext}",
                        tmp / f"multi_{suffix}.{ext}")
    return HHDatabase(str(tmp / "multi"))


def _query():
    with open(f"{FIX}/query.a3m") as f:
        return f.read()


def _require_devices(n):
    import jax

    if jax.device_count() < n:
        pytest.skip(f"needs {n} devices, have {jax.device_count()}")


def _search_outputs(db):
    par = Parameters()
    par.nocontxt = True
    par.prefilter = False
    par.num_rounds = 1
    q, hitlist = run_hhsearch(par, _query(), db, "query.a3m")
    mats = get_substitution_matrix(0)
    hhr = (print_hit_list(q, hitlist, z=par.z, Z=par.Z, p=par.p, E=par.E,
                          datestr="X")
           + print_alignments(q, hitlist, par, mats.S))
    m8 = print_m8(q, hitlist, nhits_min_b=par.b, p=par.p, E=par.E)
    return hhr, m8


def _blits_outputs(db):
    par = Parameters.hhblits_defaults()
    par.nocontxt = True
    par.num_rounds = 2
    par.alnfile = "x"
    q, hitlist, qali = run_hhblits(par, _query(), db, "query.a3m")
    from hhsuite_tpu.apps import write_alignment_a3m

    m8 = print_m8(q, hitlist, nhits_min_b=par.b, p=par.p, E=par.E)
    return m8, write_alignment_a3m(qali)


def test_hhsearch_mesh_identical(tmp_path):
    _require_devices(8)
    db = _make_db(tmp_path)
    hhr1, m81 = _search_outputs(db)
    with use_mesh(make_mesh(8)):
        hhr8, m88 = _search_outputs(db)
    assert m81 == m88
    assert hhr1 == hhr8


def test_hhsearch_mesh_2dev_identical(tmp_path):
    """Non-divisible shard count (26 templates over 2 devices)."""
    _require_devices(2)
    db = _make_db(tmp_path)
    _, m81 = _search_outputs(db)
    with use_mesh(make_mesh(2)):
        _, m82 = _search_outputs(db)
    assert m81 == m82


def test_hhblits_n2_mesh_identical(tmp_path):
    """Full iterative pipeline (prefilter funnel + rescore + realign +
    merge) sharded vs single-device."""
    _require_devices(8)
    db = _make_db(tmp_path)
    m81, a3m1 = _blits_outputs(db)
    db2 = _make_db(tmp_path)   # fresh HMM cache
    with use_mesh(make_mesh(8)):
        m88, a3m8 = _blits_outputs(db2)
    assert m81 == m88
    assert a3m1 == a3m8


def test_batch_query_parallel_submeshes(tmp_path):
    """Query parallelism over the mesh: the batch driver partitions an
    8-device mesh into per-worker sub-meshes (parallel/mesh.py
    split_mesh), runs queries concurrently on disjoint devices, and
    must reproduce the serial single-device outputs byte for byte."""
    _require_devices(8)
    from hhsuite_tpu.io.ffindex import FFindexDatabase, FFindexWriter
    from hhsuite_tpu.parallel.mesh import set_mesh
    from hhsuite_tpu.tools.batch import run_batch

    _make_db(tmp_path)
    with FFindexWriter(str(tmp_path / "qs.ffdata"),
                       str(tmp_path / "qs.ffindex")) as w:
        for k in range(4):
            w.add(f"q{k}", _query().encode())
    common = dict(mode="hhsearch",
                  par_overrides={"nocontxt": True, "prefilter": False,
                                 "num_rounds": 1},
                  log=lambda *a: None)

    run_batch(str(tmp_path / "qs"), str(tmp_path / "multi"),
              str(tmp_path / "serial"), threads=1, **common)
    set_mesh(make_mesh(8))
    try:
        # 2 workers x 4-device sub-meshes
        run_batch(str(tmp_path / "qs"), str(tmp_path / "multi"),
                  str(tmp_path / "par"), threads=2, **common)
    finally:
        set_mesh(None)
    ser = FFindexDatabase(str(tmp_path / "serial_m8.ffdata"),
                          str(tmp_path / "serial_m8.ffindex"))
    par_db = FFindexDatabase(str(tmp_path / "par_m8.ffdata"),
                             str(tmp_path / "par_m8.ffindex"))
    assert len(par_db) == 4
    for k in range(4):
        assert par_db.read_text(f"q{k}") == ser.read_text(f"q{k}")
