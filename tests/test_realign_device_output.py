"""User-visible output parity of the bulk (device-batched) realign path.

The on-TPU realign (ops/posterior_batch.py) is float32 with
reassociated scans and documented NOT bit-identical to the host
decoder's doubles; every byte-parity golden runs the host path, so
nothing pinned the device path's PRINTED hhr/m8/a3m until this module.
Here _use_device_realign is forced on CPU for the 26-entry golden DB
(the realign co corridors go through the RealignMaskSpec device-mask
builder, the walk through mac_walk_packed8) and the rendered outputs
must equal the host path's byte for byte — the f32 drift must stay
below display precision.  Runs in the quick tier."""

import os
import re
import shutil

import pytest

import hhsuite_tpu.search.engine as eng
from hhsuite_tpu.constants import Parameters
from hhsuite_tpu.io.alignments import print_alignments
from hhsuite_tpu.io.results import print_hit_list, print_m8
from hhsuite_tpu.matrices import get_substitution_matrix

FIX = os.path.join(os.path.dirname(__file__), "fixtures")


def _render(par, q, hitlist):
    mats = get_substitution_matrix(par.matrix)
    text = (print_hit_list(q, hitlist, par.maxdbstrlen, par.z, par.Z,
                           par.p, par.E, ["test"])
            + print_alignments(q, hitlist, par, mats.S)
            + print_m8(q, hitlist, par.nseqdis, par.p, par.E))
    return re.sub(r"(?m)^(Date|Command).*$", "", text)


def _run(tmp, force_device, monkeypatch):
    monkeypatch.setattr(eng, "_use_device_realign",
                        lambda _par, _sel: force_device)
    par = Parameters()
    par.nocontxt = True
    par.prefilter = False
    par.num_rounds = 1
    db = eng.HHDatabase(str(tmp / "multi"))
    with open(f"{FIX}/query.a3m") as f:
        query = f.read()
    q, hitlist = eng.run_hhsearch(par, query, db, "query.a3m")
    return _render(par, q, hitlist)


@pytest.fixture(scope="module")
def multi_db_dir(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("mdb_dev")
    for suffix in ("a3m", "hhm", "cs219"):
        for ext in ("ffdata", "ffindex"):
            shutil.copy(f"{FIX}/multi_{suffix}.{ext}",
                        tmp / f"multi_{suffix}.{ext}")
    return tmp


def test_device_realign_printed_output_parity(multi_db_dir, monkeypatch):
    host = _run(multi_db_dir, False, monkeypatch)
    dev = _run(multi_db_dir, True, monkeypatch)
    assert "No 1" in host            # alignments actually rendered
    assert host == dev
