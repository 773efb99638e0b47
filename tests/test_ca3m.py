"""Compressed a3m (ca3m) codec and database integration.

Goldens were produced with the reference a3m_database_reduce /
a3m_database_extract binaries over the single-template fixture MSA and
sequence/header DBs derived from it (fixtures ca3m_seq/ca3m_hdr).  The
compressor must be byte-identical; the extractor must reproduce the
reference's output byte-for-byte (including its blank-line-after-header
quirk).  A hhsearch run against a ca3m-only database exercises the
ReadCompressed template path end to end.
"""

import os
import shutil

import numpy as np
import pytest

from hhsuite_tpu.constants import Parameters
from hhsuite_tpu.io.ca3m import (compress_a3m, extract_a3m,
                                 get_short_id_from_header, read_compressed)
from hhsuite_tpu.io.ffindex import FFindexDatabase, FFindexWriter

FIX = os.path.join(os.path.dirname(__file__), "fixtures")


@pytest.fixture(scope="module")
def dbs():
    a3m_db = FFindexDatabase(f"{FIX}/single_a3m.ffdata",
                             f"{FIX}/single_a3m.ffindex")
    seq_db = FFindexDatabase(f"{FIX}/ca3m_seq.ffdata",
                             f"{FIX}/ca3m_seq.ffindex")
    hdr_db = FFindexDatabase(f"{FIX}/ca3m_hdr.ffdata",
                             f"{FIX}/ca3m_hdr.ffindex")
    name = a3m_db.entries[0].name
    return name, a3m_db.read_text(name), seq_db, hdr_db


def test_compress_byte_identical(dbs):
    name, text, seq_db, hdr_db = dbs
    golden = FFindexDatabase(f"{FIX}/golden_single_ca3m.ffdata",
                             f"{FIX}/golden_single_ca3m.ffindex")
    want = golden.read_bytes(golden.entries[0].name)
    got = compress_a3m(text, seq_db)
    assert got == want
    assert len(got) < len(text.encode()) / 10


def test_extract_byte_identical(dbs):
    name, text, seq_db, hdr_db = dbs
    ca3m = FFindexDatabase(f"{FIX}/golden_single_ca3m.ffdata",
                           f"{FIX}/golden_single_ca3m.ffindex")
    golden = FFindexDatabase(f"{FIX}/golden_ca3m_extract.ffdata",
                             f"{FIX}/golden_ca3m_extract.ffindex")
    got = extract_a3m(ca3m.read_bytes(ca3m.entries[0].name), seq_db,
                      hdr_db)
    want = golden.read_text(golden.entries[0].name)
    assert got == want


def test_read_compressed_alignment(dbs):
    name, text, seq_db, hdr_db = dbs
    body = compress_a3m(text, seq_db)
    ali = read_compressed(name, body, seq_db, hdr_db, mark=0)
    assert ali.kfirst == 0
    assert ali.display[0] == 2 and ali.keep[0] == 0
    # consensus + one record per member that compressed successfully
    assert ali.N_in >= 50
    ali.compress(M=1, Mgaps=50, maxres=20001)
    assert ali.L == 431


def test_hhsearch_against_ca3m_db(dbs, tmp_path):
    import jax

    jax.config.update("jax_platforms", "cpu")
    from hhsuite_tpu.search.engine import HHDatabase, run_hhsearch

    name, text, seq_db, hdr_db = dbs
    tmp = tmp_path
    shutil.copy(f"{FIX}/golden_single_ca3m.ffdata", tmp / "db_ca3m.ffdata")
    shutil.copy(f"{FIX}/golden_single_ca3m.ffindex",
                tmp / "db_ca3m.ffindex")
    shutil.copy(f"{FIX}/golden_single_cs219.ffdata",
                tmp / "db_cs219.ffdata")
    shutil.copy(f"{FIX}/golden_single_cs219.ffindex",
                tmp / "db_cs219.ffindex")
    shutil.copy(f"{FIX}/ca3m_seq.ffdata", tmp / "db_sequence.ffdata")
    shutil.copy(f"{FIX}/ca3m_seq.ffindex", tmp / "db_sequence.ffindex")
    shutil.copy(f"{FIX}/ca3m_hdr.ffdata", tmp / "db_header.ffdata")
    shutil.copy(f"{FIX}/ca3m_hdr.ffindex", tmp / "db_header.ffindex")

    par = Parameters()
    par.nocontxt = True
    par.prefilter = False
    par.num_rounds = 1
    db = HHDatabase(str(tmp / "db"))
    assert db.use_compressed
    with open(f"{FIX}/query.a3m") as f:
        query = f.read()
    q, hitlist = run_hhsearch(par, query, db, "query.a3m")
    hits = hitlist.hits
    assert len(hits) >= 1
    h = hits[0]
    # template profile now comes from the compressed MSA (consensus as
    # kfirst) rather than the prebuilt hhm; the self-alignment must still
    # span the full length with a near-identical score
    assert h.matched_cols == 431
    assert (h.i1, h.j1) == (1, 1)
    assert abs(h.score - 1378.39) < 50.0
    assert h.Probab > 99.9
