"""reformat tool: format conversions and round-trips."""

import os

import pytest

from hhsuite_tpu.tools.reformat import read_msa, reformat

FIX = os.path.join(os.path.dirname(__file__), "fixtures")

A3M = """>seq1 first
MKV-LAcdeFG
>seq2 second
MRVQLA-G
>seq3 third
M-VKLAfgh-G
"""


def test_a3m_to_fas_alignment():
    fas = reformat(A3M, "a3m", "fas")
    pairs = read_msa(fas, "fas")
    lens = {len(s) for _n, s in pairs}
    assert len(lens) == 1          # all rows aligned
    assert pairs[0][1].startswith("MKV-LA")
    # insert region from seq1 (cde) and seq3 (fgh) must align as columns
    assert "CDE" in pairs[0][1]
    assert "FGH" in pairs[2][1]


def test_fas_a3m_roundtrip():
    fas = reformat(A3M, "a3m", "fas")
    a3m2 = reformat(fas, "fas", "a3m", M="first")
    fas2 = reformat(a3m2, "a3m", "fas")
    # match columns defined by seq1: round trip preserves residues
    p1 = dict(read_msa(fas, "fas"))
    p2 = dict(read_msa(fas2, "fas"))
    for name in p1:
        assert p1[name].replace("-", "") == p2[name].replace("-", "")


def test_sto_roundtrip():
    fas = reformat(A3M, "a3m", "fas")
    sto = reformat(fas, "fas", "sto")
    assert sto.startswith("# STOCKHOLM 1.0")
    fas2 = reformat(sto, "sto", "fas")
    assert [s for _n, s in read_msa(fas2, "fas")] \
        == [s for _n, s in read_msa(fas, "fas")]


def test_psi_and_clu():
    fas = reformat(A3M, "a3m", "fas")
    psi = reformat(fas, "fas", "psi")
    assert len(psi.splitlines()) == 3
    clu = reformat(fas, "fas", "clu")
    assert clu.startswith("CLUSTAL")
    fas_c = reformat(clu, "clu", "fas")
    assert [s for _n, s in read_msa(fas_c, "fas")] \
        == [s for _n, s in read_msa(fas, "fas")]


def test_remove_gap_columns_and_query_fixture():
    with open(f"{FIX}/query.a3m") as f:
        text = f.read()
    fas = reformat(text, "a3m", "fas", remove_gap_cols=True)
    pairs = read_msa(fas, "fas")
    assert len(pairs) == 59
    lens = {len(s) for _n, s in pairs}
    assert len(lens) == 1
