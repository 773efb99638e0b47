"""reformat tool: format conversions, round-trips and reformat.pl
option semantics (scripts/reformat.pl:60-85)."""

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
    assert pairs[0][1].upper().startswith("MKV-LA")
    # insert region from seq1 (cde) and seq3 (fgh) must align as
    # columns; case is preserved (reformat.pl only uppercases on -uc)
    assert "cde" in pairs[0][1]
    assert "fgh" in pairs[2][1]


def test_fas_a3m_roundtrip():
    fas = reformat(A3M, "a3m", "fas")
    a3m2 = reformat(fas, "fas", "a3m", M="first")
    fas2 = reformat(a3m2, "a3m", "fas")
    p1 = dict(read_msa(fas, "fas"))
    p2 = dict(read_msa(fas2, "fas"))
    for name in p1:
        assert p1[name].replace("-", "").upper() \
            == p2[name].replace("-", "").upper()


def test_sto_roundtrip():
    fas = reformat(A3M, "a3m", "fas")
    sto = reformat(fas, "fas", "sto")
    assert sto.startswith("# STOCKHOLM 1.0")
    fas2 = reformat(sto, "sto", "fas")
    assert [s for _n, s in read_msa(fas2, "fas")] \
        == [s.upper() for _n, s in read_msa(fas, "fas")]


def test_psi_and_clu():
    fas = reformat(A3M, "a3m", "fas")
    psi = reformat(fas, "fas", "psi")
    assert len(psi.splitlines()) == 3
    clu = reformat(fas, "fas", "clu")
    assert clu.startswith("CLUSTAL")
    fas_c = reformat(clu, "clu", "fas")
    assert [s for _n, s in read_msa(fas_c, "fas")] \
        == [s.upper() for _n, s in read_msa(fas, "fas")]


def test_remove_inserts_query_fixture():
    """-r: all insert states dropped -> rows equal in length."""
    with open(f"{FIX}/query.a3m") as f:
        text = f.read()
    fas = reformat(text, "a3m", "fas", remove_inserts=True,
                   M="a3m")
    pairs = read_msa(fas, "fas")
    assert len(pairs) == 59
    lens = {len(s) for _n, s in pairs}
    assert len(lens) == 1
    assert not any(c.islower() for _n, s in pairs for c in s)


def test_remove_inserts_small():
    fas = reformat(A3M, "a3m", "fas", remove_inserts=True, M="a3m")
    pairs = read_msa(fas, "fas")
    # seq1 has 10 match states (uppercase + '-'); inserts cde dropped
    assert pairs[0][1] == "MKV-LAFG"
    assert pairs[2][1] == "M-VKLA-G"


def test_remove_gapped_insert_columns():
    """-r X: insert columns with more than X% gaps are dropped, the
    rest stay.  Each insert column here has 1/3 = 33.3% gaps."""
    fas = reformat(A3M, "a3m", "fas", remove_gapped=30, M="a3m")
    pairs = read_msa(fas, "fas")
    assert pairs[0][1] == "MKV-LAFG"        # 33.3 > 30 -> dropped
    fas2 = reformat(A3M, "a3m", "fas", remove_gapped=50, M="a3m")
    pairs2 = read_msa(fas2, "fas")
    assert "cde" in pairs2[0][1]            # 33.3 <= 50 -> kept


def test_gap_modes_and_ufas():
    ufas = reformat(A3M, "a3m", "ufas")
    pairs = read_msa(ufas, "fas")
    assert pairs[0][1] == "MKVLAcdeFG"      # unaligned, no gaps
    g = reformat(A3M, "a3m", "fas", gap="-")
    assert "." not in g
    empty = reformat(A3M, "a3m", "fas", gap="")
    assert "-" not in empty.split(">seq2")[1].splitlines()[1]


def test_num_prefix_and_case():
    fas = reformat(A3M, "a3m", "fas", number=True)
    pairs = read_msa(fas, "fas")
    assert pairs[0][0].startswith("1:")
    assert pairs[2][0].startswith("3:")
    up = reformat(A3M, "a3m", "fas", case="uc")
    assert "cde" not in up
    lo = reformat(A3M, "a3m", "fas", case="lc")
    assert "MKV" not in lo


def test_sa_rows_removed_by_default():
    text = ">ss_pred\nCCCHHH--\n>sa_dssp\nAABB-CC-\n>s1\nMKVQLA-G\n"
    fas = reformat(text, "fas", "fas")
    names = [n for n, _s in read_msa(fas, "fas")]
    assert "sa_dssp" not in names and "ss_pred" in names
    fas2 = reformat(text, "fas", "fas", keep_sa=True)
    names2 = [n for n, _s in read_msa(fas2, "fas")]
    assert "sa_dssp" in names2
    fas3 = reformat(text, "fas", "fas", noss=True)
    names3 = [n for n, _s in read_msa(fas3, "fas")]
    assert "ss_pred" not in names3


def test_desclen_truncation():
    fas = reformat(A3M, "a3m", "fas", desclen=4)
    assert read_msa(fas, "fas")[0][0] == "seq1"


def test_a3m_default_matchmode_is_first(tmp_path):
    """reformat.pl:535 — with no -M, a2m/a3m output derives match
    columns from the FIRST sequence, not the 50%-gap rule."""
    fas = ">a\nACDEF\n>b\nAC-EF\n"
    out = reformat(fas, "fas", "a3m")
    assert ">a\nACDEF" in out and "AC-EF" in out
    out50 = reformat(fas, "fas", "a3m", M="50")
    assert "ACdEF" in out50


def test_cli_i_o_flags_and_batch_glob(tmp_path):
    from hhsuite_tpu.tools.reformat import main

    f1 = tmp_path / "x1.fas"
    f2 = tmp_path / "x2.fas"
    f1.write_text(">a\nACDEF\n>b\nAC-EF\n")
    f2.write_text(">c\nGHIKL\n>d\nGH-KL\n")
    assert main(["fas", "a3m", "-i", str(f1),
                 "-o", str(tmp_path / "o.a3m")]) == 0
    assert (tmp_path / "o.a3m").read_text().startswith(">a\nACDEF")
    # glob batch mode (reformat.pl examples: reformat fas sto '*.fasta')
    assert main([str(tmp_path / "x*.fas"), "sto"]) == 0
    assert (tmp_path / "x1.sto").exists()
    assert (tmp_path / "x2.sto").exists()
    assert "STOCKHOLM" in (tmp_path / "x1.sto").read_text()


def test_reformat_update_and_lname(tmp_path):
    """-u skips existing outputs (reformat.pl:218); -lname fixes the
    name column width in sto/psi/clu output (reformat.pl:747-790)."""
    from hhsuite_tpu.tools.reformat import main, reformat

    fas = tmp_path / "in.fas"
    fas.write_text(">longsequencename one\nACDEF\n>b\nAC-EF\n")
    out = tmp_path / "out.sto"
    assert main([str(fas), str(out)]) == 0
    first = out.read_text()
    fas.write_text(">changed\nGGGGG\n")
    assert main(["-u", str(fas), str(out)]) == 0
    assert out.read_text() == first          # -u kept the old file
    assert main([str(fas), str(out)]) == 0
    assert out.read_text() != first          # without -u it rewrites

    sto = reformat(">longsequencename x\nACDEF\n>b\nAC-EF\n",
                   "fas", "sto", lname=10)
    line = [ln for ln in sto.splitlines() if ln.startswith("longseq")][0]
    assert line == "longsequen ACDEF"        # truncated + padded to 10
    psi = reformat(">n x\nACDEF\n", "fas", "psi", lname=6)
    assert psi.splitlines()[0] == "n      ACDEF"
