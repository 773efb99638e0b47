"""Utility-script equivalents (scripts/{splitfasta.pl,check_a3m.py,
get_a3m_size.py,multithread.pl,create_profile_from_hhm.pl,
hh_reader.py})."""

import os

import pytest

FIX = os.path.join(os.path.dirname(__file__), "fixtures")


def test_a3m_container_valid():
    from hhsuite_tpu.tools.a3m_container import A3MContainer

    c = A3MContainer()
    with open(f"{FIX}/query.a3m") as f:
        c.read_a3m(f)
    assert c.number_sequences == 59
    assert c.nr_match_states == 431


def test_a3m_container_rejects_diverging():
    from hhsuite_tpu.tools.a3m_container import (A3MContainer,
                                                 A3MFormatError)

    c = A3MContainer()
    with pytest.raises(A3MFormatError):
        c.read_a3m_from_lines([">a", "ACDE", ">b", "ACD"])


def test_a3m_container_consensus_and_annotations():
    from hhsuite_tpu.tools.a3m_container import (A3MContainer,
                                                 A3MFormatError)

    c = A3MContainer()
    c.read_a3m_from_lines([
        "#MyMSA", ">x_consensus", "ACDE", ">ss_pred", "CCHE",
        ">ss_conf", "9999", ">s1", "ACDE"])
    assert c.consensus[1] == "ACDE"
    assert c.annotations["ss_pred"] == "CCHE"
    assert c.number_sequences == 1
    c2 = A3MContainer()
    with pytest.raises(A3MFormatError):
        c2.read_a3m_from_lines([">ss_pred", "CCHE", ">ss_pred", "CCHE",
                                ">s1", "ACDE"])


def test_check_a3m_and_size(capsys):
    from hhsuite_tpu.tools.scripts import check_a3m, get_a3m_size

    assert check_a3m([f"{FIX}/query.a3m"]) == 0
    assert get_a3m_size([f"{FIX}/query.a3m"]) == 0
    assert capsys.readouterr().out.strip() == "59"


def test_splitfasta(tmp_path, monkeypatch):
    from hhsuite_tpu.tools.scripts import splitfasta

    fasta = tmp_path / "in.fas"
    fasta.write_text(">s1 first\nACDE\nFGH\n>s2 second\nKLMN\n")
    monkeypatch.chdir(tmp_path)
    assert splitfasta([str(fasta)]) == 0
    assert (tmp_path / "s1.seq").read_text() == ">s1 first\nACDE\nFGH\n"
    assert (tmp_path / "s2.seq").read_text() == ">s2 second\nKLMN\n"


def test_multithread(tmp_path, monkeypatch):
    from hhsuite_tpu.tools.scripts import multithread

    for k in range(3):
        (tmp_path / f"f{k}.txt").write_text(f"data{k}\n")
    monkeypatch.chdir(tmp_path)
    rc = multithread([str(tmp_path / "*.txt"),
                      "cp $file $file.bak", "-cpu", "2"])
    assert rc == 0
    for k in range(3):
        assert (tmp_path / f"f{k}.txt.bak").exists()


def test_create_profile_from_hhm(tmp_path):
    from hhsuite_tpu.tools.scripts import create_profile_from_hhm

    hhm = None
    for cand in os.listdir(FIX):
        if cand.endswith(".hhm"):
            hhm = os.path.join(FIX, cand)
            break
    if hhm is None:
        # build one from the query MSA through our own hhmake
        from hhsuite_tpu.cli.main import cmd_hhmake

        hhm = str(tmp_path / "q.hhm")
        assert cmd_hhmake(["-i", f"{FIX}/query.a3m", "-o", hhm]) == 0
    out = str(tmp_path / "q.prf")
    assert create_profile_from_hhm(["-i", hhm, "-o", out]) == 0
    lines = open(out).read().splitlines()
    assert lines[0] == "CountProfile"
    assert lines[3] == "ALPH\t20"
    hdr = lines[4].split("\t")
    assert hdr[0] == "COUNTS" and hdr[-1] == "NEFF"
    assert lines[-1] == "//"
    leng = int([l for l in lines if l.startswith("LENG")][0].split()[1])
    rows = lines[5:-1]
    assert len(rows) == leng
    first = rows[0].split("\t")
    assert first[0] == "1" and len(first) == 22
    # zero scores were bumped to 1 (reference quirk) — no zeros present
    assert all(t != "0" for t in first[1:21])


def test_hh_reader(tmp_path, capsys):
    from hhsuite_tpu.tools.scripts import hh_reader

    hhr = tmp_path / "mini.hhr"
    hhr.write_text(
        "Query         q1 test\n"
        "Match_columns 8\n"
        "Neff          2.5\n"
        "\n"
        " No Hit ...\n"
        "  1 t1   99.1 1.2E-10 3E-11  55.0  0.0    8    1-8      2-9  (20)\n"
        "\n"
        "No 1\n"
        ">t1 some template\n"
        "Probab=99.10  E-value=1.2e-10  Score=55.00  Aligned_cols=8  "
        "Identities=75%  Similarity=1.100  Sum_probs=7.5  "
        "Template_Neff=3.200\n"
        "\n"
        "Q q1              1 ACDEFGHI    8 (8)\n"
        "T t1              2 ACDEFGHI    9 (20)\n"
        "\n"
        "Done!\n")
    assert hh_reader([str(hhr)]) == 0
    out = capsys.readouterr().out
    assert out.startswith("Alignment 0\t evalue: 1.2e-10")
    lines = out.splitlines()
    assert lines[1] == "q1\t1\tACDEFGHI\t8"
    assert lines[2] == "t1\t2\tACDEFGHI\t9"


def test_addss_horiz_insertion(tmp_path):
    from hhsuite_tpu.tools.addss import addss

    a3m = tmp_path / "q.a3m"
    a3m.write_text("#My MSA\n>s1 first\nACDEFG\n>s2\nAC-EFg-\n")
    horiz = tmp_path / "q.horiz"
    horiz.write_text("Conf: 987654\nPred: CCHHEE\n  AA: ACDEFG\n")
    out = tmp_path / "out.a3m"
    rc = addss(["-i", str(a3m), "-o", str(out), "-horiz", str(horiz)])
    assert rc == 0
    lines = out.read_text().splitlines()
    assert lines[0] == "#My MSA"
    assert lines[1].startswith(">ss_pred")
    assert lines[2] == "CCHHEE"
    assert lines[3].startswith(">ss_conf")
    assert lines[4] == "987654"
    assert lines[5] == ">s1 first"
    # re-running replaces existing ss rows instead of duplicating
    rc = addss(["-i", str(out), "-o", str(out), "-horiz", str(horiz)])
    assert rc == 0
    text = out.read_text()
    assert text.count(">ss_pred") == 1


def test_addss_make_mtx():
    from hhsuite_tpu.tools.addss import make_mtx

    with open(f"{FIX}/query.a3m") as f:
        text = f.read()
    mtx, seq = make_mtx(text)
    lines = mtx.splitlines()
    assert int(lines[0]) == 431
    assert lines[1] == seq and len(seq) == 431
    # PSSM rows: one per residue, integer log-odds
    assert len(lines) == 2 + 12 + 431
    assert all(t.lstrip("-").isdigit() for t in lines[14].split())


def test_mergeali(tmp_path):
    from hhsuite_tpu.tools.mergeali import mergeali

    # two seeds aligned in a master; each has its own small a3m
    master = tmp_path / "master.fas"
    master.write_text(">seedA\nACDEFG--\n>seedB\n--DEFGHI\n")
    (tmp_path / "seedA.a3m").write_text(
        ">seedA\nACDEFG\n>memberA1\nACDEFG\n>memberA2\nAC-EFG\n")
    (tmp_path / "seedB.a3m").write_text(
        ">seedB\nDEFGHI\n>memberB1\nDEFaGHI\n")
    out = tmp_path / "merged.a3m"
    rc = mergeali(["-i", str(master), "-o", str(out),
                   "-d", str(tmp_path), "-name", "merged"])
    assert rc == 0
    lines = out.read_text().splitlines()
    assert lines[0] == "#merged"
    recs = dict(zip([l[1:] for l in lines[1::2]], lines[2::2]))
    assert recs["seedA"] == "ACDEFG--"
    assert recs["memberA2"] == "AC-EFG--"
    assert recs["seedB"] == "--DEFGHI"
    # memberB1's lowercase insert is preserved between match columns
    assert recs["memberB1"].replace("a", "") == "--DEFGHI"
    assert "a" in recs["memberB1"]
