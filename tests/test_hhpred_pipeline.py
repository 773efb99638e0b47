"""End-to-end hhpred driver smoke tests (scripts/hhpred/hhpred.pl
parity: MSA build -> hhsearch -> template selection -> PIR for
MODELLER).  MODELLER itself is licensed/external, so the pipeline must
terminate cleanly at the PIR artifact when it is absent — exactly what
hhpred.pl hands to its modeller.pm stage."""

import os
import shutil
import subprocess
import sys

import pytest

FIX = os.path.join(os.path.dirname(__file__), "fixtures")
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _db(tmp_path):
    for s in ("a3m", "hhm", "cs219"):
        for e in ("ffdata", "ffindex"):
            shutil.copy(f"{FIX}/multi_{s}.{e}", tmp_path / f"multi_{s}.{e}")
    return str(tmp_path / "multi")


@pytest.mark.slow
def test_hhpred_a3m_to_pir(tmp_path):
    """Query given as a3m: hhblits stage skipped (hhpred.pl:136-141),
    chain = hhsearch -> selection -> hhmakemodel PIR."""
    from hhsuite_tpu.tools.hhpred import hhpred

    db = _db(tmp_path)
    out = str(tmp_path / "out")
    rc = hhpred(["-i", f"{FIX}/query.a3m", "-o", out, "-d", db,
                 "-mult", "2"])
    assert rc == 0
    pir = open(out + ".pir").read()
    # PIR structure: one sequence: record for the query + >=1
    # structureX: template records, terminated by '*'
    assert pir.startswith(">P1;")
    assert "sequence:" in pir
    assert pir.count("structureX:") >= 1
    assert pir.count("*") >= 2
    # all rendered rows equal length (alignment grid)
    blocks = [b for b in pir.split(">P1;") if b.strip()]
    lens = {len("".join(b.splitlines()[2:])) for b in blocks}
    assert len(lens) == 1, f"unequal PIR row lengths: {lens}"
    # intermediate artifacts of the chain exist (hhpred.pl workingDir)
    for ext in (".hhr", ".atab", ".a3m"):
        assert os.path.exists(out + ext), ext


@pytest.mark.slow
def test_hhpred_sequence_to_pir(tmp_path):
    """Query given as single sequence: the hhblits MSA-build stage runs
    first (hhpred.pl:146-161), then the same chain."""
    from hhsuite_tpu.tools.hhpred import hhpred

    db = _db(tmp_path)
    # single-sequence query = first entry of query.a3m
    with open(f"{FIX}/query.a3m") as f:
        lines = f.read().splitlines()
    seq_lines = []
    n_hdr = 0
    for ln in lines:
        if ln.startswith("#"):
            continue
        if ln.startswith(">"):
            n_hdr += 1
            if n_hdr > 1:
                break
        seq_lines.append(ln)
    qseq = tmp_path / "query.seq"
    qseq.write_text("\n".join(seq_lines) + "\n")

    out = str(tmp_path / "sp")
    rc = hhpred(["-i", str(qseq), "-o", out, "-d", db, "-n", "1",
                 "-mult", "1"])
    assert rc == 0
    pir = open(out + ".pir").read()
    assert pir.count("structureX:") == 1   # -mult 1 = single template
    assert os.path.exists(out + ".a3m")   # hhblits-built MSA
