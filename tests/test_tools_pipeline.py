"""DB-build tool pipeline vs reference outputs (data/test.sh:20-33):
hhconsensus -> hhfilter -> hhmake, each compared against the ffindex
entries produced by the reference binaries."""

import os

import pytest

from hhsuite_tpu.apps import hhconsensus, hhfilter, hhmake
from hhsuite_tpu.io.ffindex import FFindexDatabase

FIX = os.path.join(os.path.dirname(__file__), "fixtures")


@pytest.fixture(scope="module")
def query():
    with open(f"{FIX}/query.a3m") as f:
        return f.read()


def test_hhconsensus_byte_identical(query):
    db = FFindexDatabase(f"{FIX}/single_a3m_cons.ffdata",
                         f"{FIX}/single_a3m_cons.ffindex")
    want = db.read_text(db.entries[0].name)
    cons_fa, a3m = hhconsensus(query, "stdin")
    assert a3m == want
    assert cons_fa.startswith(">sp|Q5VUD6|FA69B_HUMAN")


def test_hhfilter_byte_identical(query):
    cons = FFindexDatabase(f"{FIX}/single_a3m_cons.ffdata",
                           f"{FIX}/single_a3m_cons.ffindex")
    a3m = FFindexDatabase(f"{FIX}/single_a3m.ffdata",
                          f"{FIX}/single_a3m.ffindex")
    got = hhfilter(cons.read_text(cons.entries[0].name), "stdin",
                   Ndiff=1000)
    assert got == a3m.read_text(a3m.entries[0].name)


def test_hhmake_pipeline(query):
    a3m = FFindexDatabase(f"{FIX}/single_a3m.ffdata",
                          f"{FIX}/single_a3m.ffindex")
    hhm = FFindexDatabase(f"{FIX}/single_hhm.ffdata",
                          f"{FIX}/single_hhm.ffindex")
    got = hhmake(a3m.read_text(a3m.entries[0].name), "stdin", datestr="X")
    want = hhm.read_text(hhm.entries[0].name)
    gl = [l for l in got.splitlines() if not l.startswith(("COM", "DATE"))]
    wl = [l for l in want.splitlines() if not l.startswith(("COM", "DATE"))]
    assert len(gl) == len(wl)
    exact = 0
    for g, w in zip(gl, wl):
        if g == w:
            exact += 1
            continue
        gt, wt = g.split(), w.split()
        assert len(gt) == len(wt), (g, w)
        for a, b in zip(gt, wt):
            if a == b:
                continue
            assert a != "*" and b != "*", (g, w)
            assert abs(int(a) - int(b)) <= 1, (g, w)
    assert exact / len(wl) > 0.95


def test_hhfilter_neff_byte_identical():
    """-neff target diversity filter (FilterNeff bisection) vs reference
    hhfilter -neff 3 output."""
    from hhsuite_tpu.apps import hhfilter

    with open(f"{FIX}/query.a3m") as f:
        text = f.read()
    out = hhfilter(text, "query.a3m", Neff=3.0)
    with open(f"{FIX}/golden_neff3.a3m") as f:
        want = f.read()
    assert out == want


def test_cstranslate_pool_matches_serial(tmp_path):
    """-cpu N fan-out (the cstranslate_mpi role) is byte-identical to
    the serial path, input order preserved."""
    import shutil

    from hhsuite_tpu.cli.main import cmd_cstranslate

    fix = os.path.join(os.path.dirname(__file__), "fixtures")
    for ext in ("ffdata", "ffindex"):
        shutil.copy(f"{fix}/multi_a3m.{ext}", tmp_path / f"in.{ext}")
    a = str(tmp_path / "ser")
    b = str(tmp_path / "par")
    assert cmd_cstranslate(["-f", "-i", str(tmp_path / "in"), "-o", a,
                            "-x", "0.3", "-c", "4", "-cpu", "1"]) == 0
    assert cmd_cstranslate(["-f", "-i", str(tmp_path / "in"), "-o", b,
                            "-x", "0.3", "-c", "4", "-cpu", "4"]) == 0
    with open(a + ".ffdata", "rb") as f1, open(b + ".ffdata", "rb") as f2:
        assert f1.read() == f2.read()
    with open(a + ".ffindex") as f1, open(b + ".ffindex") as f2:
        assert f1.read() == f2.read()


def test_cstranslate_outformat_matchassign_append(tmp_path):
    """cstranslate -O prf / -M (FASTA gap rule) / -a append vs
    reference-binary goldens (generated with the round-2 reference
    build; -A/-D cs219.lib -x 0.3 -c 4)."""
    import shutil

    from hhsuite_tpu.cli.main import cmd_cstranslate

    fix = os.path.join(os.path.dirname(__file__), "fixtures")
    a3m = os.path.join(fix, "cst_in.a3m")
    fas = os.path.join(fix, "cst_flat.fas")
    lib = os.path.join(fix, "cs219.lib") \
        if os.path.exists(os.path.join(fix, "cs219.lib")) else None
    base_args = ["-A", "internal", "-D", "internal", "-x", "0.3",
                 "-c", "4"]

    out = str(tmp_path / "prf.as")
    assert cmd_cstranslate(["-i", a3m, "-o", out, "-O", "prf",
                            "-I", "a3m"] + base_args) == 0
    golden = open(os.path.join(fix, "cstranslate_prf.golden"),
                  "rb").read()
    got = open(out, "rb").read()
    # the golden's NAME line used the original basename; normalize it
    golden = golden.replace(b"NAME\tcst_i\n", b"")
    got = got.replace(b"NAME\tcst_i\n", b"")
    assert got == golden

    out = str(tmp_path / "m20.as")
    assert cmd_cstranslate(["-i", fas, "-o", out, "-M", "20",
                            "-I", "fas"] + base_args) == 0
    assert open(out, "rb").read() == open(
        os.path.join(fix, "cstranslate_m20.golden"), "rb").read()

    out = str(tmp_path / "mq.as")
    assert cmd_cstranslate(["-i", fas, "-o", out,
                            "-I", "fas"] + base_args) == 0
    assert open(out, "rb").read() == open(
        os.path.join(fix, "cstranslate_fas_query.golden"), "rb").read()

    # -a appends; two runs double the payload
    app = str(tmp_path / "app.as")
    for _ in range(2):
        assert cmd_cstranslate(["-i", fas, "-a", app,
                                "-I", "fas"] + base_args) == 0
    single = open(os.path.join(fix, "cstranslate_fas_query.golden"),
                  "rb").read()
    assert open(app, "rb").read() == single + single
