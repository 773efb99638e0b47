"""hhsuitedb builder + batch driver + early-stopping filter."""

import os
import shutil

import pytest

from hhsuite_tpu.constants import Parameters

FIX = os.path.join(os.path.dirname(__file__), "fixtures")


@pytest.fixture(scope="module")
def built_db(tmp_path_factory):
    import jax

    jax.config.update("jax_platforms", "cpu")
    from hhsuite_tpu.tools.hhsuitedb import build_hhsuite_db

    tmp = tmp_path_factory.mktemp("dbbuild")
    shutil.copy(f"{FIX}/query.a3m", tmp / "fam1.a3m")
    shutil.copy(f"{FIX}/omat_template.a3m", tmp / "fam2.a3m") \
        if os.path.exists(f"{FIX}/omat_template.a3m") else None
    # derive a second family from the omat fixture db
    from hhsuite_tpu.io.ffindex import FFindexDatabase

    src = FFindexDatabase(f"{FIX}/omat_db_a3m.ffdata",
                          f"{FIX}/omat_db_a3m.ffindex")
    (tmp / "fam2.a3m").write_text(src.read_text(src.entries[0].name))
    build_hhsuite_db(str(tmp / "mydb"),
                     [str(tmp / "fam1.a3m"), str(tmp / "fam2.a3m")],
                     threads=1, log=lambda *a: None)
    return tmp


def test_hhsuitedb_layout(built_db):
    tmp = built_db
    for suffix in ("_a3m", "_hhm", "_cs219"):
        assert os.path.exists(tmp / f"mydb{suffix}.ffdata")
        assert os.path.exists(tmp / f"mydb{suffix}.ffindex")
    from hhsuite_tpu.io.ffindex import FFindexDatabase

    cs = FFindexDatabase(str(tmp / "mydb_cs219.ffdata"),
                         str(tmp / "mydb_cs219.ffindex"))
    assert len(cs) == 2
    hhm = FFindexDatabase(str(tmp / "mydb_hhm.ffdata"),
                          str(tmp / "mydb_hhm.ffindex"))
    assert len(hhm) == 1        # only the >50-sequence MSA gets an HHM


def test_search_against_built_db(built_db):
    from hhsuite_tpu.search.engine import HHDatabase, run_hhsearch

    tmp = built_db
    par = Parameters()
    par.nocontxt = True
    par.prefilter = False
    par.num_rounds = 1
    db = HHDatabase(str(tmp / "mydb"))
    with open(f"{FIX}/query.a3m") as f:
        query = f.read()
    q, hl = run_hhsearch(par, query, db, "query.a3m")
    by_cols = {h.matched_cols for h in hl.hits}
    assert 431 in by_cols       # self hit over full length
    top = hl.hits[0]
    assert abs(top.score - 1378.39) < 0.1


def test_batch_driver(built_db, tmp_path):
    from hhsuite_tpu.io.ffindex import FFindexDatabase, FFindexWriter
    from hhsuite_tpu.tools.batch import merge_shards, run_batch

    tmp = built_db
    with open(f"{FIX}/query.a3m") as f:
        query = f.read()
    with FFindexWriter(str(tmp_path / "queries.ffdata"),
                       str(tmp_path / "queries.ffindex")) as w:
        w.add("q1", query.encode())
    run_batch(str(tmp_path / "queries"), str(tmp / "mydb"),
              str(tmp_path / "res"), mode="hhsearch",
              par_overrides={"nocontxt": True, "prefilter": False,
                             "num_rounds": 1},
              threads=1, log=lambda *a: None)
    hhr = FFindexDatabase(str(tmp_path / "res_hhr.ffdata"),
                          str(tmp_path / "res_hhr.ffindex"))
    out = hhr.read_text("q1")
    assert "Match_columns 431" in out
    m8 = FFindexDatabase(str(tmp_path / "res_m8.ffdata"),
                         str(tmp_path / "res_m8.ffindex"))
    assert m8.read_text("q1").count("\n") >= 1
    # shard merging (hhblits_mpi ffmerge_splits semantics)
    merge_shards(str(tmp_path / "merged"), [str(tmp_path / "res")],
                 kinds=("hhr", "m8"))
    merged = FFindexDatabase(str(tmp_path / "merged_hhr.ffdata"),
                             str(tmp_path / "merged_hhr.ffindex"))
    assert merged.read_text("q1") == out


def test_early_stopping_filter(built_db):
    """With an absurdly high filter threshold the first 2000-block stops
    the scan; hits from the first block are still reported."""
    from hhsuite_tpu.search.engine import HHDatabase
    from hhsuite_tpu.search.hhblits import run_hhblits

    tmp = built_db
    par = Parameters.hhblits_defaults()
    par.nocontxt = True
    par.num_rounds = 1
    assert par.early_stopping_filter
    db = HHDatabase(str(tmp / "mydb"))
    with open(f"{FIX}/query.a3m") as f:
        query = f.read()
    q, hl, qali = run_hhblits(par, query, db, "query.a3m")
    assert len(hl.hits) >= 1


def test_ffindex_from_fasta_with_split(tmp_path):
    from hhsuite_tpu.cli.main import cmd_ffindex_from_fasta_with_split
    from hhsuite_tpu.io.ffindex import FFindexDatabase

    fasta = tmp_path / "in.fasta"
    fasta.write_text(">sp|P12345|FIRST test protein\n"
                     "ACDEFG\nHIKLMN\n"
                     ">plainname other\nPQRSTV\n")
    args = [str(tmp_path / "hdr.ffdata"), str(tmp_path / "hdr.ffindex"),
            str(tmp_path / "seq.ffdata"), str(tmp_path / "seq.ffindex"),
            str(fasta)]
    assert cmd_ffindex_from_fasta_with_split(["-s"] + args) == 0
    hdr = FFindexDatabase(str(tmp_path / "hdr.ffdata"),
                          str(tmp_path / "hdr.ffindex"))
    seq = FFindexDatabase(str(tmp_path / "seq.ffdata"),
                          str(tmp_path / "seq.ffindex"))
    # '|'-field 2 extracted as the short id (get_short_id)
    assert hdr.read_text("P12345") == ">sp|P12345|FIRST test protein"
    assert seq.read_text("P12345") == "ACDEFGHIKLMN"
    assert seq.read_text("plainname") == "PQRSTV"
    # refuses to overwrite (reference EEXIST behavior)
    assert cmd_ffindex_from_fasta_with_split(args) == 1


def test_ffindex_reduce(tmp_path):
    from hhsuite_tpu.cli.main import cmd_ffindex_reduce
    from hhsuite_tpu.io.ffindex import FFindexWriter

    with FFindexWriter(str(tmp_path / "d.ffdata"),
                       str(tmp_path / "d.ffindex")) as w:
        w.add("a", b"hello\n")
        w.add("b", b"world\n")
    out = tmp_path / "sink.txt"
    rc = cmd_ffindex_reduce([
        str(tmp_path / "d.ffdata"), str(tmp_path / "d.ffindex"),
        "sh", "-c", f"cat >> {out}"])
    assert rc == 0
    assert out.read_text() == "hello\nworld\n"


def test_hhblits_ca3m_driver(built_db, tmp_path):
    """hhblits_ca3m semantics (src/hhblits_ca3m.cpp:120-240): queries
    come from a compressed ca3m database and are expanded through the
    companion _sequence/_header ffindexes before the normal search."""
    from hhsuite_tpu.cli.main import cmd_ffindex_from_fasta_with_split
    from hhsuite_tpu.io.ca3m import compress_a3m
    from hhsuite_tpu.io.ffindex import FFindexDatabase, FFindexWriter
    from hhsuite_tpu.tools.batch import run_batch

    tmp = built_db
    with open(f"{FIX}/query.a3m") as f:
        query = f.read()

    # companion _sequence/_header DBs hold every member's full sequence
    fasta_lines = []
    seen = set()
    hdr = None
    seqp = []
    records = []
    for line in query.splitlines() + [">"]:
        if line.startswith(">"):
            if hdr is not None and seqp:
                records.append((hdr, "".join(seqp)))
            hdr = line
            seqp = []
        elif not line.startswith("#"):
            seqp.append(line.strip())
    for h, s in records:
        full = s.replace("-", "").replace(".", "").upper()
        if h not in seen and full:
            seen.add(h)
            fasta_lines += [h, full]
    (tmp_path / "members.fasta").write_text("\n".join(fasta_lines) + "\n")
    qbase = str(tmp_path / "qdb")
    rc = cmd_ffindex_from_fasta_with_split([
        qbase + "_header.ffdata", qbase + "_header.ffindex",
        qbase + "_sequence.ffdata", qbase + "_sequence.ffindex",
        str(tmp_path / "members.fasta")])
    assert rc == 0

    # consensus-led a3m (db-build MSAs always carry one) -> ca3m entry
    cons = records[0][1].replace("-", "").upper()
    a3m_text = (">q1_consensus\n" + cons + "\n"
                + "\n".join(h + "\n" + s for h, s in records) + "\n")
    seq_db = FFindexDatabase(qbase + "_sequence.ffdata",
                             qbase + "_sequence.ffindex")
    body = compress_a3m(a3m_text, seq_db)
    assert body is not None
    with FFindexWriter(qbase + "_ca3m.ffdata", qbase + "_ca3m.ffindex") as w:
        w.add("q1", body)

    run_batch(qbase, str(tmp / "mydb"), str(tmp_path / "res"),
              mode="hhblits",
              par_overrides={"nocontxt": True, "num_rounds": 1},
              threads=1, log=lambda *a: None, in_ca3m=True)
    hhr = FFindexDatabase(str(tmp_path / "res_hhr.ffdata"),
                          str(tmp_path / "res_hhr.ffindex"))
    out = hhr.read_text("q1")
    assert "Match_columns 431" in out
    a3m_out = FFindexDatabase(str(tmp_path / "res_a3m.ffdata"),
                              str(tmp_path / "res_a3m.ffindex"))
    assert a3m_out.read_text("q1").startswith(">")


def test_hhpred_pipeline(built_db, tmp_path):
    """hhpred wrapper (scripts/hhpred/hhpred.pl): a3m -> addss(-horiz)
    -> hhsearch -> template selection -> PIR; MODELLER gated."""
    from hhsuite_tpu.tools.hhpred import hhpred

    tmp = built_db
    import shutil
    shutil.copy(f"{FIX}/query.a3m", tmp_path / "q.a3m")
    horiz = tmp_path / "q.horiz"
    # 431-column fake psipred output
    horiz.write_text("Conf: " + "9" * 431 + "\nPred: " + "C" * 431 + "\n")
    out = str(tmp_path / "model")
    rc = hhpred(["-i", str(tmp_path / "q.a3m"), "-o", out,
                 "-d", str(tmp / "mydb"), "-horiz", str(horiz)])
    assert rc == 0
    assert os.path.exists(out + ".hhr")
    pir = open(out + ".pir").read()
    assert pir.startswith(">P1;") and "structureX" in pir
    # the ss annotation actually made it into the working a3m
    a3m = open(out + ".a3m").read()
    assert ">ss_pred" in a3m


def test_queue_dynamic_work_dealing(built_db, tmp_path):
    """The MPQ analog: two 'hosts' share one claim-queue directory;
    every query runs on exactly one of them, shards merge to the full
    result set, and the -shard k/N static split covers all entries."""
    from hhsuite_tpu.io.ffindex import FFindexDatabase, FFindexWriter
    from hhsuite_tpu.tools.batch import merge_shards, run_batch

    tmp = built_db
    with open(f"{FIX}/query.a3m") as f:
        query = f.read()
    with FFindexWriter(str(tmp_path / "queries.ffdata"),
                       str(tmp_path / "queries.ffindex")) as w:
        for k in range(4):
            w.add(f"q{k}", query.encode())
    common = dict(mode="hhsearch",
                  par_overrides={"nocontxt": True, "prefilter": False,
                                 "num_rounds": 1},
                  threads=1, log=lambda *a: None)
    qdir = str(tmp_path / "queue")
    run_batch(str(tmp_path / "queries"), str(tmp / "mydb"),
              str(tmp_path / "host0"), queue_dir=qdir, **common)
    run_batch(str(tmp_path / "queries"), str(tmp / "mydb"),
              str(tmp_path / "host1"), queue_dir=qdir, **common)
    # host0 ran first and claimed everything; host1 got nothing new
    h0 = FFindexDatabase(str(tmp_path / "host0_hhr.ffdata"),
                         str(tmp_path / "host0_hhr.ffindex"))
    assert len(h0) == 4
    assert not os.path.exists(str(tmp_path / "host1_hhr.ffdata")) or \
        len(FFindexDatabase(str(tmp_path / "host1_hhr.ffdata"),
                            str(tmp_path / "host1_hhr.ffindex"))) == 0
    claims = [f for f in os.listdir(qdir) if f.endswith(".claim")]
    dones = [f for f in os.listdir(qdir) if f.endswith(".done")]
    assert len(claims) == 4               # one claim file per entry
    assert len(dones) == 4                # all entries completed

    # static -shard k/N split: disjoint and complete
    run_batch(str(tmp_path / "queries"), str(tmp / "mydb"),
              str(tmp_path / "s0"), shard="0/2", **common)
    run_batch(str(tmp_path / "queries"), str(tmp / "mydb"),
              str(tmp_path / "s1"), shard="1/2", **common)
    merge_shards(str(tmp_path / "all"),
                 [str(tmp_path / "s0"), str(tmp_path / "s1")],
                 kinds=("hhr", "m8"))
    merged = FFindexDatabase(str(tmp_path / "all_hhr.ffdata"),
                             str(tmp_path / "all_hhr.ffindex"))
    assert sorted(e.name for e in merged.entries) == \
        ["q0", "q1", "q2", "q3"]


def test_batch_hhalign_mode(tmp_path):
    """hhalign_mpi equivalent: every input entry aligned against the
    same -t template files, no database needed."""
    from hhsuite_tpu.io.ffindex import FFindexDatabase, FFindexWriter
    from hhsuite_tpu.tools.batch import run_batch

    with open(f"{FIX}/query.a3m") as f:
        query = f.read()
    with FFindexWriter(str(tmp_path / "qs.ffdata"),
                       str(tmp_path / "qs.ffindex")) as w:
        w.add("qa", query.encode())
        w.add("qb", query.encode())
    run_batch(str(tmp_path / "qs"), "-", str(tmp_path / "ali"),
              mode="hhalign",
              par_overrides={"nocontxt": True,
                             "__template_files": [f"{FIX}/query.a3m"]},
              threads=1, log=lambda *a: None)
    hhr = FFindexDatabase(str(tmp_path / "ali_hhr.ffdata"),
                          str(tmp_path / "ali_hhr.ffindex"))
    strip = lambda t: [ln for ln in t.splitlines()
                       if not ln.startswith("Date")]
    out_a = hhr.read_text("qa")
    assert "Probab=100.00" in out_a
    assert strip(out_a) == strip(hhr.read_text("qb"))

def test_queue_dead_worker_recovery(built_db, tmp_path, monkeypatch):
    """A claim without a completion marker (= worker died mid-entry) is
    re-dealt once stale, and -merge audits input-vs-output entry sets
    (the reference's MPQ silently loses crashed ranks' work)."""
    from hhsuite_tpu.io.ffindex import FFindexDatabase, FFindexWriter
    from hhsuite_tpu.tools.batch import (_claim_path, merge_shards,
                                         run_batch)

    tmp = built_db
    with open(f"{FIX}/query.a3m") as f:
        query = f.read()
    with FFindexWriter(str(tmp_path / "queries.ffdata"),
                       str(tmp_path / "queries.ffindex")) as w:
        for k in range(3):
            w.add(f"q{k}", query.encode())
    common = dict(mode="hhsearch",
                  par_overrides={"nocontxt": True, "prefilter": False,
                                 "num_rounds": 1},
                  threads=1, log=lambda *a: None)
    qdir = str(tmp_path / "queue")
    os.makedirs(qdir)
    # simulate a worker that claimed q1 and died before finishing
    open(_claim_path(qdir, "q1"), "w").close()

    run_batch(str(tmp_path / "queries"), str(tmp / "mydb"),
              str(tmp_path / "h0"), queue_dir=qdir, **common)
    # q1's fresh claim was honored (not stale yet): it is missing
    missing = merge_shards(str(tmp_path / "m1"), [str(tmp_path / "h0")],
                           kinds=("hhr", "m8"),
                           expected=["q0", "q1", "q2"],
                           log=lambda *a: None)
    assert missing == ["q1"]

    # second pass with the stale timeout at 0: the dead claim is stolen
    monkeypatch.setenv("HHSUITE_TPU_QUEUE_STALE_SEC", "0")
    run_batch(str(tmp_path / "queries"), str(tmp / "mydb"),
              str(tmp_path / "h1"), queue_dir=qdir, **common)
    missing = merge_shards(str(tmp_path / "m2"),
                           [str(tmp_path / "h0"), str(tmp_path / "h1")],
                           kinds=("hhr", "m8"),
                           expected=["q0", "q1", "q2"],
                           log=lambda *a: None)
    assert missing == []
    merged = FFindexDatabase(str(tmp_path / "m2_hhr.ffdata"),
                             str(tmp_path / "m2_hhr.ffindex"))
    assert sorted(e.name for e in merged.entries) == ["q0", "q1", "q2"]
