"""Automated validation of the multi-host TCP process-group lane
(parallel/multihost.py — the hhblits_mpi / MPQ replacement,
src/hhblits_mpi.cpp:135-230, lib/ffindex/src/mpq/mpq.h:25-60).

Two tiers, mirroring the reference's real 2-rank mpirun regression
(data/test.sh:39,47):

* merged-output byte-identity: 3 local CPU processes through the
  ``hhblits_batch -rank/-size/-addr`` CLI vs a single-process run;
* failure recovery: a worker that claims work and dies mid-batch —
  the master must re-deal its entries to surviving workers (the
  reference's MPQ silently LOSES a crashed rank's range; ours must not).
"""

import os
import re
import socket
import subprocess
import sys
import tempfile
import threading

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_multihost_merged_output_matches_single_process():
    """3 ranks (master + 2 workers) over TCP == 1 process, byte-for-byte
    (modulo the Date line in hhr).  This is __graft_entry__'s
    dryrun_multihost relocated into the suite so it runs in CI."""
    sys.path.insert(0, REPO)
    import __graft_entry__ as g

    g.dryrun_multihost(3)


def _make_batch_inputs(tmp, n_queries=6):
    """Tiny queries + searchable db the REAL worker path can process."""
    from hhsuite_tpu.cs.context_lib import cstranslate_a3m
    from hhsuite_tpu.io.ffindex import FFindexWriter

    rng = np.random.default_rng(3)
    aa = np.frombuffer(b"ACDEFGHIKLMNPQRSTVWY", dtype="S1").astype("U1")
    base = "".join(rng.choice(aa, size=40))

    def mut(k):
        s = list(base)
        for pos in rng.choice(len(s), size=7, replace=False):
            s[pos] = str(rng.choice(aa))
        return "".join(s)

    entries = [(f"t{k:02d}.a3m", f">t{k:02d}\n{mut(k)}\n")
               for k in range(5)]
    with FFindexWriter(f"{tmp}/db_a3m.ffdata",
                       f"{tmp}/db_a3m.ffindex") as w:
        for name, text in entries:
            w.add(name, text.encode())
    with FFindexWriter(f"{tmp}/db_cs219.ffdata",
                       f"{tmp}/db_cs219.ffindex") as w:
        for name, text in entries:
            w.add(name, cstranslate_a3m(text))
    queries = [(f"q{k}", f">q{k}\n{mut(100 + k)}\n")
               for k in range(n_queries)]
    with FFindexWriter(f"{tmp}/queries.ffdata",
                       f"{tmp}/queries.ffindex") as w:
        for name, text in queries:
            w.add(name, text.encode())
    return [n for n, _ in queries]


def test_multihost_master_redeals_work_of_dead_worker():
    """Drive the master's wire protocol directly: a fake worker claims
    an entry and drops the connection without reporting; the master must
    re-deal that entry so the merged output still covers every query."""
    from hhsuite_tpu.io.ffindex import FFindexDatabase, FFindexWriter
    from hhsuite_tpu.parallel import multihost as mh

    with tempfile.TemporaryDirectory() as tmp:
        names = [f"q{k}" for k in range(5)]
        with FFindexWriter(f"{tmp}/in.ffdata", f"{tmp}/in.ffindex") as w:
            for n in names:
                w.add(n, f">{n}\nACDEF\n".encode())
        port = _free_port()
        addr = f"127.0.0.1:{port}"

        results, order = {}, {n: i for i, n in enumerate(names)}
        master = threading.Thread(
            target=mh._master, args=(addr, 3, len(names), 1, results,
                                     order), daemon=True)
        master.start()

        def connect():
            import time

            for _ in range(100):   # master may not have bound yet
                try:
                    return socket.create_connection(("127.0.0.1", port),
                                                    timeout=30)
                except OSError:
                    time.sleep(0.05)
            raise ConnectionError("master never bound")

        # worker A: claims one entry, then dies without reporting
        a = connect()
        # worker B: connects now (master accepts size-1 conns up front)
        b = connect()
        mh._send(a, ("next", 1))
        msg = mh._recv(a)
        assert msg[0] == "work" and msg[1] == [0]
        a.close()                         # <-- death with entry 0 held

        # worker B processes EVERYTHING, including the re-dealt entry 0
        got = []
        while True:
            mh._send(b, ("next", 2))
            msg = mh._recv(b)
            if msg[0] == "done":
                break
            for idx in msg[1]:
                got.append(idx)
                mh._send(b, ("result", names[idx],
                             {"hhr": f"payload-{idx}".encode()}))
        b.close()
        master.join(timeout=60)
        assert not master.is_alive()

        assert sorted(got) == [0, 1, 2, 3, 4], \
            f"entry 0 was not re-dealt: {sorted(got)}"
        assert set(results) == set(names)


def test_multihost_failed_entry_retried_once_then_poisoned():
    """An entry the worker REPORTS as failed (per-entry try/except in
    the worker loop) is re-dealt exactly ONCE (transient failures —
    device OOM, preemption — get a second chance), and a second failure
    poisons it: done-with-no-output, never dealt again.  A
    deterministic crash must not cascade through the fleet forever via
    the retry path."""
    from hhsuite_tpu.parallel import multihost as mh

    names = [f"q{k}" for k in range(3)]
    port = _free_port()
    results, order = {}, {n: i for i, n in enumerate(names)}
    master = threading.Thread(
        target=mh._master, args=(f"127.0.0.1:{port}", 2, len(names), 1,
                                 results, order), daemon=True)
    master.start()
    import time

    conn = None
    for _ in range(100):
        try:
            conn = socket.create_connection(("127.0.0.1", port),
                                            timeout=30)
            break
        except OSError:
            time.sleep(0.05)
    seen = []
    while True:
        mh._send(conn, ("next", 1))
        msg = mh._recv(conn)
        if msg[0] == "done":
            break
        for idx in msg[1]:
            seen.append(idx)
            if idx == 1:       # always-failing entry
                mh._send(conn, ("error", names[idx], "boom"))
            else:
                mh._send(conn, ("result", names[idx],
                                {"hhr": b"ok"}))
    conn.close()
    master.join(timeout=60)
    assert not master.is_alive()
    assert sorted(seen) == [0, 1, 1, 2], \
        f"failed entry must be dealt exactly twice: {seen}"
    assert set(results) == {"q0", "q2"}


def test_multihost_transient_failure_retried_on_other_worker():
    """A failed entry's retry goes to a DIFFERENT worker when one is
    connected; if the entry succeeds there (transient failure), the
    batch completes with every result present."""
    from hhsuite_tpu.parallel import multihost as mh

    names = [f"q{k}" for k in range(3)]
    port = _free_port()
    results, order = {}, {n: i for i, n in enumerate(names)}
    master = threading.Thread(
        target=mh._master, args=(f"127.0.0.1:{port}", 3, len(names), 1,
                                 results, order), daemon=True)
    master.start()
    import time

    def connect():
        for _ in range(100):
            try:
                return socket.create_connection(("127.0.0.1", port),
                                                timeout=30)
            except OSError:
                time.sleep(0.05)
        raise ConnectionError("master never bound")

    a, b = connect(), connect()
    # worker A claims entry 0 and reports a (transient) failure
    mh._send(a, ("next", 1))
    msg = mh._recv(a)
    assert msg == ("work", [0])
    mh._send(a, ("error", names[0], "transient"))
    # worker B drains everything; the retry of 0 must land on B
    b_seen = []
    while True:
        mh._send(b, ("next", 2))
        msg = mh._recv(b)
        if msg[0] == "done":
            break
        for idx in msg[1]:
            b_seen.append(idx)
            mh._send(b, ("result", names[idx], {"hhr": b"ok"}))
    # A asks again only after B finished -> gets done
    mh._send(a, ("next", 1))
    assert mh._recv(a)[0] == "done"
    a.close()
    b.close()
    master.join(timeout=60)
    assert not master.is_alive()
    assert 0 in b_seen, f"retry did not go to the other worker: {b_seen}"
    assert set(results) == set(names), "transient failure lost an entry"


def test_multihost_rank0_raises_on_missing_entries(tmp_path):
    """run_multihost writes what succeeded, then RAISES when any entry
    is missing — a partial batch must not look like a success
    (ADVICE r4: exit code 0 with silently missing entries)."""
    from hhsuite_tpu.io.ffindex import FFindexDatabase, FFindexWriter
    from hhsuite_tpu.parallel import multihost as mh

    names = [f"q{k}" for k in range(3)]
    with FFindexWriter(f"{tmp_path}/in.ffdata",
                       f"{tmp_path}/in.ffindex") as w:
        for n in names:
            w.add(n, f">{n}\nACDEF\n".encode())
    port = _free_port()
    err: list = []

    def rank0():
        try:
            mh.run_multihost(f"{tmp_path}/in", "-",
                             f"{tmp_path}/out", 0, 2,
                             f"127.0.0.1:{port}", log=lambda *a: None)
        except RuntimeError as e:
            err.append(e)

    t = threading.Thread(target=rank0, daemon=True)
    t.start()
    import time

    conn = None
    for _ in range(100):
        try:
            conn = socket.create_connection(("127.0.0.1", port),
                                            timeout=30)
            break
        except OSError:
            time.sleep(0.05)
    while True:
        mh._send(conn, ("next", 1))
        msg = mh._recv(conn)
        if msg[0] == "done":
            break
        for idx in msg[1]:
            if idx == 1:      # q1 fails on every attempt
                mh._send(conn, ("error", names[idx], "boom"))
            else:
                mh._send(conn, ("result", names[idx], {"hhr": b"ok"}))
    conn.close()
    t.join(timeout=60)
    assert not t.is_alive()
    assert err and "1/3 entries missing" in str(err[0])
    out = FFindexDatabase(f"{tmp_path}/out_hhr.ffdata",
                          f"{tmp_path}/out_hhr.ffindex")
    assert [e.name for e in out.entries] == ["q0", "q2"], \
        "successful entries must still be written before the raise"


def test_multihost_master_survives_rank_that_never_connects():
    """A rank that crashes BEFORE connecting (or never starts) must not
    hang the group: the master's accept loop is dynamic, so a 3-rank
    lane where only ONE worker ever appears still completes every
    entry through that worker.  (The original master blocked on
    exactly size-1 accepts — a pre-connection death deadlocked it.)"""
    from hhsuite_tpu.parallel import multihost as mh

    names = [f"q{k}" for k in range(4)]
    port = _free_port()
    addr = f"127.0.0.1:{port}"
    results, order = {}, {n: i for i, n in enumerate(names)}
    master = threading.Thread(
        target=mh._master, args=(addr, 3, len(names), 1, results,
                                 order), daemon=True)
    master.start()

    import time

    conn = None
    for _ in range(100):
        try:
            conn = socket.create_connection(("127.0.0.1", port),
                                            timeout=30)
            break
        except OSError:
            time.sleep(0.05)
    assert conn is not None, "master never bound"
    # rank 2 never connects; the single worker must still drain all
    got = []
    while True:
        mh._send(conn, ("next", 1))
        msg = mh._recv(conn)
        if msg[0] == "done":
            break
        for idx in msg[1]:
            got.append(idx)
            mh._send(conn, ("result", names[idx],
                            {"hhr": f"p{idx}".encode()}))
    conn.close()
    master.join(timeout=60)
    assert not master.is_alive()
    assert sorted(got) == [0, 1, 2, 3]
    assert set(results) == set(names)


@pytest.mark.slow
def test_multihost_rank_worker_death_end_to_end():
    """Full-lane failure injection: 4 ranks where one WORKER PROCESS is
    killed mid-run; the merged output must still contain every query
    (re-dealt to the surviving worker) and match the single-process
    run byte-for-byte."""
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    with tempfile.TemporaryDirectory() as tmp:
        names = _make_batch_inputs(tmp)
        port = _free_port()
        common = [sys.executable, "-m", "hhsuite_tpu", "hhblits_batch",
                  "-hhsearch", "-i", f"{tmp}/queries", "-d", f"{tmp}/db",
                  "-size", "4", "-addr", f"127.0.0.1:{port}"]
        procs = {r: subprocess.Popen(
            common + ["-o", f"{tmp}/mh", "-rank", str(r)],
            cwd=REPO, env=env, stdout=subprocess.PIPE,
            stderr=subprocess.PIPE) for r in range(4)}

        # kill worker rank 3 as soon as it is busy (it will have claimed
        # at least its first entry by then; chunk=1 so exactly the
        # claimed entries need re-dealing)
        import time

        deadline = time.time() + 300
        victim = procs.pop(3)
        time.sleep(6.0)
        victim.kill()
        victim.wait()

        for r, p in procs.items():
            out, err = p.communicate(timeout=max(10., deadline
                                                 - time.time()))
            assert p.returncode == 0, f"rank {r}: {err.decode()[-2000:]}"

        single = subprocess.run(
            [sys.executable, "-m", "hhsuite_tpu", "hhblits_batch",
             "-hhsearch", "-i", f"{tmp}/queries", "-d", f"{tmp}/db",
             "-o", f"{tmp}/sp", "-cpu", "1"],
            cwd=REPO, env=env, capture_output=True, timeout=300)
        assert single.returncode == 0, single.stderr.decode()[-2000:]

        from hhsuite_tpu.io.ffindex import FFindexDatabase

        for kind in ("hhr", "m8"):
            mhdb = FFindexDatabase(f"{tmp}/mh_{kind}.ffdata",
                                   f"{tmp}/mh_{kind}.ffindex")
            spdb = FFindexDatabase(f"{tmp}/sp_{kind}.ffdata",
                                   f"{tmp}/sp_{kind}.ffindex")
            assert [e.name for e in mhdb.entries] == names, \
                f"{kind}: lost entries after worker death"
            for e in spdb.entries:
                a = spdb.read_text(e.name)
                c = mhdb.read_text(e.name)
                if kind == "hhr":
                    a = re.sub(r"(?m)^Date.*$", "", a)
                    c = re.sub(r"(?m)^Date.*$", "", c)
                assert a == c, f"{kind}:{e.name} differs"
