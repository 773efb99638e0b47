"""Cross-host database-build fan-out over the shared-filesystem claim
queue (tools/batch.py:queue_fanout) — the TPU-native replacement for
the reference's MPI build lanes (lib/ffindex/src/ffindex_apply_mpi.c:552,
src/cs/cstranslate_mpi_app.h).

Contract under test: N cooperating processes sharing a queue directory
produce output BYTE-IDENTICAL to the single-process build, entries are
dealt dynamically (both workers do real work), and a dead worker's
claim is stolen and completed.
"""

import os
import subprocess
import sys
import time

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _write_a3ms(d, n=8):
    rng = np.random.default_rng(11)
    aa = np.frombuffer(b"ACDEFGHIKLMNPQRSTVWY", dtype="S1").astype("U1")
    base = "".join(rng.choice(aa, size=36))
    paths = []
    for k in range(n):
        s = list(base)
        for pos in rng.choice(len(s), size=6, replace=False):
            s[pos] = str(rng.choice(aa))
        p = os.path.join(d, f"e{k:02d}.a3m")
        with open(p, "w") as f:
            f.write(f">e{k:02d}\n{''.join(s)}\n")
        paths.append(p)
    return paths


def _read_pair(base):
    out = {}
    for ext in ("ffdata", "ffindex"):
        with open(f"{base}.{ext}", "rb") as f:
            out[ext] = f.read()
    return out


@pytest.mark.slow
def test_hhsuitedb_queue_two_processes_byte_identical(tmp_path):
    """`hhsuitedb -queue` from two concurrent processes == one process,
    byte-for-byte across _a3m/_cs219/_hhm ffdata+ffindex."""
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    src = tmp_path / "in"
    src.mkdir()
    _write_a3ms(str(src))

    single = subprocess.run(
        [sys.executable, "-m", "hhsuite_tpu", "hhsuitedb",
         "-o", f"{tmp_path}/sp", "--ia3m", f"{src}/*.a3m",
         "--cpu", "1"],
        cwd=REPO, env=env, capture_output=True, timeout=600)
    assert single.returncode == 0, single.stderr.decode()[-2000:]

    qdir = tmp_path / "q"
    qdir.mkdir()
    cmd = [sys.executable, "-m", "hhsuite_tpu", "hhsuitedb",
           "-o", f"{tmp_path}/mp", "--ia3m", f"{src}/*.a3m",
           "--cpu", "1", "-queue", str(qdir)]
    procs = [subprocess.Popen(cmd, cwd=REPO, env=env,
                              stdout=subprocess.PIPE,
                              stderr=subprocess.PIPE)
             for _ in range(2)]
    for p in procs:
        out, err = p.communicate(timeout=600)
        assert p.returncode == 0, err.decode()[-2000:]

    import re

    def _norm(pair):
        # hhmake embeds the wall-clock DATE line (fixed width, so the
        # ffindex offsets are unaffected); everything else must match
        pair = dict(pair)
        pair["ffdata"] = re.sub(rb"(?m)^DATE .*$", b"DATE  X",
                                pair["ffdata"])
        return pair

    for suffix in ("_a3m", "_cs219", "_hhm"):
        assert (_norm(_read_pair(f"{tmp_path}/sp{suffix}"))
                == _norm(_read_pair(f"{tmp_path}/mp{suffix}"))), \
            f"{suffix} differs between single- and two-process builds"

    # dynamic dealing: every entry claimed exactly once, all done
    dones = [f for f in os.listdir(qdir) if f.endswith(".claim.done")]
    assert len(dones) == 8 + 1          # entries + __merge__


@pytest.mark.slow
def test_ffindex_apply_queue_matches_serial(tmp_path):
    """`ffindex_apply -queue` (2 procs) == serial ffindex_apply."""
    from hhsuite_tpu.io.ffindex import FFindexWriter

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    with FFindexWriter(f"{tmp_path}/in.ffdata",
                       f"{tmp_path}/in.ffindex") as w:
        for k in range(6):
            w.add(f"n{k}", f"line-{k}\n".encode())

    serial = subprocess.run(
        [sys.executable, "-m", "hhsuite_tpu", "ffindex_apply",
         f"{tmp_path}/in.ffdata", f"{tmp_path}/in.ffindex",
         "-d", f"{tmp_path}/sp.ffdata", "-i", f"{tmp_path}/sp.ffindex",
         "--", "tr", "a-z", "A-Z"],
        cwd=REPO, env=env, capture_output=True, timeout=300)
    assert serial.returncode == 0, serial.stderr.decode()[-2000:]

    qdir = tmp_path / "q"
    qdir.mkdir()
    cmd = [sys.executable, "-m", "hhsuite_tpu", "ffindex_apply",
           f"{tmp_path}/in.ffdata", f"{tmp_path}/in.ffindex",
           "-d", f"{tmp_path}/mp.ffdata", "-i", f"{tmp_path}/mp.ffindex",
           "-queue", str(qdir), "--", "tr", "a-z", "A-Z"]
    procs = [subprocess.Popen(cmd, cwd=REPO, env=env,
                              stdout=subprocess.PIPE,
                              stderr=subprocess.PIPE)
             for _ in range(2)]
    for p in procs:
        out, err = p.communicate(timeout=300)
        assert p.returncode == 0, err.decode()[-2000:]

    for base in ("sp", "mp"):
        pass
    assert _read_pair(f"{tmp_path}/sp") == _read_pair(f"{tmp_path}/mp")


def test_queue_fanout_steals_dead_workers_claim(tmp_path):
    """A claim file left by a dead worker (no done marker) is stolen
    after the stale window and the entry completed by the survivor —
    the recovery the reference MPQ lacks (SURVEY §5)."""
    from hhsuite_tpu.tools.batch import _claim_path, queue_fanout

    qdir = str(tmp_path / "q")
    os.makedirs(qdir)
    names = ["a", "b", "c"]
    # simulate a dead worker holding "b": claim exists, no done marker
    with open(_claim_path(qdir, "b"), "w"):
        pass
    old = time.time() - 10
    os.utime(_claim_path(qdir, "b"), (old, old))
    os.environ["HHSUITE_TPU_QUEUE_STALE_SEC"] = "1"
    try:
        computed = []

        def compute(name):
            computed.append(name)
            return {"out": name.upper().encode()}

        merged = {}

        def merge(pdir):
            for n in names:
                with open(os.path.join(pdir, n + ".out"), "rb") as f:
                    merged[n] = f.read()

        ran_merge = queue_fanout(qdir, names, compute, merge,
                                 poll=0.05)
    finally:
        del os.environ["HHSUITE_TPU_QUEUE_STALE_SEC"]
    assert ran_merge
    assert sorted(computed) == names, "stale claim was not stolen"
    assert merged == {"a": b"A", "b": b"B", "c": b"C"}


def test_queue_fanout_single_process_completes(tmp_path):
    """Degenerate fleet of one: fan-out == plain map + merge."""
    from hhsuite_tpu.tools.batch import queue_fanout

    qdir = str(tmp_path / "q")
    os.makedirs(qdir)
    got = {}

    def merge(pdir):
        for f in sorted(os.listdir(pdir)):
            with open(os.path.join(pdir, f), "rb") as fh:
                got[f] = fh.read()

    assert queue_fanout(qdir, ["x", "y"],
                        lambda n: {"k": n.encode()}, merge, poll=0.05)
    assert got == {"x.k": b"x", "y.k": b"y"}
