"""Multi-host runtime: MPQ master/worker semantics over a TCP process
group instead of MPI.

TPU-native replacement for hhblits_mpi (src/hhblits_mpi.cpp:135-230 +
lib/ffindex/src/mpq/mpq.h:25-60): rank 0 runs the master, dealing
query-index ranges to workers dynamically (execution-time load
balancing, like MPQ_Master's deal loop), workers stream each finished
entry's outputs BACK OVER THE GROUP CHANNEL, and rank 0 writes the
single merged output database directly — the ffmerge_splits
post-barrier merge (src/hhblits_mpi.cpp:83-93,210-219) collapses into
the collection loop, so no per-rank shard files and no shared
filesystem are needed (the filesystem claim queue in tools/batch.py
remains as the alternative for NFS-style clusters).

Device story per rank: each process owns its local chip(s); inside a
rank the usual device mesh shards template batches (parallel/mesh.py).
``jax.distributed`` can optionally join the ranks into one global JAX
process group (multi-host collectives over DCN) — enabled when the
caller passes ``jax_coordinator``; the search engine itself only needs
the local devices, so the runtime degrades gracefully without it.

Wire protocol: length-prefixed pickles over one TCP connection per
worker.  Messages:
  worker -> master: ("next", rank) | ("result", name, {kind: bytes})
                    | ("error", name, message)
  master -> worker: ("work", [entry_indices]) | ("done",)

("error", ...) contains a failed entry: the worker's per-entry
try/except reports the failure instead of dying.  The master re-deals
a failed entry ONCE (preferring a different worker, so transient
failures — device OOM, TPU preemption, flaky reads — get a second
chance on a healthy rank); a second failure poisons it: marked
done-with-no-output and never dealt again, because a deterministic
crash would otherwise cycle through the fleet forever via the
death-recovery path.  Rank 0 still writes every entry that DID
succeed, then raises — a batch with missing entries must not exit 0.
"""

from __future__ import annotations

import os
import pickle
import socket
import struct
import threading
from typing import Dict, List, Optional, Tuple


def _send(conn: socket.socket, obj) -> None:
    payload = pickle.dumps(obj, protocol=pickle.HIGHEST_PROTOCOL)
    conn.sendall(struct.pack(">Q", len(payload)) + payload)


def _recv(conn: socket.socket):
    hdr = b""
    while len(hdr) < 8:
        part = conn.recv(8 - len(hdr))
        if not part:
            raise ConnectionError("peer closed")
        hdr += part
    n = struct.unpack(">Q", hdr)[0]
    buf = bytearray()
    while len(buf) < n:
        part = conn.recv(min(1 << 20, n - len(buf)))
        if not part:
            raise ConnectionError("peer closed")
        buf += part
    return pickle.loads(bytes(buf))


def _default_grace() -> float:
    """Worker-less retirement window, seconds.  150 s default; fleets
    with slow container/TPU init (ADVICE r4) raise it via
    HHSUITE_TPU_MH_GRACE without touching call sites."""
    try:
        return float(os.environ.get("HHSUITE_TPU_MH_GRACE", "150"))
    except ValueError:
        return 150.0


def _master(addr: str, size: int, n_entries: int, chunk: int,
            results: Dict[str, Dict[str, bytes]],
            order: Dict[str, int], grace: Optional[float] = None,
            max_attempts: int = 2) -> None:
    """MPQ_Master with failure recovery: deal index ranges on request,
    collect per-entry results until every entry is done.  Unlike the
    reference's MPQ (whose deal loop loses a crashed rank's range,
    lib/ffindex/src/mpq/mpq.h:25-60), work dealt to a connection that
    drops before reporting results is returned to the pool and
    re-dealt to surviving workers; a worker that asks for work while
    other workers still hold outstanding entries blocks until that
    work completes or is re-dealt.

    An entry a worker REPORTS as failed is retried up to
    ``max_attempts`` total attempts, each retry dealt to a different
    worker whenever one is connected (transient failures recover;
    deterministic crashes burn at most ``max_attempts`` workers, then
    the entry is poisoned: done with no output).

    The accept loop is DYNAMIC — the master never blocks on a fixed
    worker count, so a rank that dies (or never starts) before
    connecting cannot hang the group; dealing starts with the first
    worker.  If no worker is connected and none (re)appears within
    ``grace`` seconds while entries are still outstanding, the master
    retires with partial results (run_multihost then writes what
    succeeded and RAISES)."""
    import time as _time

    if grace is None:
        grace = _default_grace()
    host, port = addr.rsplit(":", 1)
    srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
    srv.bind((host, int(port)))
    srv.listen(max(size, 8))
    srv.settimeout(0.5)

    cv = threading.Condition()
    next_idx = 0            # fresh-work pointer
    active = 0              # currently-connected workers
    redeal: List[int] = []  # dead workers' indices + retryable failures
    done: set = set()       # indices with results received
    attempts: Dict[int, int] = {}   # reported failures per entry
    failed_by: Dict[int, set] = {}  # worker ids that failed the entry
    wid_seq = [0]

    def serve(conn, wid):
        nonlocal next_idx, active
        mine: set = set()
        try:
            while True:
                msg = _recv(conn)
                if msg[0] == "next":
                    with cv:
                        batch: List[int] = []
                        while True:
                            # retries prefer a DIFFERENT worker: skip
                            # entries this worker failed while other
                            # workers are connected to take them
                            k = 0
                            while k < len(redeal) and len(batch) < chunk:
                                if (active > 1
                                        and wid in failed_by.get(
                                            redeal[k], ())):
                                    k += 1
                                    continue
                                batch.append(redeal.pop(k))
                            while (next_idx < n_entries
                                   and len(batch) < chunk):
                                batch.append(next_idx)
                                next_idx += 1
                            if batch:
                                break
                            if len(done) >= n_entries:
                                # every entry has a result — retire.
                                # (Workers wait rather than retiring
                                # while entries are merely outstanding,
                                # so a holder's death can still be
                                # re-dealt to THIS worker.)
                                _send(conn, ("done",))
                                return
                            # wait for a death (re-deal) or completion
                            cv.wait(timeout=0.25)
                        mine.update(batch)
                    _send(conn, ("work", batch))
                elif msg[0] == "result":
                    name, outputs = msg[1], msg[2]
                    with cv:
                        results[name] = outputs
                        idx = order.get(name)
                        if idx is not None:
                            mine.discard(idx)
                            done.add(idx)
                        cv.notify_all()
                elif msg[0] == "error":
                    # reported failure: retry (different worker when
                    # possible) until max_attempts, then poison — done
                    # with NO output (rank 0 raises at the end)
                    name = msg[1]
                    with cv:
                        idx = order.get(name)
                        if idx is not None:
                            mine.discard(idx)
                            n_att = attempts.get(idx, 0) + 1
                            attempts[idx] = n_att
                            failed_by.setdefault(idx, set()).add(wid)
                            if n_att < max_attempts:
                                redeal.append(idx)
                            else:
                                done.add(idx)
                        cv.notify_all()
        except (ConnectionError, OSError):
            pass   # worker died; its outstanding work is re-dealt below
        finally:
            with cv:
                active -= 1
                if mine:
                    redeal.extend(sorted(mine))
                cv.notify_all()
            conn.close()

    threads: List[threading.Thread] = []
    last_worker_evt = _time.monotonic()
    while True:
        with cv:
            if len(done) >= n_entries and active == 0:
                break
            workerless = active == 0
        if workerless and _time.monotonic() - last_worker_evt > grace:
            break              # every worker gone; write what we have
        try:
            conn, _peer = srv.accept()
        except socket.timeout:
            with cv:
                if active > 0:
                    # workers alive: push the grace window forward so
                    # it measures time WITHOUT workers, not time since
                    # the last connect
                    last_worker_evt = _time.monotonic()
            continue
        except OSError:
            break
        with cv:
            active += 1
            wid_seq[0] += 1
        last_worker_evt = _time.monotonic()
        t = threading.Thread(target=serve, args=(conn, wid_seq[0]),
                             daemon=True)
        t.start()
        threads.append(t)
    srv.close()
    for t in threads:
        t.join(timeout=grace)


def run_multihost(in_base: str, db_base: str, out_base: str, rank: int,
                  size: int, addr: str, mode: str = "hhblits",
                  par_overrides: Optional[dict] = None, chunk: int = 1,
                  jax_coordinator: Optional[str] = None,
                  log=print) -> None:
    """One rank of a multi-host batch search.

    rank 0 = master + merged-output writer; ranks 1..size-1 = workers.
    All ranks must see the input/database paths; only rank 0 writes
    <out_base>_{hhr,m8[,a3m]}.ff{data,index} (already merged, input
    order preserved).
    """
    assert size >= 2, "multi-host needs a master and >=1 worker"
    if jax_coordinator:
        try:
            import jax

            jax.distributed.initialize(
                coordinator_address=jax_coordinator,
                num_processes=size, process_id=rank)
        except Exception as e:   # pragma: no cover - best effort
            log(f"jax.distributed unavailable ({e}); ranks run with "
                f"local devices only")

    from ..io.ffindex import FFindexDatabase, FFindexWriter

    src = FFindexDatabase(in_base + ".ffdata", in_base + ".ffindex")
    names = [e.name for e in src.entries]

    if rank == 0:
        results: Dict[str, Dict[str, bytes]] = {}
        order = {n: i for i, n in enumerate(names)}
        _master(addr, size, len(names), chunk, results, order)
        writers: Dict[str, FFindexWriter] = {}
        missing: List[str] = []
        try:
            for name in names:          # input order, like the merge
                outputs = results.get(name)
                if outputs is None:
                    log(f"WARNING: no result for entry {name} "
                        f"(failed twice or every worker died)")
                    missing.append(name)
                    continue
                for kind, payload in outputs.items():
                    if kind not in writers:
                        writers[kind] = FFindexWriter(
                            f"{out_base}_{kind}.ffdata",
                            f"{out_base}_{kind}.ffindex")
                    writers[kind].add(name, payload)
        finally:
            for w in writers.values():
                w.close()
        log(f"multihost {mode}: {len(results)}/{len(names)} entries "
            f"-> {out_base}_*")
        if missing:
            # partial output IS written (salvage), but the batch must
            # not look like a success — reference MPI dies loudly on a
            # failed rank, we fail loudly on failed entries
            raise RuntimeError(
                f"multihost {mode}: {len(missing)}/{len(names)} "
                f"entries missing from {out_base}_* "
                f"(first: {missing[:5]})")
        return

    # ---- worker rank ----
    from ..tools.batch import _run_one

    host, port = addr.rsplit(":", 1)
    conn = None
    # ranks start near-simultaneously; the master may bind late.  The
    # default window matches the master's worker-less grace so a slow
    # fleet can raise both with one env var (HHSUITE_TPU_MH_GRACE)
    deadline = max(120.0, _default_grace())
    import time

    t0 = time.monotonic()
    while conn is None:
        try:
            conn = socket.create_connection((host, int(port)),
                                            timeout=600)
        except OSError:
            if time.monotonic() - t0 > deadline:
                raise
            time.sleep(0.2)
    par_dict = dict(par_overrides or {})
    try:
        while True:
            _send(conn, ("next", rank))
            msg = _recv(conn)
            if msg[0] == "done":
                break
            for idx in msg[1]:
                name = names[idx]
                try:
                    text = src.read_text(name)
                    out = _run_one((name, text, db_base, par_dict,
                                    mode))
                except Exception as e:   # poison entry: report, go on
                    log(f"rank {rank}: entry {name} failed: "
                        f"{type(e).__name__}: {e}")
                    _send(conn, ("error", name, f"{e}"))
                    continue
                if out is not None:
                    _send(conn, ("result", out[0], out[1]))
    finally:
        conn.close()
