"""Batch search driver: many queries from an input ffindex.

Equivalent of hhblits_omp (src/hhblits_omp.cpp:122-164): every entry of
the input ffindex is searched independently and the requested outputs
are collected into shared output ffindex databases keyed by entry name.

The reference parallelizes with one OpenMP thread per query and a
critical section around the shard writers; here queries fan out over a
process pool (the TPU device is a serialized resource, so on-device
Viterbi batches from different queries interleave through the single
JAX client in the parent when running single-process, which is the
default on TPU; CPU runs default to a pool).  hhblits_mpi's
multi-host variant maps to running this driver once per host on an
index shard and merging the shard outputs (ffmerge_splits semantics) —
see parallel/mesh.py for the device-mesh story.
"""

from __future__ import annotations

import os
import sys
from typing import Dict, List, Optional, Tuple


def _claim_path(queue_dir: str, name: str) -> str:
    return os.path.join(queue_dir, name.replace("/", "_") + ".claim")


def _claim(queue_dir: str, name: str,
           stale_sec: Optional[float] = None) -> bool:
    """Atomically claim one work item on a shared filesystem.

    The MPQ master/worker queue (lib/ffindex/src/mpq/mpq.h:25-60) deals
    [start,end) ranges over MPI; here each worker — any number of
    processes on any number of hosts sharing the queue directory —
    self-deals single entries with an O_CREAT|O_EXCL create, which is
    atomic on POSIX filesystems including NFS.  Exactly one worker
    cluster-wide wins each entry, and load balances dynamically because
    claims happen at execution time, not at partition time.

    Dead-worker recovery (MPQ has none — a crashed rank silently loses
    its range, SURVEY §5): workers write a `.claim.done` marker after
    the entry's outputs are produced.  A claim with no done marker
    whose mtime is older than ``stale_sec`` (default
    HHSUITE_TPU_QUEUE_STALE_SEC, 900 s) is presumed dead and stolen via
    an atomic rename — exactly one stealer wins the rename, then
    re-claims."""
    import errno
    import time

    path = _claim_path(queue_dir, name)
    try:
        fd = os.open(path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
    except OSError as e:
        if e.errno != errno.EEXIST:
            raise
        if os.path.exists(path + ".done"):
            return False
        if stale_sec is None:
            stale_sec = float(os.environ.get(
                "HHSUITE_TPU_QUEUE_STALE_SEC", "900"))
        try:
            age = time.time() - os.path.getmtime(path)
        except OSError:
            return False         # racing claimer just released/renamed
        if age < stale_sec:
            return False         # live claim in progress elsewhere
        try:
            os.rename(path, f"{path}.stale.{os.getpid()}"
                            f".{time.time_ns()}")
        except OSError:
            return False         # another stealer won the rename
        return _claim(queue_dir, name, stale_sec)
    os.close(fd)
    return True


def _claim_done(queue_dir: str, name: str) -> None:
    """Completion marker: this entry's outputs exist in some shard."""
    with open(_claim_path(queue_dir, name) + ".done", "w"):
        pass


def queue_fanout(queue_dir: str, names: List[str], compute,
                 merge, poll: float = 0.25, log=print) -> bool:
    """Cross-host map/merge over a shared-filesystem claim queue.

    TPU-native replacement for the reference's MPI database-build
    fan-outs (lib/ffindex/src/ffindex_apply_mpi.c:552,
    src/cs/cstranslate_mpi_app.h): any number of processes on any
    number of hosts sharing ``queue_dir`` call this with the SAME
    ``names`` list and a deterministic ``compute``; entries are dealt
    by atomic claims at execution time (dynamic load balancing), each
    winner writes the entry's payloads to
    ``<queue_dir>/payload/<safe>.<kind>`` (tmp + rename, so readers
    never see partial files), and exactly ONE process — the winner of
    the ``__merge__`` claim, taken only after every entry is done —
    runs ``merge(payload_dir)`` to assemble the final output in
    canonical ``names`` order.  The call is a barrier: every process
    returns only after the merge completed, and the output is
    byte-identical to a single-process run regardless of fleet size.

    Dead workers are recovered by the claim machinery's stale-steal
    (HHSUITE_TPU_QUEUE_STALE_SEC); a dead MERGE winner is likewise
    stolen and the merge re-run (merge must therefore be idempotent —
    rewriting its outputs whole, which ffindex writers do).

    ``compute(name) -> {kind: bytes}``; returns True if THIS process
    ran the merge."""
    import time

    pdir = os.path.join(queue_dir, "payload")
    os.makedirs(pdir, exist_ok=True)

    def _safe(name: str) -> str:
        return name.replace("/", "_")

    pending = list(names)
    while pending:
        progressed = False
        still = []
        for name in pending:
            if os.path.exists(_claim_path(queue_dir, name) + ".done"):
                continue
            if _claim(queue_dir, name):
                payloads = compute(name)
                for kind, data in payloads.items():
                    dst = os.path.join(pdir, f"{_safe(name)}.{kind}")
                    tmp = f"{dst}.tmp.{os.getpid()}"
                    with open(tmp, "wb") as f:
                        f.write(data)
                    os.replace(tmp, dst)
                _claim_done(queue_dir, name)
                progressed = True
            else:
                still.append(name)
        pending = still
        if pending and not progressed:
            time.sleep(poll)   # other workers hold live claims

    # ---- merge barrier: exactly one process assembles the output ----
    merged_here = False
    while not os.path.exists(_claim_path(queue_dir, "__merge__")
                             + ".done"):
        if _claim(queue_dir, "__merge__"):
            merge(pdir)
            _claim_done(queue_dir, "__merge__")
            merged_here = True
        else:
            time.sleep(poll)   # merge in progress elsewhere (or stale
            #                    -> the claim steal above re-deals it)
    return merged_here


def _run_one(args):
    (name, text, db_base, par_dict, mode) = args
    # jobs share one dict object on the thread-pool/serial paths;
    # the pops below must not leak across queries
    par_dict = dict(par_dict)
    queue_dir = par_dict.pop("__queue_dir", None)
    if queue_dir is not None and not _claim(queue_dir, name):
        return None
    ca3m_out = par_dict.pop("__ca3m_out", False)
    import jax

    if jax.devices()[0].platform == "cpu":
        jax.config.update("jax_platforms", "cpu")
    from ..apps import write_alignment_a3m
    from ..constants import Parameters
    from ..io.alignments import print_alignments
    from ..io.results import print_hit_list, print_m8
    from ..matrices import get_substitution_matrix
    from ..search.engine import get_database, run_hhsearch
    from ..search.hhblits import run_hhblits

    par = {"hhblits": Parameters.hhblits_defaults,
           "hhsearch": Parameters.hhsearch_defaults,
           "hhalign": Parameters.hhalign_defaults}[mode]()
    template_files = par_dict.pop("__template_files", None)
    for k, v in par_dict.items():
        setattr(par, k, v)
    mats = get_substitution_matrix(par.matrix)
    qali = None
    if mode == "hhalign":
        # hhalign_mpi (hhblits_mpi.cpp built with -DHHALIGN=1): every
        # input entry is aligned against the same -t template files
        from ..search.engine import run_hhalign

        template_texts = [(os.path.basename(t), open(t).read())
                          for t in (template_files or [])]
        q, hitlist, qali = run_hhalign(par, text, template_texts, name)
    elif mode == "hhblits":
        db = get_database(db_base)
        q, hitlist, qali = run_hhblits(par, text, db, name)
    else:
        db = get_database(db_base)
        q, hitlist = run_hhsearch(par, text, db, name)
    outputs: Dict[str, bytes] = {}
    hhr = (print_hit_list(q, hitlist, par.maxdbstrlen, par.z, par.Z,
                          par.p, par.E, ["hhblits_batch"])
           + print_alignments(q, hitlist, par, mats.S))
    outputs["hhr"] = hhr.encode()
    outputs["m8"] = print_m8(q, hitlist, par.nseqdis, par.p,
                             par.E).encode()
    if qali is not None:
        a3m_text = write_alignment_a3m(qali)
        if ca3m_out:
            # hhblits_ca3m semantics (src/hhblits_ca3m.cpp:80+): the
            # result MSA is compressed against the database's shared
            # _sequence ffindex; on compression failure the reference
            # warns and skips, here the plain a3m is written instead so
            # no result is silently lost.
            from ..io.ca3m import compress_a3m
            from ..io.ffindex import FFindexDatabase

            seq_db = FFindexDatabase(db_base + "_sequence.ffdata",
                                     db_base + "_sequence.ffindex")
            payload = compress_a3m(a3m_text, seq_db)
            if payload is None:
                print(f"WARNING: could not compress result MSA for "
                      f"{name}; storing plain a3m", file=sys.stderr)
                payload = a3m_text.encode()
            outputs["ca3m"] = payload
        else:
            outputs["a3m"] = a3m_text.encode()
    return name, outputs


def run_batch(in_base: str, db_base: str, out_base: str,
              mode: str = "hhblits", par_overrides: Optional[dict] = None,
              threads: int = 0, log=print, ca3m: bool = False,
              in_ca3m: bool = False, shard: Optional[str] = None,
              queue_dir: Optional[str] = None) -> None:
    """Search every entry of <in_base>.ff{data,index} against db_base and
    write <out_base>_{hhr,m8[,a3m|ca3m]}.ff{data,index} shards.

    in_ca3m=True is the hhblits_ca3m driver (src/hhblits_ca3m.cpp:
    120-240): queries come from the compressed <in_base>_ca3m database
    and each entry is expanded to a3m text on the fly through the
    companion <in_base>_{sequence,header} ffindexes.  ca3m=True
    additionally ca3m-compresses RESULT MSAs against the search
    database's _sequence ffindex (an extension; the reference driver
    writes plain outputs)."""
    from concurrent.futures import ProcessPoolExecutor

    from ..io.ffindex import FFindexDatabase, FFindexWriter

    par_dict = dict(par_overrides or {})
    if ca3m:
        par_dict["__ca3m_out"] = True
    if queue_dir:
        # multi-host dynamic work dealing (the MPQ equivalent): every
        # participating host runs this driver with the same -queue dir
        # (shared filesystem) and a distinct -o shard; workers claim
        # entries at execution time, so faster hosts take more work.
        # Merge the shards afterwards with -merge.
        os.makedirs(queue_dir, exist_ok=True)
        par_dict["__queue_dir"] = queue_dir
    if in_ca3m:
        from ..io.ca3m import extract_a3m

        src = FFindexDatabase(in_base + "_ca3m.ffdata",
                              in_base + "_ca3m.ffindex")
        seq_db = FFindexDatabase(in_base + "_sequence.ffdata",
                                 in_base + "_sequence.ffindex")
        hdr_db = FFindexDatabase(in_base + "_header.ffdata",
                                 in_base + "_header.ffindex")
        jobs = [(e.name, extract_a3m(src.read_bytes(e), seq_db, hdr_db),
                 db_base, par_dict, mode) for e in src.entries]
    else:
        src = FFindexDatabase(in_base + ".ffdata", in_base + ".ffindex")
        jobs = [(e.name, src.read_text(e), db_base, par_dict, mode)
                for e in src.entries]

    if shard:
        # static sharding "-shard k/N": this host takes every Nth entry
        # (the manual alternative when no shared filesystem exists)
        k, n = (int(x) for x in shard.split("/"))
        jobs = jobs[k % n::n]

    import jax

    from ..parallel.mesh import get_mesh

    on_tpu = any(d.platform != "cpu" for d in jax.devices())
    if on_tpu or get_mesh() is not None:
        # the chip is a serialized resource, but host-side phases
        # (template HMM prep, prefilter packing, MSA merge, writers)
        # are not: a small thread pool overlaps one query's host work
        # with another's device sweep — jax dispatch and numpy release
        # the GIL, and each job owns its HHDatabase/Parameters, so the
        # queries only share the (thread-safe) JAX client.  This is the
        # hhblits_omp shape (src/hhblits_omp.cpp:122-164) with the
        # device standing in for the shared memory bus.
        from concurrent.futures import ThreadPoolExecutor

        from ..parallel.mesh import (_SingleDeviceMesh, get_mesh,
                                     split_mesh, use_mesh)

        nthreads = threads or 2
        mesh = get_mesh()
        if mesh is not None and nthreads > 1 and len(jobs) > 1:
            # query parallelism over the device mesh (the "q" axis):
            # partition the devices into one sub-mesh per worker thread,
            # so concurrent queries run on disjoint devices while each
            # still shards its template batch over its own sub-mesh.
            import queue as _queue

            subs = split_mesh(mesh, nthreads)
            free: "_queue.Queue" = _queue.Queue()
            for s in subs:
                free.put(s)

            def _worker(job):
                sub = free.get()     # exclusive sub-mesh per live job
                try:
                    if isinstance(sub, _SingleDeviceMesh) \
                            and sub.device is not None:
                        with use_mesh(sub), jax.default_device(sub.device):
                            return _run_one(job)
                    with use_mesh(sub):
                        return _run_one(job)
                finally:
                    free.put(sub)

            with ThreadPoolExecutor(max_workers=len(subs)) as ex:
                results = list(ex.map(_worker, jobs))
        elif nthreads > 1 and len(jobs) > 1:
            with ThreadPoolExecutor(max_workers=nthreads) as ex:
                results = list(ex.map(_run_one, jobs))
        else:
            results = [_run_one(j) for j in jobs]
    else:
        nproc = threads or min(os.cpu_count() or 1, 8)
        if nproc > 1 and len(jobs) > 1:
            with ProcessPoolExecutor(max_workers=nproc) as ex:
                results = list(ex.map(_run_one, jobs))
        else:
            results = [_run_one(j) for j in jobs]

    results = [r for r in results if r is not None]   # lost claim races
    writers: Dict[str, FFindexWriter] = {}
    try:
        for name, outputs in results:
            for kind, payload in outputs.items():
                if kind not in writers:
                    writers[kind] = FFindexWriter(
                        f"{out_base}_{kind}.ffdata",
                        f"{out_base}_{kind}.ffindex")
                writers[kind].add(name, payload)
    finally:
        for w in writers.values():
            w.close()
    if queue_dir:
        # completion markers AFTER the shard files are durably written:
        # a claim without one is a dead worker's and will be re-dealt
        # (stale-claim steal in _claim)
        for name, _outputs in results:
            _claim_done(queue_dir, name)
    log(f"Batch {mode}: {len(results)} queries -> {out_base}_*")


def merge_shards(out_base: str, shard_bases: List[str],
                 kinds=("hhr", "m8", "a3m"),
                 expected: Optional[List[str]] = None,
                 log=print) -> List[str]:
    """ffmerge_splits semantics (src/hhblits_mpi.cpp:83-93): concatenate
    per-rank output shards into one database per kind.

    With ``expected`` (the input entry names), audits the merged set:
    entries present in the input but missing from every shard — e.g.
    because a worker died mid-entry — are reported and returned so the
    caller can re-run the batch over the same queue dir (the stale
    claim is re-dealt).  The reference's MPQ merge is blind to lost
    ranges (SURVEY §5)."""
    from ..io.ffindex import FFindexDatabase, FFindexWriter

    seen: set = set()
    for kind in kinds:
        shards = []
        for base in shard_bases:
            data = f"{base}_{kind}.ffdata"
            index = f"{base}_{kind}.ffindex"
            if os.path.exists(data) and os.path.exists(index):
                shards.append(FFindexDatabase(data, index))
        if not shards:
            continue
        with FFindexWriter(f"{out_base}_{kind}.ffdata",
                           f"{out_base}_{kind}.ffindex") as w:
            for db in shards:
                for name, payload in db.items():
                    w.add(name, payload)
                    seen.add(name)
    missing: List[str] = []
    if expected is not None:
        missing = [n for n in expected if n not in seen]
        if missing:
            head = ", ".join(missing[:5])
            log(f"WARNING: merge is missing {len(missing)} input "
                f"entries (e.g. {head}) — a worker likely died; re-run "
                f"the batch with the same -queue dir to re-deal them, "
                f"then merge again")
    return missing


def main(argv: List[str]) -> int:
    in_base = db_base = out_base = None
    mode = "hhblits"
    threads = 0
    in_ca3m = False
    shard = queue_dir = None
    merge_bases: Optional[List[str]] = None
    par_overrides: dict = {"nocontxt": True}
    i = 0
    while i < len(argv):
        a = argv[i]
        if a == "-i":
            i += 1
            in_base = argv[i]
        elif a == "-d":
            i += 1
            db_base = argv[i]
        elif a == "-o":
            i += 1
            out_base = argv[i]
        elif a == "-n":
            i += 1
            par_overrides["num_rounds"] = int(argv[i])
        elif a == "-cpu":
            i += 1
            threads = int(argv[i])
        elif a == "-hhsearch":
            mode = "hhsearch"
        elif a == "-hhalign":
            mode = "hhalign"
        elif a == "-t":
            i += 1
            par_overrides.setdefault("__template_files", []).append(argv[i])
        elif a == "-in_ca3m":
            in_ca3m = True
        elif a == "-Oca3m":
            par_overrides["__ca3m_out"] = True
        elif a == "-shard":
            i += 1
            shard = argv[i]
        elif a == "-mesh":
            i += 1
            from ..parallel.mesh import make_mesh, set_mesh
            set_mesh(make_mesh(int(argv[i])))
        elif a == "-queue":
            i += 1
            queue_dir = argv[i]
        elif a == "-rank":
            i += 1
            par_overrides["__mh_rank"] = int(argv[i])
        elif a == "-size":
            i += 1
            par_overrides["__mh_size"] = int(argv[i])
        elif a == "-addr":
            i += 1
            par_overrides["__mh_addr"] = argv[i]
        elif a == "-jax_coordinator":
            i += 1
            par_overrides["__mh_jaxcoord"] = argv[i]
        elif a == "-merge":
            i += 1
            merge_bases = argv[i].split(",")
        i += 1
    if merge_bases is not None:
        # final rank-0 step of a multi-host run (ffmerge_splits,
        # src/hhblits_mpi.cpp:83-93,210-219); with -i given, audit the
        # merged entry set against the input index
        if not out_base:
            print("hhblits_batch -merge <shard1,shard2,..> -o <out base>",
                  file=sys.stderr)
            return 4
        expected = None
        if in_base:
            from ..io.ffindex import FFindexDatabase

            suffix = "_ca3m" if in_ca3m else ""
            expected = [e.name for e in FFindexDatabase(
                f"{in_base}{suffix}.ffdata",
                f"{in_base}{suffix}.ffindex").entries]
        missing = merge_shards(out_base, merge_bases, expected=expected)
        return 1 if missing else 0
    if "__mh_rank" in par_overrides:
        # TCP process-group lane (hhblits_mpi semantics, MPQ over
        # sockets + in-band merge): every rank runs this same command
        # with its own -rank; see parallel/multihost.py
        from ..parallel.multihost import run_multihost

        rank = par_overrides.pop("__mh_rank")
        mh_size = par_overrides.pop("__mh_size", 2)
        mh_addr = par_overrides.pop("__mh_addr", "127.0.0.1:45917")
        jaxcoord = par_overrides.pop("__mh_jaxcoord", None)
        if not in_base or not db_base or not out_base:
            print("hhblits_batch -rank R -size N -addr host:port -i "
                  "<queries> -d <db> -o <out>", file=sys.stderr)
            return 4
        try:
            run_multihost(in_base, db_base, out_base, rank, mh_size,
                          mh_addr, mode, par_overrides,
                          jax_coordinator=jaxcoord)
        except RuntimeError as e:
            # partial output was written; exit nonzero so callers can't
            # mistake it for success (ADVICE r4)
            print(f"ERROR: {e}", file=sys.stderr)
            return 1
        return 0
    if mode == "hhalign" and in_base and out_base:
        db_base = db_base or "-"          # hhalign needs no database
    if not in_base or not db_base or not out_base:
        print("hhblits_batch -i <query ffindex base> -d <db base> "
              "-o <out base> [-n rounds] [-cpu N] [-hhsearch] "
              "[-shard k/N] [-queue <shared dir>] "
              "[-rank R -size N -addr host:port "
              "[-jax_coordinator host:port]] "
              "[-merge shard1,shard2,.. -o out [-i in]]",
              file=sys.stderr)
        return 4
    run_batch(in_base, db_base, out_base, mode, par_overrides, threads,
              in_ca3m=in_ca3m, shard=shard, queue_dir=queue_dir)
    return 0
