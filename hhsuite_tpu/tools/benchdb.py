"""Deterministic synthetic benchmark database.

Generates a protein-family-like database (one ancestor sequence, each
template a mutated/indel'd descendant, single-sequence a3m entries) and
builds the full <base>_{a3m,hhm,cs219} triplet with this package's own
tools — the same interchange formats the reference binaries read, so the
identical database can be timed under both engines.

Sizes default to a PDB70-like operating point scaled down for bench
runtime: ~L 250-350 templates, query L ~300.
"""

from __future__ import annotations

import os
from typing import List, Tuple

import numpy as np

AA = np.frombuffer(b"ACDEFGHIKLMNPQRSTVWY", dtype="S1").astype("U1")


def _mutate(rng, seq: List[str], sub_rate: float, indel_rate: float
            ) -> List[str]:
    out = []
    for c in seq:
        r = rng.random()
        if r < indel_rate / 2:
            continue                      # deletion
        if r < indel_rate:
            out.append(str(rng.choice(AA)))   # insertion
        if rng.random() < sub_rate:
            out.append(str(rng.choice(AA)))
        else:
            out.append(c)
    return out


def generate_family(n_templates: int = 512, L0: int = 300,
                    seed: int = 20260820) -> Tuple[str, List[Tuple[str, str]]]:
    """Returns (query_a3m_text, [(entry_name, a3m_text), ...])."""
    rng = np.random.default_rng(seed)
    ancestor = [str(c) for c in rng.choice(AA, size=L0)]
    query = "".join(_mutate(rng, ancestor, 0.25, 0.04))
    query_a3m = f">bench_query synthetic family root\n{query}\n"
    entries = []
    for k in range(n_templates):
        # mix of close homologs, remote homologs and decoys
        tier = k % 8
        if tier < 4:
            sub, ind = 0.30, 0.05
        elif tier < 7:
            sub, ind = 0.55, 0.08
        else:
            sub, ind = 1.00, 0.10      # effectively random
        t = "".join(_mutate(rng, ancestor, sub, ind))
        entries.append((f"b{k:04d}.a3m", f">b{k:04d} tier{tier}\n{t}\n"))
    return query_a3m, entries


def build_bench_db(base: str, n_templates: int = 512, L0: int = 300,
                   seed: int = 20260820, with_hhm: bool = True) -> str:
    """Build <base>_{a3m,hhm,cs219}.ff{data,index}; returns query a3m."""
    from ..apps import hhmake
    from ..constants import Parameters
    from ..cs.context_lib import (ContextLibrary, cstranslate_a3m,
                                  default_pc_engine)
    from ..io.ffindex import FFindexWriter

    query_a3m, entries = generate_family(n_templates, L0, seed)
    done_marker = base + ".done"
    if os.path.exists(done_marker):
        return query_a3m

    lib = ContextLibrary.default_cs219()
    pc = default_pc_engine()
    with FFindexWriter(base + "_a3m.ffdata", base + "_a3m.ffindex") as w:
        for name, text in entries:
            w.add(name, text.encode())
    with FFindexWriter(base + "_cs219.ffdata",
                       base + "_cs219.ffindex") as w:
        for name, text in entries:
            w.add(name, cstranslate_a3m(text, lib, pc_engine=pc,
                                        pc_admix=0.3, pc_ali=4.0))
    if with_hhm:
        par = Parameters()
        with FFindexWriter(base + "_hhm.ffdata",
                           base + "_hhm.ffindex") as w:
            for name, text in entries:
                w.add(name, hhmake(text, name, None,
                                   argv=["hhmake", "-i", name]))
    with open(done_marker, "w") as f:
        f.write("ok\n")
    return query_a3m
