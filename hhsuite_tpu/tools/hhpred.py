"""hhpred: end-to-end structure-prediction pipeline wrapper
(equivalent of scripts/hhpred/hhpred.pl).

Stages (hhpred.pl:100-200): query FASTA/A3M -> hhblits query MSA ->
addss secondary-structure annotation -> hhsearch against a template
database -> template selection -> hhmakemodel alignment (PIR) ->
MODELLER.  The first four stages run natively in this package; MODELLER
is an external licensed program and is invoked only when found on
$PATH (otherwise the pipeline stops after writing the PIR alignment and
prints the MODELLER command to run).

Template selection here is top-N by probability with a greedy
query-coverage pass — a documented simplification of the reference's
selectTemplatesHeuristic.pm.
"""

from __future__ import annotations

import os
import shutil
import subprocess
import sys
from typing import List, Optional


def _select_templates(results, max_templates: int, min_prob: float):
    """Greedy: rank by probability; keep a hit if it adds >= 10 new
    query columns or scores >= min_prob (selectTemplatesHeuristic
    simplified)."""
    ranked = sorted(results, key=lambda r: -(r.probability or 0.0))
    covered = set()
    chosen = []
    for r in ranked:
        if len(chosen) >= max_templates:
            break
        if (r.probability or 0.0) < min_prob and chosen:
            break
        span = set(range(r.start[0], r.end[0] + 1))
        if len(span - covered) >= 10 or not chosen:
            chosen.append(r)
            covered |= span
    return chosen


def hhpred(argv: List[str]) -> int:
    infile = outbase = None
    db = None
    pdbdir = None
    rounds = 3
    max_templates = 4
    min_prob = 50.0
    horiz = None
    i = 0
    while i < len(argv):
        a = argv[i]
        if a == "-i":
            i += 1
            infile = argv[i]
        elif a == "-o":
            i += 1
            outbase = argv[i]
        elif a == "-d":
            i += 1
            db = argv[i]
        elif a == "-pdbdir":
            i += 1
            pdbdir = argv[i]
        elif a == "-n":
            i += 1
            rounds = int(argv[i])
        elif a == "-mult":
            i += 1
            max_templates = int(argv[i])
        elif a == "-horiz":
            i += 1
            horiz = argv[i]
        i += 1
    if not infile or not outbase or not db:
        print("hhpred -i <query.fasta|a3m> -o <outbase> -d <template db "
              "base> [-pdbdir <dir with template cif/pdb>] [-n rounds] "
              "[-mult N] [-horiz psipred.horiz]", file=sys.stderr)
        return 4

    from ..cli.main import cmd_hhblits, cmd_hhsearch
    from .addss import addss
    from .hhmakemodel import main as hhmakemodel_main

    a3m = outbase + ".a3m"
    with open(infile) as f:
        text = f.read()
    is_a3m = infile.endswith(".a3m") or text.count(">") > 1

    # 1. query MSA (hhblits; skipped when an a3m is already given)
    if is_a3m:
        shutil.copyfile(infile, a3m)
    else:
        rc = cmd_hhblits(["-i", infile, "-d", db, "-oa3m", a3m,
                          "-n", str(rounds), "-mact", "0.35"])
        if rc != 0:
            print("ERROR: hhblits stage failed", file=sys.stderr)
            return rc

    # 2. secondary structure (gated on PSIPRED availability)
    args = ["-i", a3m]
    if horiz:
        args += ["-horiz", horiz]
    rc = addss(args)
    if rc != 0:
        print("WARNING: addss skipped (PSIPRED unavailable); continuing "
              "without ss_pred scoring", file=sys.stderr)

    # 3. search the template database
    hhr = outbase + ".hhr"
    rc = cmd_hhsearch(["-i", a3m, "-d", db, "-o", hhr,
                       "-mact", "0.05"])
    if rc != 0:
        print("ERROR: hhsearch stage failed", file=sys.stderr)
        return rc

    # 4. template selection
    from ..io.hhr import read_result

    results = read_result(hhr)
    if not results:
        print("ERROR: no templates found", file=sys.stderr)
        return 1
    chosen = _select_templates(results, max_templates, min_prob)
    ranks = [results.index(c) + 1 for c in chosen]
    print(f"Selected templates: "
          + ", ".join(c.template_id for c in chosen), file=sys.stderr)

    # 5. PIR alignment for MODELLER
    pir = outbase + ".pir"
    args = ["-i", hhr, "-pir", pir]
    if ranks:
        args += ["-m"] + [str(r) for r in ranks]
    if pdbdir:
        args += ["-cifs", pdbdir, "-ocifs", os.path.dirname(outbase)
                 or "."]
    rc = hhmakemodel_main(args)
    if rc != 0:
        print("ERROR: hhmakemodel stage failed", file=sys.stderr)
        return rc

    # 6. MODELLER (external, licensed)
    mod = None
    for cand in ("mod10.4", "mod10.3", "mod10.2", "mod10.1", "mod9.25",
                 "modeller"):
        if shutil.which(cand):
            mod = cand
            break
    if mod is None:
        print(f"PIR alignment written to {pir}.\n"
              f"MODELLER not found on $PATH — to build the model, "
              f"install MODELLER and run its automodel on {pir}.",
              file=sys.stderr)
        return 0
    script = outbase + "_modeller.py"
    knowns = ", ".join(f"'{c.template_id}'" for c in chosen)
    with open(script, "w") as f:
        f.write(
            "from modeller import *\n"
            "from modeller.automodel import *\n"
            "env = environ()\n"
            f"env.io.atom_files_directory = ['.', '{pdbdir or '.'}']\n"
            f"a = automodel(env, alnfile='{pir}',\n"
            f"              knowns=[{knowns}],\n"
            f"              sequence='{results[0].query_id}')\n"
            "a.starting_model = a.ending_model = 1\n"
            "a.make()\n")
    rc = subprocess.call([mod, script])
    return rc
