"""Generate the multi-entry database fixtures + reference goldens.

Run on a machine with the reference hh-suite built (see REF_BUILD):

    python tests/make_multidb_fixtures.py

Produces in tests/fixtures/:
  multi_{a3m,hhm,cs219}.ff{data,index}   -- 26-entry database, built with
                                            the reference test.sh recipe
                                            (data/test.sh:12-33)
  golden_multi_search.{hhr,blasttab}     -- reference hhsearch output
  golden_multi_n1.blasttab               -- reference hhblits -n 1
  golden_multi_n2.{hhr,m8,a3m}           -- reference hhblits -n 2
                                            (exercises old-hit rescoring,
                                            hhblits.cpp:911-968)
  golden_multi_n2_rola.m8                -- hhblits -n 2 -realign_old_hits

The database is deterministic, derived only from the reference's
data/query.a3m (PF02826 family): 6 multi-sequence sub-MSAs (strong
hits), 12 single-sequence entries of family members (weak/medium hits
with varied lengths), and 8 shuffled decoys (negatives).  This makes the
prefilter funnel cuts, the early-stop block loop, and the running top-K
cutoff non-degenerate, unlike the single-entry DB.
"""

import os
import random
import shutil
import subprocess
import sys

FIX = os.path.join(os.path.dirname(__file__), "fixtures")
REF_BUILD = os.environ.get("HH_REF_BUILD", "/tmp/refbuild")
REF_DATA = os.environ.get("HH_REF_DATA", "/root/reference/data")
BIN = os.path.join(REF_BUILD, "src")
FFBIN = os.path.join(REF_BUILD, "lib", "ffindex", "src")


def read_a3m(path):
    """Returns list of (header, seq) skipping the leading '#' line."""
    entries = []
    header, parts = None, []
    for line in open(path):
        line = line.rstrip("\n")
        if line.startswith("#") and header is None and not entries:
            continue
        if line.startswith(">"):
            if header is not None:
                entries.append((header, "".join(parts)))
            header, parts = line, []
        else:
            parts.append(line)
    if header is not None:
        entries.append((header, "".join(parts)))
    return entries


def make_entries(query_a3m):
    seqs = read_a3m(query_a3m)
    assert len(seqs) >= 50, len(seqs)
    rng = random.Random(20260820)
    out = {}

    # 6 sub-MSAs: disjoint-ish slices, some without the query master
    slices = [(0, 9), (9, 17), (17, 25), (25, 33), (33, 42), (42, 51)]
    for k, (a, b) in enumerate(slices, 1):
        group = seqs[a:b]
        out[f"t{k:02d}.a3m"] = "".join(f"{h}\n{s}\n" for h, s in group)

    # 12 single-sequence entries (ungapped member sequences)
    for k, idx in enumerate(range(5, 53, 4), 1):
        h, s = seqs[idx]
        plain = s.replace("-", "").replace(".", "").upper()
        out[f"s{k:02d}.a3m"] = f">{h[1:].split()[0]}_single\n{plain}\n"

    # 8 shuffled decoys (fixed seed -> deterministic)
    for k, idx in enumerate(range(7, 39, 4), 1):
        h, s = seqs[idx]
        plain = list(s.replace("-", "").replace(".", "").upper())
        rng.shuffle(plain)
        out[f"d{k:02d}.a3m"] = f">decoy_{k:02d}\n{''.join(plain)}\n"
    return out


def sh(cmd, cwd):
    subprocess.run(cmd, cwd=cwd, check=True,
                   stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)


def apply_tool(cwd, src_base, dst_base, tool_argv):
    sh([os.path.join(FFBIN, "ffindex_apply"),
        f"{src_base}.ffdata", f"{src_base}.ffindex",
        "-d", f"{dst_base}.ffdata", "-i", f"{dst_base}.ffindex",
        "--"] + tool_argv, cwd)


def main():
    work = "/tmp/multidb_fixture"
    shutil.rmtree(work, ignore_errors=True)
    os.makedirs(work)
    entries = make_entries(os.path.join(REF_DATA, "query.a3m"))
    names = sorted(entries)
    for name, text in entries.items():
        with open(os.path.join(work, name), "w") as f:
            f.write(text)

    # data/test.sh:12-33 recipe
    sh([os.path.join(FFBIN, "ffindex_build"), "-s",
        "multi_in.ffdata", "multi_in.ffindex"] + names, work)
    # -nocontxt: this reference build embeds an empty context_data.crf
    # resource (absent from the checkout), so the default context
    # pseudocount engine aborts; all goldens therefore use -nocontxt
    apply_tool(work, "multi_in", "multi_a3m_cons",
               [os.path.join(BIN, "hhconsensus"), "-i", "stdin",
                "-oa3m", "stdout", "-M", "a3m", "-nocontxt", "-v", "0"])
    apply_tool(work, "multi_a3m_cons", "multi_a3m",
               [os.path.join(BIN, "hhfilter"), "-i", "stdin", "-o",
                "stdout", "-diff", "1000", "-v", "0"])
    apply_tool(work, "multi_a3m", "multi_hhm",
               [os.path.join(BIN, "hhmake"), "-i", "stdin", "-o",
                "stdout", "-nocontxt", "-v", "0"])
    # cs219 from the raw input MSAs, exactly like data/test.sh:30-33
    # (which translates the `single` build, not `single_a3m`)
    sh([os.path.join(BIN, "cstranslate"), "-i", "multi_in", "-o",
        "multi_cs219", "-b", "-x", "0.3", "-c", "4", "-I", "a3m", "-f"],
       work)

    shutil.copy(os.path.join(REF_DATA, "query.a3m"),
                os.path.join(work, "query.a3m"))

    base = ["-i", "query.a3m", "-d", "multi", "-nocontxt", "-v", "1"]
    sh([os.path.join(BIN, "hhsearch")] + base
       + ["-o", "search.hhr", "-blasttab", "search.m8"], work)
    sh([os.path.join(BIN, "hhblits")] + base
       + ["-n", "1", "-o", "n1.hhr", "-blasttab", "n1.m8"], work)
    # -n 2 goldens run with -norealign -premerge 0: the reference's
    # PosteriorDecoder writes cell-off band masks into the shared
    # per-thread ViterbiMatrix objects, and AllocateBacktraceMatrix
    # (hhviterbimatrix.cpp:28-48) returns early when the buffer still
    # fits, keeping those stale bits — so after any round-1 realign or
    # premerge, the FIRST round-2 Viterbi batch on each poisoned thread
    # runs AlignWithCellOff against a leftover ±40 band
    # (hhviterbi.cpp:184-188 picks the variant via the sticky hasCellOff
    # flag, hhviterbimatrix-inl.h:27-30).  Which batch that hits depends
    # on OpenMP scheduling; alignments outside the stale band are
    # silently lost (e.g. d01's best alignment in this fixture).  Our
    # engine builds fresh masks per batch and does not replicate this
    # bug, so the oracle must avoid the poisoned configuration.
    sh([os.path.join(BIN, "hhblits")] + base
       + ["-n", "2", "-norealign", "-premerge", "0",
          "-o", "n2.hhr", "-blasttab", "n2.m8", "-oa3m", "n2.a3m"], work)
    sh([os.path.join(BIN, "hhblits")] + base
       + ["-n", "2", "-norealign", "-premerge", "0",
          "-realign_old_hits", "-blasttab", "rola.m8"], work)

    for suffix in ("a3m", "hhm", "cs219"):
        for ext in ("ffdata", "ffindex"):
            shutil.copy(os.path.join(work, f"multi_{suffix}.{ext}"),
                        os.path.join(FIX, f"multi_{suffix}.{ext}"))
    for src, dst in [("search.hhr", "golden_multi_search.hhr"),
                     ("search.m8", "golden_multi_search.blasttab"),
                     ("n1.m8", "golden_multi_n1.blasttab"),
                     ("n2.hhr", "golden_multi_n2.hhr"),
                     ("n2.m8", "golden_multi_n2.m8"),
                     ("n2.a3m", "golden_multi_n2.a3m"),
                     ("rola.m8", "golden_multi_n2_rola.m8")]:
        shutil.copy(os.path.join(work, src), os.path.join(FIX, dst))
    print("fixtures written to", FIX)


if __name__ == "__main__":
    sys.exit(main())
