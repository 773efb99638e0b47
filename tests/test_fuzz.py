"""Seeded random stress pass (the sanitizer-tier analog).

The reference runs its regression under ASan/MSan/UBSan builds
(azure-pipelines.yml:33-38, cmake/Find*San.cmake) to shake out
memory/UB bugs in the C++ core.  The Python/JAX core's failure modes
are different — shape errors, off-by-one column projections, silent
data truncation — so this file drives the parsers, the MSA compressor,
the ffindex/ca3m containers, and the format converters over a few
hundred randomized inputs (fixed seeds, fully reproducible) and checks
round-trip invariants instead of byte goldens.
"""

import os
import string

import numpy as np
import pytest

from hhsuite_tpu.core.alignment import Alignment
from hhsuite_tpu.apps import write_alignment_a3m

AA = "ACDEFGHIKLMNPQRSTVWY"


def _random_a3m(rng: np.random.RandomState, nseq=None, ncols=None,
                desc=True) -> str:
    """A random but well-formed a3m: first sequence all-match; others
    with gaps and lowercase inserts."""
    nseq = nseq or rng.randint(2, 12)
    ncols = ncols or rng.randint(10, 60)
    d = " query" if desc else ""
    lines = []
    q = "".join(rng.choice(list(AA), ncols))
    lines += [">q0" + d, q]
    for k in range(1, nseq):
        chars = []
        for c in q:
            r = rng.rand()
            if r < 0.15:
                chars.append("-")
            elif r < 0.25:
                chars.append(rng.choice(list(AA)))
            else:
                chars.append(c)
            if rng.rand() < 0.08:
                chars.append("".join(
                    rng.choice(list(AA.lower()), rng.randint(1, 4))))
        lines += [f">s{k}" + (" hom" if desc else ""), "".join(chars)]
    return "\n".join(lines) + "\n"


@pytest.mark.parametrize("seed", range(25))
def test_a3m_roundtrip_through_alignment(seed):
    """a3m text -> Alignment -> compress -> a3m writer -> re-read is a
    fixed point (match columns and sequence count preserved)."""
    rng = np.random.RandomState(seed)
    text = _random_a3m(rng)
    ali = Alignment.from_a3m_text(text, infile="fuzz")
    ali.compress(M=1)
    out = write_alignment_a3m(ali)
    ali2 = Alignment.from_a3m_text(out, infile="fuzz2")
    ali2.compress(M=1)
    assert ali2.L == ali.L
    assert ali2.N_in == ali.N_in
    out2 = write_alignment_a3m(ali2)
    assert out2 == out


@pytest.mark.parametrize("seed", range(10))
def test_ffindex_roundtrip(seed, tmp_path):
    from hhsuite_tpu.io.ffindex import FFindexDatabase, build_ffindex

    rng = np.random.RandomState(1000 + seed)
    names = []
    blobs = {}
    for k in range(rng.randint(1, 30)):
        name = "".join(rng.choice(list(string.ascii_letters),
                                  rng.randint(1, 20)))
        if name in blobs:
            continue
        names.append(name)
        blobs[name] = bytes(rng.randint(0, 256, rng.randint(0, 500),
                                        dtype=np.uint8))
    data = str(tmp_path / "f.ffdata")
    index = str(tmp_path / "f.ffindex")
    build_ffindex(data, index, [(n, blobs[n]) for n in names])
    db = FFindexDatabase(data, index)
    assert len(db) == len(names)
    for n in names:
        got = db.read_bytes(n)
        # entries are NUL-terminated on disk; readers strip the NUL
        assert got.rstrip(b"\x00") == blobs[n].rstrip(b"\x00")


@pytest.mark.parametrize("seed", range(10))
def test_ca3m_roundtrip(seed, tmp_path):
    """compress_a3m -> extract_a3m reproduces each aligned sequence."""
    from hhsuite_tpu.io.ca3m import compress_a3m, extract_a3m
    from hhsuite_tpu.io.ffindex import FFindexDatabase, build_ffindex

    rng = np.random.RandomState(2000 + seed)
    text = _random_a3m(rng)
    ali = Alignment.from_a3m_text(text, infile="fuzz")
    ali.compress(M=1)
    a3m = write_alignment_a3m(ali)
    # a ca3m entry starts with a plaintext consensus block
    # (a3m_compress.cpp:356-377, SURVEY A.3); reuse the query row
    qrow = a3m.split("\n")[1]
    a3m = f">fuzzdb_consensus\n{qrow.upper().replace('-', '')}\n" + a3m

    # build the _sequence/_header side databases from the full
    # (insert-expanded) sequences
    pairs = []
    headers = []
    for ln in a3m.splitlines():
        if ln.startswith(">"):
            headers.append(ln)
        elif headers:
            nm = headers[-1][1:].split()[0]
            full = ln.replace("-", "").upper()
            pairs.append((nm, (full + "\n").encode()))
    build_ffindex(str(tmp_path / "s.ffdata"), str(tmp_path / "s.ffindex"),
                  pairs)
    build_ffindex(str(tmp_path / "h.ffdata"), str(tmp_path / "h.ffindex"),
                  [(nm, (h + "\n").encode())
                   for h, (nm, _) in zip(headers, pairs)])
    seq_db = FFindexDatabase(str(tmp_path / "s.ffdata"),
                             str(tmp_path / "s.ffindex"))
    hdr_db = FFindexDatabase(str(tmp_path / "h.ffdata"),
                             str(tmp_path / "h.ffindex"))

    blob = compress_a3m(a3m, seq_db)
    assert blob is not None
    back = extract_a3m(blob, seq_db, hdr_db)
    orig_seqs = {}
    nm = None
    for ln in a3m.splitlines():
        if ln.startswith(">"):
            nm = ln[1:].split()[0]
        elif nm:
            orig_seqs[nm] = ln
    nm = None
    n_checked = 0
    for ln in back.splitlines():
        if ln.startswith(">"):
            nm = ln[1:].split()[0]
        elif not ln:
            continue   # reference extractor emits a blank line per member
        elif nm and nm in orig_seqs:
            assert ln == orig_seqs[nm], f"seq {nm} seed {seed}"
            n_checked += 1
    assert n_checked >= len(orig_seqs) - 1   # consensus line may differ


@pytest.mark.parametrize("seed", range(15))
def test_reformat_fas_a3m_roundtrip(seed):
    from hhsuite_tpu.tools.reformat import read_msa, reformat

    rng = np.random.RandomState(3000 + seed)
    nseq, ncols = rng.randint(2, 10), rng.randint(5, 50)
    rows = []
    for k in range(nseq):
        rows.append("".join(
            rng.choice(list(AA + "-"), ncols)))
    # column 0 residue-in-first so -M first keeps all rows aligned
    rows[0] = "A" + rows[0][1:]
    fas = "".join(f">s{k}\n{r}\n" for k, r in enumerate(rows))
    a3m = reformat(fas, "fas", "a3m")
    back = reformat(a3m, "a3m", "fas")
    orig = read_msa(fas, "fas")
    got = read_msa(back, "fas")
    assert len(got) == len(orig)
    # match columns (residue in first row) survive the round trip
    match_cols = [i for i, c in enumerate(rows[0]) if c != "-"]
    for (onm, oseq), (gnm, gseq) in zip(orig, got):
        assert onm == gnm
        o_m = "".join(oseq[i] for i in match_cols).upper()
        g_m = "".join(c for c in gseq if c not in ".").upper()
        # every original match-column residue appears in order
        it = iter(g_m)
        assert all(c in it for c in o_m.replace("-", ""))


@pytest.mark.parametrize("seed", range(8))
def test_hhm_roundtrip_random_msa(seed):
    """random MSA -> profile -> HHM text -> parse: emissions and
    transitions survive the HMMSCALE=1000 quantization."""
    from hhsuite_tpu.constants import Parameters
    from hhsuite_tpu.core.hmm import HMM
    from hhsuite_tpu.core.profile import frequencies_and_transitions
    from hhsuite_tpu.io.hhm import read_hhm, write_hhm
    from hhsuite_tpu.matrices import get_substitution_matrix

    rng = np.random.RandomState(4000 + seed)
    # descriptions off: the HHM SEQ reader truncates names at the
    # first whitespace exactly like the reference (hhhmm.cpp:377
    # strcut), so they would not round-trip
    text = _random_a3m(rng, nseq=rng.randint(3, 8),
                       ncols=rng.randint(15, 40), desc=False)
    par = Parameters()
    mats = get_substitution_matrix(par.matrix)
    ali = Alignment.from_a3m_text(text, infile="fuzz")
    ali.compress(M=1)
    ali.N_filtered = ali.filter(90, mats.S, 0, 0, -20.0, 100)
    q = HMM()
    frequencies_and_transitions(ali, q, 0, 0, 0, 0, mats.pb, mats.Sim)
    hhm = write_hhm(q, mats.pb)
    q2 = read_hhm(hhm)
    assert q2.L == q.L
    hhm2 = write_hhm(q2, mats.pb)
    strip = lambda t: [ln for ln in t.splitlines()
                       if not ln.startswith(("DATE", "FILT"))]
    assert strip(hhm2) == strip(hhm)


@pytest.mark.slow
@pytest.mark.parametrize("seed", range(4))
def test_full_pipeline_fuzz(seed, tmp_path):
    """End-to-end property fuzz (the full-regression-under-sanitizer
    analog, SURVEY §5): random small database + random query through
    run_hhsearch AND a prefiltered run_hhblits round; no crash, and the
    hitlist obeys its invariants — ascending (score_sort, file) order,
    in-bounds alignment coordinates, step arrays consistent with
    nsteps, renderers produce parseable output."""
    from hhsuite_tpu.constants import Parameters
    from hhsuite_tpu.cs.context_lib import cstranslate_a3m
    from hhsuite_tpu.io.ffindex import FFindexWriter
    from hhsuite_tpu.io.results import print_hit_list, print_m8
    from hhsuite_tpu.search.engine import HHDatabase, run_hhsearch
    from hhsuite_tpu.search.hhblits import run_hhblits

    rng = np.random.RandomState(7000 + seed)
    entries = []
    for k in range(rng.randint(4, 9)):
        text = _random_a3m(rng, nseq=rng.randint(2, 6),
                           ncols=rng.randint(12, 50))
        entries.append((f"t{k:02d}.a3m", text))
    with FFindexWriter(f"{tmp_path}/db_a3m.ffdata",
                       f"{tmp_path}/db_a3m.ffindex") as w:
        for name, text in entries:
            w.add(name, text.encode())
    with FFindexWriter(f"{tmp_path}/db_cs219.ffdata",
                       f"{tmp_path}/db_cs219.ffindex") as w:
        for name, text in entries:
            w.add(name, cstranslate_a3m(text))
    query = _random_a3m(rng, nseq=rng.randint(2, 5),
                        ncols=rng.randint(15, 45))
    db = HHDatabase(f"{tmp_path}/db")

    def check(q, hitlist):
        prev = None
        for h in hitlist:
            assert 0.0 <= h.Probab <= 100.0
            assert h.Eval >= 0.0
            key = (h.score_sort, h.file)
            assert prev is None or prev <= key, "hitlist out of order"
            prev = key
            if not getattr(h, "light", False) and h.nsteps:
                assert len(h.i) == h.nsteps + 1
                assert len(h.j) == h.nsteps + 1
                assert 1 <= h.i[1:].min() and h.i[1:].max() <= q.L
                assert 1 <= h.j[1:].min() and h.j[1:].max() <= h.L
        m8 = print_m8(q, hitlist, nhits_min_b=10, p=0, E=1e6)
        for ln in m8.splitlines():
            assert len(ln.split("\t")) == 12
        hhr = print_hit_list(q, hitlist, z=1, Z=500, p=0, E=1e6,
                             datestr="X")
        assert hhr.startswith("Query")

    par = Parameters()
    par.nocontxt = True
    par.prefilter = False
    q, hitlist = run_hhsearch(par, query, db, "query.a3m")
    check(q, hitlist)

    par2 = Parameters.hhblits_defaults()
    par2.nocontxt = True
    par2.num_rounds = 1
    # permissive prefilter so random sequences reach the Viterbi stage
    par2.prefilter_evalue_thresh = 1e6
    par2.prefilter_evalue_coarse_thresh = 1e8
    q2, hitlist2, qali2 = run_hhblits(par2, query, db, "query.a3m")
    check(q2, hitlist2)
    assert qali2.N_in >= 1
