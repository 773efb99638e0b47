"""hhr parser (hh_reader API) + hhmakemodel grid/PIR/CIF pipeline."""

import os
import subprocess
import sys
import textwrap

import pytest

from hhsuite_tpu.io.hhr import parse_result
from hhsuite_tpu.io.cif import parse_cif, atom_records, chain_sequence
from hhsuite_tpu.tools.hhmakemodel import (build_grid, render_row,
                                           _trim_common_gaps)

HHR = """\
Query         testq
Match_columns 10
No_of_seqs    3 out of 5
Neff          2.5
Searched_HMMs 2
Date          Mon Aug 17 00:00:00 2026
Command       hhsearch -i q.a3m

 No Hit                             Prob E-value P-value  Score    SS Cols Query HMM  Template HMM
  1 1abc_A tmpl one                 99.0 1.2E-10 1E-10    50.0   0.0   8     2-9       3-10  (12)
  2 2xyz_B tmpl two                 80.0 0.5     0.4      20.0   0.0   6     1-6       1-7   (9)

No 1
>1abc_A tmpl one
Probab=99.00  E-value=1.2e-10  Score=50.00  Aligned_cols=8  Identities=75%  Similarity=1.200  Sum_probs=7.5  Template_Neff=2.000

Q testq             2 KVLAAGIT   9 (10)
T 1abc_A            3 KVLGAGIT  10 (12)

No 2
>2xyz_B tmpl two
Probab=80.00  E-value=0.5  Score=20.00  Aligned_cols=6  Identities=50%  Similarity=0.800  Sum_probs=4.1  Template_Neff=1.500

Q testq             1 MKV-LAA   6 (10)
T 2xyz_B            1 MKVPLGA   7 (9)

Done!
"""


def test_parse_result_fields():
    rs = parse_result(HHR.splitlines())
    assert len(rs) == 2
    r1, r2 = rs
    assert r1.query_id == "testq" and r1.query_length == 10
    assert r1.template_id == "1abc_A"
    assert r1.start == (2, 3) and r1.end == (9, 10)
    assert r1.evalue == pytest.approx(1.2e-10)
    assert r1.template_neff == pytest.approx(2.0)
    assert r2.query_ali == "MKV-LAA" and r2.template_ali == "MKVPLGA"


def test_grid_master_slave():
    rs = parse_result(HHR.splitlines())
    columns, qrow, rows = build_grid(rs)
    rendered = [render_row(columns, r) for r in rows]
    # insertion column (template 2's P after query pos 3) is private
    qpos3_ins = [c for c in columns if c[1] > 0]
    assert qpos3_ins == [(3, 1, 2)]
    assert len(qrow) == 11               # 10 query cols + 1 insertion
    # query row: gap at the insertion column
    assert qrow[3] == "-"
    # template 1 covers query 2..9 with its residues, gap at insertion
    assert rendered[0] == "-KV-LGAGIT-"
    assert rendered[1] == "MKVPLGA----"


def test_hit_selection_filters():
    rs = parse_result(HHR.splitlines())
    _c, _q, rows = build_grid(rs, pick=[2])
    assert [r.hit.template_id for r in rows] == ["2xyz_B"]
    _c, _q, rows = build_grid(rs, e_thresh=1e-5)
    assert [r.hit.template_id for r in rows] == ["1abc_A"]
    _c, _q, rows = build_grid(rs, res_ratio=0.75)
    assert [r.hit.template_id for r in rows] == ["1abc_A"]
    with pytest.raises(SystemExit):
        build_grid(rs, e_thresh=1e-30)


CIF = textwrap.dedent("""\
    data_1ABC
    #
    _entry.id 1ABC
    #
    loop_
    _atom_site.group_PDB
    _atom_site.id
    _atom_site.type_symbol
    _atom_site.label_atom_id
    _atom_site.label_alt_id
    _atom_site.label_comp_id
    _atom_site.label_asym_id
    _atom_site.label_entity_id
    _atom_site.label_seq_id
    _atom_site.pdbx_PDB_ins_code
    _atom_site.Cartn_x
    _atom_site.Cartn_y
    _atom_site.Cartn_z
    _atom_site.occupancy
    _atom_site.B_iso_or_equiv
    _atom_site.auth_seq_id
    _atom_site.auth_asym_id
    _atom_site.pdbx_PDB_model_num
    """) + "\n".join(
        f"ATOM {i+1} C CA . {res} A 1 {i+1} ? 0.0 0.0 {i}.0 1.00 10.0 "
        f"{i+1} A 1"
        for i, res in enumerate(
            ["MET", "LYS", "VAL", "LEU", "GLY", "ALA", "GLY", "ILE",
             "THR", "MSE", "TRP", "TYR"])) + "\n#\n"


def test_cif_parse_and_chain_sequence():
    block = parse_cif(CIF)
    assert block.name == "1ABC"
    recs = atom_records(block)
    assert len(recs) == 12
    seq, nums = chain_sequence(recs, "A")
    assert seq == "MKVLGAGITMWY"          # MSE -> M
    assert nums[0] == "1" and nums[-1] == "12"


def test_cli_end_to_end(tmp_path):
    hhr = tmp_path / "r.hhr"
    hhr.write_text(HHR)
    cifdir = tmp_path / "cifs"
    cifdir.mkdir()
    (cifdir / "1abc.cif").write_text(CIF)
    outdir = tmp_path / "ocifs"
    pir = tmp_path / "out.pir"
    fas = tmp_path / "out.fas"

    env = dict(os.environ, JAX_PLATFORMS="cpu",
               PYTHONPATH=os.path.dirname(os.path.dirname(
                   os.path.dirname(os.path.abspath(__file__)))) or ".")
    res = subprocess.run(
        [sys.executable, "-m", "hhsuite_tpu", "hhmakemodel",
         "-i", str(hhr), "-pir", str(pir), "-fas", str(fas),
         "-cifs", str(cifdir), "-ocifs", str(outdir)],
        capture_output=True, text=True,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    assert res.returncode == 0, res.stderr
    pir_text = pir.read_text()
    assert ">P1;testq" in pir_text and "sequence:testq" in pir_text
    assert ">P1;1abc_A" in pir_text
    assert "structureX:1abc_A:1:A:8:A" in pir_text
    # template CIF trimmed to aligned range 3..10 and renumbered 1..8
    out_cif = (outdir / "1abc_A.cif").read_text()
    recs = atom_records(parse_cif(out_cif))
    assert len(recs) == 8
    assert [r["auth_seq_id"] for r in recs] == [str(i) for i in
                                                range(1, 9)]
    seq, _ = chain_sequence(recs, "A")
    assert seq == "VLGAGITM"             # template residues 3..10
    # missing CIF for 2xyz reported but run succeeded
    assert "no CIF for 2xyz_B" in res.stderr


def test_select_templates_heuristic_units():
    """selectTemplatesHeuristic port: formula-level checks of the
    scoring loop, the 50% same-name overlap rule, the preselection
    union, and SingleTemplateSelection's coverage thresholds."""
    from collections import namedtuple

    from hhsuite_tpu.tools.hhpred import (
        choose_templates_scoring_heuristic, preselect_templates,
        single_template_selection)

    R = namedtuple("R", "template_id probability similarity sum_probs "
                   "aligned_cols start end")
    L = 50

    def mk(tid, prob, sim, sp, cols, q0, q1, t0, t1):
        return R(tid, prob, sim, sp, cols, (q0, t0), (q1, t1))

    # preselection union: best by sim, then SumProbs/Cols, then prob
    pool = [(0, 0.9, 0.1, 10.0), (1, 0.5, 0.9, 50.0),
            (2, 0.1, 0.5, 99.0)]
    assert preselect_templates(1, pool) == [0, 1, 2]

    # two disjoint strong templates both accepted; a same-name copy
    # overlapping > 50% in template coordinates is rejected
    results = [mk("A", 99.0, 1.0, 20.0, 25, 1, 25, 1, 25),
               mk("B", 99.0, 1.0, 20.0, 25, 26, 50, 1, 25),
               mk("A", 98.0, 1.0, 20.0, 25, 1, 25, 2, 26)]
    posts = [[0.9 if 0 <= i < 25 else 0.0 for i in range(L)],
             [0.9 if 25 <= i < 50 else 0.0 for i in range(L)],
             [0.8 if 0 <= i < 25 else 0.0 for i in range(L)]]
    idxs = choose_templates_scoring_heuristic(results, posts, L,
                                              preselect=2)
    assert 0 in idxs and 1 in idxs and 2 not in idxs

    # SingleTemplateSelection: needs > 40 new columns, < 20 overlap
    res2 = [mk("A", 99, 1, 20, 45, 1, 45, 1, 45),
            mk("B", 90, 1, 20, 45, 2, 46, 1, 45),    # mostly covered
            mk("C", 80, 1, 20, 45, 46, 95, 1, 50)]   # but L=50 clamps
    assert single_template_selection(res2, 100) == [0, 2]
