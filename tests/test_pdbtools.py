"""PDB pipeline tools (scripts/{cif2fasta.py,pdbfilter.py,
pdb2fasta.pl,renumberpdb.pl} equivalents)."""

import os
import textwrap

FIX = os.path.join(os.path.dirname(__file__), "fixtures")

MINI_CIF = """data_1ABC
#
_entry.id 1ABC
_struct.pdbx_descriptor 'Test kinase domain protein of doom'
_exptl.method 'X-RAY DIFFRACTION'
_refine.ls_d_res_high 1.80
_refine.ls_R_factor_R_free 0.210
_entity_src_gen.pdbx_gene_src_scientific_name 'Homo sapiens'
#
loop_
_entity_poly.entity_id
_entity_poly.type
_entity_poly.pdbx_seq_one_letter_code
_entity_poly.pdbx_strand_id
1 'polypeptide(L)' 'ACDEFGHIKLMNPQRSTVWYACDEFGHIKL(MSE)NPQRSTVWY' A
2 'polyribonucleotide' 'AUGC' B
#
loop_
_atom_site.group_PDB
_atom_site.id
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
_atom_site.auth_seq_id
_atom_site.auth_asym_id
_atom_site.pdbx_PDB_model_num
ATOM 1 CA . ALA A 1 1 ? 0.0 0.0 0.0 1 A 1
ATOM 2 CA . CYS A 1 2 ? 1.0 0.0 0.0 2 A 1
ATOM 3 CA . ASP A 1 3 ? 2.0 0.0 0.0 3 A 1
#
"""


def test_cif2fasta_and_pdbfilter(tmp_path):
    from hhsuite_tpu.tools.pdbtools import cif2fasta, pdbfilter

    cdir = tmp_path / "cifs"
    cdir.mkdir()
    (cdir / "1abc.cif").write_text(MINI_CIF)
    out = tmp_path / "pdb.fas"
    anno = tmp_path / "anno.tsv"
    assert cif2fasta(["-i", str(cdir), "-o", str(out),
                      "-p", str(anno)]) == 0
    text = out.read_text()
    assert text.startswith(">1ABC_A ")
    assert "DSC: Test kinase domain protein" in text
    assert "RES: 1.80" in text
    assert "MET: X-RAY DIFFRACTION" in text
    # non-polypeptide chain B excluded; MSE became M
    assert "1ABC_B" not in text
    seq = "".join(text.splitlines()[1:])
    assert seq == "ACDEFGHIKLMNPQRSTVWYACDEFGHIKLMNPQRSTVWY"
    anno_line = [l for l in anno.read_text().splitlines()
                 if not l.startswith("#")][0]
    fields = anno_line.split("\t")
    assert fields[0] == "1ABC_A" and fields[1] == "1.80"

    # pdbfilter: two-entry cluster, pick by annotations
    fasta = tmp_path / "in.fas"
    fasta.write_text(">X_A hdr\nACDE\n>Y_A hdr\nACDF\n>Z_A hdr\nACDG\n")
    cluster = tmp_path / "clu.tsv"
    cluster.write_text("X_A\tX_A\nX_A\tY_A\nX_A\tZ_A\n")
    anno2 = tmp_path / "anno2.tsv"
    anno2.write_text("#h\nX_A\t2.5\t0.3\t0.90\tXRAY\n"
                     "Y_A\t1.2\t0.2\t0.80\tXRAY\n"
                     "Z_A\tN/A\tN/A\t0.99\tNMR\n")
    outf = tmp_path / "filtered.fas"
    assert pdbfilter([str(fasta), str(cluster), str(anno2),
                      str(outf)]) == 0
    names = [l[1:].split()[0] for l in outf.read_text().splitlines()
             if l.startswith(">")]
    # Y_A best res + best rfree; Z_A best completeness
    assert set(names) == {"Y_A", "Z_A"}


def _pdb_line(serial, aname, res3, chain, resnum, x=0.0):
    return ("ATOM  %5d  %-3s %3s %s%4d    %8.3f%8.3f%8.3f  1.00  0.00"
            % (serial, aname, res3, chain, resnum, x, 0.0, 0.0))


def test_pdb2fasta(tmp_path):
    from hhsuite_tpu.tools.pdbtools import pdb2fasta

    pdb = tmp_path / "1xyz.pdb"
    res3 = ("ALA CYS ASP GLU PHE GLY HIS ILE LYS LEU MET ASN PRO GLN "
            "ARG SER THR VAL TRP TYR").split()
    lines = ["HEADER    TEST PROTEIN                            "
             "01-JAN-20   1XYZ"]
    # SEQRES for chain A: 20 residues
    lines.append("SEQRES   1 A   20  " + " ".join(res3[:13]))
    lines.append("SEQRES   2 A   20  " + " ".join(res3[13:]))
    pdb.write_text("\n".join(lines) + "\n")
    out = tmp_path / "out.fas"
    assert pdb2fasta([str(tmp_path / "*.pdb"), str(out)]) == 0
    text = out.read_text()
    assert text.startswith(">1xyz_A")
    assert "ACDEFGHIKLMNPQRSTVWY" in text.replace("\n", "")


def test_renumberpdb(tmp_path):
    from hhsuite_tpu.tools.pdbtools import renumberpdb

    # ATOM-record sequence ACDEF numbered 101..105; query is XACDEFY so
    # aligned residues should renumber to 2..6
    lines = []
    seq3 = ["ALA", "CYS", "ASP", "GLU", "PHE"]
    for k, r3 in enumerate(seq3):
        lines.append(_pdb_line(k + 1, "CA", r3, "A", 101 + k, x=float(k)))
    (tmp_path / "1tst.pdb").write_text("\n".join(lines) + "\n")
    a3m = tmp_path / "q.a3m"
    a3m.write_text(">1tst_A test domain\nWACDEFY\n")
    out = tmp_path / "renum.pdb"
    rc = renumberpdb(["-o", str(out), "-pdb", str(tmp_path),
                      str(a3m)])
    assert rc == 0
    nums = [int(l[22:26]) for l in out.read_text().splitlines()
            if l.startswith("ATOM")]
    assert nums == [2, 3, 4, 5, 6]
