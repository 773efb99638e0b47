"""Bit-parity of derived substitution/SS matrices vs reference computation
(hhmatrices.cpp:20-188), fixture dumped from the reference tables."""

import os

import numpy as np

from hhsuite_tpu import matrices as M

FIX = os.path.join(os.path.dirname(__file__), "fixtures", "matrices_ref.bin")


def _load():
    raw = np.fromfile(FIX, dtype=np.float32)
    out = {}
    o = 0
    for name, shape in [("P", (20, 20)), ("pb", (20,)), ("R", (20, 20)),
                        ("S", (20, 20)), ("Sim", (20, 20)),
                        ("S73", (8, 4, 11)), ("S33", (4, 11, 4, 11))]:
        n = int(np.prod(shape))
        out[name] = raw[o:o + n].reshape(shape)
        o += n
    return out


REF = _load()


def test_gonnet_derived_exact():
    m = M.get_substitution_matrix(0)
    np.testing.assert_array_equal(m.P, REF["P"])
    np.testing.assert_array_equal(m.pb, REF["pb"])
    np.testing.assert_array_equal(m.R, REF["R"])
    np.testing.assert_array_equal(m.S, REF["S"])
    np.testing.assert_array_equal(m.Sim, REF["Sim"])


def test_ss_matrices_exact():
    ss = M.get_ss_matrices(1.0)
    np.testing.assert_array_equal(ss.S73, REF["S73"])
    np.testing.assert_array_equal(ss.S33, REF["S33"])
    np.testing.assert_array_equal(ss.S37, REF["S73"].transpose(1, 2, 0))


def test_blosum_matrices_load():
    for mx in (30, 40, 50, 62, 65, 80):
        m = M.get_substitution_matrix(mx)
        assert abs(float(m.P.sum()) - 1.0) < 1e-5
        assert np.all(m.pb > 0)
