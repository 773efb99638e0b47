"""Bit-parity of fast math vs reference dumps (util-inl.h, hhutil-inl.h).

Fixture ``fastmath_ref.txt`` was produced by compiling the reference's
polynomial approximations with -ffp-contract=off and dumping hex floats
over a wide grid.
"""

import os

import numpy as np
import pytest

from hhsuite_tpu import fastmath as fm

FIX = os.path.join(os.path.dirname(__file__), "fixtures", "fastmath_ref.txt")


def _load():
    xs, fl, fa, l4, px, pv = [], [], [], [], [], []
    with open(FIX) as f:
        for line in f:
            t = line.split()
            if t[0] == "P":
                px.append(float.fromhex(t[1]))
                pv.append(float.fromhex(t[2]))
            else:
                xs.append(float.fromhex(t[0]))
                fl.append(float.fromhex(t[1]))
                fa.append(float.fromhex(t[2]))
                l4.append(float.fromhex(t[3]))
    as32 = lambda v: np.array(v, dtype=np.float32)
    return as32(xs), as32(fl), as32(fa), as32(l4), as32(px), as32(pv)


XS, FLOG2, FASTLOG2, LOG2F4, PX, FPOW2 = _load()


def test_flog2_bit_exact():
    np.testing.assert_array_equal(fm.flog2(XS), FLOG2)


def test_fast_log2_bit_exact():
    np.testing.assert_array_equal(fm.fast_log2(XS), FASTLOG2)


def test_log2f4_bit_exact():
    np.testing.assert_array_equal(fm.log2f4(XS), LOG2F4)


def test_fpow2_bit_exact():
    np.testing.assert_array_equal(fm.fpow2(PX), FPOW2)


def test_flog2_nonpositive():
    assert fm.flog2(np.float32(0.0)) == -128.0
    assert fm.flog2(np.float32(-3.0)) == -128.0
    assert fm.fast_log2(np.float32(0.0)) == -100000.0


@pytest.mark.parametrize("fn_np,fn_jnp", [
    ("flog2", "flog2_jnp"),
    ("log2f4", "log2f4_jnp"),
    ("fpow2", "fpow2_jnp"),
])
def test_jax_variants_match_numpy(fn_np, fn_jnp):
    import jax.numpy as jnp

    x = XS if fn_np != "fpow2" else PX
    got = np.asarray(getattr(fm, fn_jnp)(jnp.asarray(x)))
    want = getattr(fm, fn_np)(x)
    if fn_np == "flog2":
        # device variant runs the poly in f32 (f64 is avoided on TPU);
        # tolerate ulp-level drift
        np.testing.assert_allclose(got, want, atol=4e-6)
    else:
        np.testing.assert_array_equal(got, want)
