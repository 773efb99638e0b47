"""Pallas TPU kernel for the stage-2 gapped Smith-Waterman prefilter.

Companion to ops/prefilter_pallas.py (stage 1): the lax.scan version
(ops/prefilter.py:gapped_scores) keeps its (B, Lq) H/E carries in HBM
and re-materializes the one-hot profile lookup per step; on big
databases stage 2 sees every stage-1 survivor (~20k sequences) and
dominates prefilter time (src/hhprefilter.cpp:70-212 is the hot SW
loop).  Here the H/E/best state lives in VMEM across the whole
db-position loop and the intra-column F fixpoint

    F[p] = clamp0( max_{k<p} (H0[k] - gap_init - (p-1-k)*gap_extend) )

is computed as an exclusive prefix max of t[k] = H0[k] - gi + ge*k via
log2(Lq) masked lane rolls — the exact SW fixpoint, identical to the
scan kernel (the reference's Farrar striping is segment-local and
therefore already build-dependent; see ops/prefilter.py:13-18).

Padding contract (matches search/prefilter.py): db rows padded with
state NS-1 (ANY) whose profile row is `score_offset - 1` strictly decay
H, and E/F are bounded by earlier H minus positive gap penalties, so
padded steps never raise the maximum — no per-lane length masks.
"""

from __future__ import annotations

import functools

import numpy as np


def _round_up(x, m):
    return (x + m - 1) // m * m


@functools.partial(
    __import__("jax").jit, static_argnames=("interpret",))
def gapped_scores_pallas(qc, db, db_len, gap_init, gap_extend, offset,
                         interpret=False):
    """Drop-in for ops.prefilter.gapped_scores (same contract).

    qc: (NS, Lq) int32 in [0, 255]; db: (B, Ld) int32 padded with NS-1;
    db_len unused (padding decays scores); scalars int32.
    Returns (B,) int32 best Smith-Waterman scores.
    """
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    del db_len
    B, Ld = db.shape
    NS, Lq = qc.shape
    TB = 256
    U = 8
    Bp = _round_up(B, TB)
    nB = Bp // TB
    NSp = _round_up(NS, 128)
    Lqp = _round_up(Lq, 128)
    Ldp = _round_up(Ld, U)
    NEG = -(10 ** 9)          # plain int: kernels cannot capture tracers

    dbp = jnp.pad(db, ((0, Bp - B), (0, Ldp - Ld)),
                  constant_values=NS - 1)
    db_t = jnp.transpose(dbp.reshape(nB, TB, Ldp),
                         (0, 2, 1))[..., None]          # (nB, Ldp, TB, 1)
    qc_b = jnp.pad(qc, ((0, NSp - NS), (0, Lqp - Lq))
                   ).astype(jnp.bfloat16)
    scal = jnp.asarray([gap_init, gap_extend, offset],
                       jnp.int32).reshape(3, 1)

    # number of masked-roll doubling steps for the lane prefix max
    nsteps = max(1, int(np.ceil(np.log2(Lqp))))

    def kernel(db_ref, qc_ref, sc_ref, out_ref, h_ref, e_ref, best_ref):
        j = pl.program_id(1)
        gi = sc_ref[0, 0]
        ge = sc_ref[1, 0]
        offv = sc_ref[2, 0]

        @pl.when(j == 0)
        def _():
            h_ref[...] = jnp.zeros((TB, Lqp), jnp.int32)
            e_ref[...] = jnp.zeros((TB, Lqp), jnp.int32)
            best_ref[...] = jnp.zeros((TB, Lqp), jnp.int32)

        H = h_ref[...]
        E = e_ref[...]
        best = best_ref[...]
        st = jax.lax.broadcasted_iota(jnp.int32, (TB, NSp), 1)
        lanes = jax.lax.broadcasted_iota(jnp.int32, (TB, Lqp), 1)
        lane0 = lanes == 0
        gek = ge * lanes                       # ge * k per lane
        for u in range(U):
            x = db_ref[0, u]                                 # (TB, 1)
            oh = (x == st).astype(jnp.bfloat16)
            sc = jnp.dot(oh, qc_ref[...],
                         preferred_element_type=jnp.float32
                         ).astype(jnp.int32)
            Hdiag = jnp.where(lane0, 0, pltpu.roll(H, 1, 1))
            vH = jnp.maximum(jnp.minimum(Hdiag + sc, 255) - offv, 0)
            H0 = jnp.maximum(vH, E)
            # exclusive prefix max of t = H0 - gi + ge*k over lanes
            t = H0 - gi + gek
            shift = 1
            for _s in range(nsteps):
                rolled = pltpu.roll(t, shift, 1)
                rolled = jnp.where(lanes < shift, NEG, rolled)
                t = jnp.maximum(t, rolled)
                shift *= 2
            pref = jnp.where(lane0, NEG, pltpu.roll(t, 1, 1))
            F = jnp.maximum(pref - (gek - ge), 0)
            Hn = jnp.maximum(H0, F)
            E = jnp.maximum(jnp.maximum(E - ge, 0),
                            jnp.maximum(Hn - gi, 0))
            H = Hn
            best = jnp.maximum(best, H)
        h_ref[...] = H
        e_ref[...] = E
        best_ref[...] = best

        @pl.when(j == pl.num_programs(1) - 1)
        def _():
            out_ref[0] = jnp.max(best, axis=1, keepdims=True)

    res = pl.pallas_call(
        kernel,
        grid=(nB, Ldp // U),
        in_specs=[
            pl.BlockSpec((1, U, TB, 1), lambda b, j: (b, j, 0, 0)),
            pl.BlockSpec((NSp, Lqp), lambda b, j: (0, 0)),
            pl.BlockSpec((3, 1), lambda b, j: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, TB, 1), lambda b, j: (b, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((nB, TB, 1), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((TB, Lqp), jnp.int32),
            pltpu.VMEM((TB, Lqp), jnp.int32),
            pltpu.VMEM((TB, Lqp), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        interpret=interpret,
    )(db_t, qc_b, scal)

    return res.reshape(Bp)[:B]
