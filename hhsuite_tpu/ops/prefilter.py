"""Prefilter kernels: ungapped + gapped Smith-Waterman over AS219 states.

Device reimplementation of src/hhprefilter.cpp:70-275.  The reference
streams uint8-saturated SIMD over one db sequence at a time; here the db
axis is the batch: a (B, Ld) bucket of state sequences is scored against
the (220, Lq) query score table in one `lax.scan` over db positions with
(B, Lq) vectors — the uint8 saturation semantics (clamp to [0,255] after
each add/sub) are emulated exactly in int32.

Stage 1 (ungapped_scores): diagonal running chains
    S(i,j) = max(0, min(255, S(i-1,j-1) + qc[x_j][i]) - offset)
Stage 2 (gapped_scores): Smith-Waterman with gap_init/gap_extend in
saturated arithmetic.  The reference's Farrar striping makes its
intra-column F propagation segment-local (and therefore SSE/AVX2
build-dependent); we compute the exact SW fixpoint instead — the scores
can differ from a given x86 build by at most the striping artifact the
reference itself does not reproduce across its own builds.
"""

from __future__ import annotations

import functools

import numpy as np


@functools.partial(__import__("jax").jit, static_argnames=())
def ungapped_scores(qc, db, db_len, offset):
    """Stage-1 ungapped banded scores (hhprefilter.cpp:214-275).

    qc:     (220, Lq) int32 query profile scores (offset included)
    db:     (B, Ld) int32 state sequences, padded with 219 (ANY)
    db_len: (B,) int32 true lengths
    offset: scalar int32 score offset

    Returns (B,) int32 max chain scores.
    """
    import jax.numpy as jnp
    from jax import lax

    B, Ld = db.shape
    Lq = qc.shape[1]
    NS = qc.shape[0]
    # per-lane table gathers are slow on TPU; a one-hot bf16 matmul on
    # the MXU computes the same row lookup exactly (0/1 x small-int
    # products, single nonzero per row -> no rounding)
    qc_b = qc.astype(jnp.bfloat16)
    states = jnp.arange(NS, dtype=db.dtype)

    def lookup(x):
        oh = (x[:, None] == states[None, :]).astype(jnp.bfloat16)
        return jnp.dot(oh, qc_b,
                       preferred_element_type=jnp.float32).astype(jnp.int32)

    def step(carry, j):
        S, best = carry
        x = db[:, j]                                  # (B,)
        scores = lookup(x)                            # (B, Lq)
        Sshift = jnp.pad(S[:, :-1], ((0, 0), (1, 0)))
        S = jnp.maximum(
            jnp.minimum(Sshift + scores, 255) - offset, 0)
        valid = (j < db_len)[:, None]
        S = jnp.where(valid, S, 0)
        # running elementwise max; the axis-1 reduce happens once at
        # the end instead of every step
        best = jnp.maximum(best, S)
        return (S, best), None

    S0 = jnp.zeros((B, Lq), jnp.int32)
    best0 = jnp.zeros((B, Lq), jnp.int32)
    (S, best), _ = lax.scan(step, (S0, best0), jnp.arange(Ld))
    return best.max(axis=1)


@functools.partial(__import__("jax").jit, static_argnames=())
def gapped_scores(qc, db, db_len, gap_init, gap_extend, offset):
    """Stage-2 gapped Smith-Waterman (hhprefilter.cpp:70-212).

    Same shapes as ungapped_scores.  Returns (B,) int32 best scores.
    """
    import jax.numpy as jnp
    from jax import lax

    B, Ld = db.shape
    Lq = qc.shape[1]
    NS = qc.shape[0]
    qc_b = qc.astype(jnp.bfloat16)
    states = jnp.arange(NS, dtype=db.dtype)

    def lookup(x):
        # exact one-hot MXU lookup (see ungapped_scores)
        oh = (x[:, None] == states[None, :]).astype(jnp.bfloat16)
        return jnp.dot(oh, qc_b,
                       preferred_element_type=jnp.float32).astype(jnp.int32)

    def step(carry, j):
        H, E, best = carry
        x = db[:, j]
        scores = lookup(x)                            # (B, Lq)
        Hdiag = jnp.pad(H[:, :-1], ((0, 0), (1, 0)))
        vH = jnp.maximum(jnp.minimum(Hdiag + scores, 255) - offset, 0)
        H0 = jnp.maximum(vH, E)
        # F fixpoint along the query axis:
        #   F[p] = clamp0( max_{k<p} (H0[k] - gap_init - (p-1-k) ge) )
        # expressed as an exclusive prefix max of t[k] = H0[k] - gi + ge*k
        k = jnp.arange(Lq)
        t = H0 - gap_init + gap_extend * k[None, :]
        run = lax.associative_scan(jnp.maximum, t, axis=1)
        prefmax = jnp.pad(run[:, :-1], ((0, 0), (1, 0)),
                          constant_values=-(10 ** 9))
        F = jnp.maximum(prefmax - gap_extend * (k - 1)[None, :], 0)
        Hnew = jnp.maximum(H0, F)
        valid = (j < db_len)[:, None]
        Hnew = jnp.where(valid, Hnew, 0)
        Enew = jnp.maximum(
            jnp.maximum(E - gap_extend, 0),
            jnp.maximum(Hnew - gap_init, 0))
        Enew = jnp.where(valid, Enew, 0)
        best = jnp.maximum(best, Hnew)
        return (Hnew, Enew, best), None

    H0 = jnp.zeros((B, Lq), jnp.int32)
    E0 = jnp.zeros((B, Lq), jnp.int32)
    best0 = jnp.zeros((B, Lq), jnp.int32)
    (H, E, best), _ = lax.scan(step, (H0, E0, best0), jnp.arange(Ld))
    return best.max(axis=1)
