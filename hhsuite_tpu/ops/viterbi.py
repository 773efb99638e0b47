"""Batched 5-pair-state Viterbi HMM-HMM alignment (device kernel).

Reimplements the recurrence of src/hhviterbialgorithm.cpp:45-497 in a
TPU-native form:

* the reference's SIMD lane axis (VECSIZE_FLOAT templates per instruction)
  becomes a batch axis ``B`` over length-bucketed templates;
* the match-score matrix ``Si = log2(dot20(q_i, t_j)) + shift`` is one MXU
  einsum over all (i, j) instead of a per-cell 20-float dot
  (src/hhviterbi.h:126-190);
* the row-sequential cell loop becomes an anti-diagonal wavefront
  ``lax.scan``: on diagonal d = i+j every state depends only on diagonals
  d-1 / d-2, so each cell computes the *identical* float expression as the
  reference's loop — no reassociation, bit-stable modulo the einsum's dot
  reduction order.

All d-indexed operands (match scores, cell-off, template transitions at
j = d - i) are pre-skewed into (D, ...) diagonal layout with one gather
outside the scan and streamed as scan inputs, so the scan body is pure
element-wise VPU work + static shifts — no per-step gathers.

Outputs per lane: best score / end cell (i2, j2) (strictly-greater update =
row-major tie-break, src/hhviterbialgorithm.cpp:423-455) and the packed
backtrace byte matrix (bits 0-2: MM predecessor code, bit3/4/5/6: GD/IM/
DG/MI opened from MM; src/hhviterbimatrix.h:29-85).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import numpy as np

FLT_MAX = float(np.finfo(np.float32).max)

M2M, M2I, M2D, I2M, I2I, D2M, D2D = range(7)
STOP, MM, GD, IM, DG, MI = 0, 2, 3, 4, 5, 6


class ViterbiResult(NamedTuple):
    score: "np.ndarray"   # (B,) f32 best score
    i2: "np.ndarray"      # (B,) i of best cell
    j2: "np.ndarray"      # (B,) j of best cell
    bt: "np.ndarray"      # (B, Lq+1, Lt+1) uint8 backtrace codes


def _log2f4(x):
    import jax.numpy as jnp
    from jax import lax
    bits = lax.bitcast_convert_type(x, jnp.int32)
    e = (((bits & 0x7F800000) >> 23) - 127).astype(jnp.float32)
    m = lax.bitcast_convert_type((bits & 0x007FFFFF) | 0x3F800000,
                                 jnp.float32)
    p = jnp.float32(-0.107254423828329604454)
    p = p * m + jnp.float32(0.688243882994381274313)
    p = p * m + jnp.float32(-1.75647175389045657003)
    p = p * m + jnp.float32(2.61761038894603480148)
    return p * (m - 1.0) + e


def _skew_bij(x, Lq, Lt, fill):
    """(B, Lq+1, Lt+1) -> (D, B, Wi) with out[d-2, b, i] = x[b, i, d-i]
    for d = 2..Lq+Lt (one gather, outside the scan)."""
    import jax.numpy as jnp

    D = Lq + Lt - 1
    Wi = Lq + 1
    dvals = jnp.arange(2, Lq + Lt + 1)
    ii = jnp.arange(Wi)
    jj = dvals[:, None] - ii[None, :]                 # (D, Wi)
    valid = (jj >= 1) & (jj <= Lt) & (ii[None, :] >= 1)
    jc = jnp.clip(jj, 0, Lt)
    g = x[:, ii[None, :].repeat(D, 0), jc]            # (B, D, Wi)
    g = jnp.where(valid[None], g.reshape(x.shape[0], D, Wi), fill)
    return jnp.transpose(g, (1, 0, 2))                # (D, B, Wi)


def _skew_tr(ttr_c, Lq, Lt, off):
    """(B, Lt+2) transition column -> (D, B, Wi) at index j = d - i + off
    (clipped; padded cols already hold -FLT_MAX)."""
    import jax.numpy as jnp

    D = Lq + Lt - 1
    Wi = Lq + 1
    dvals = jnp.arange(2, Lq + Lt + 1)
    ii = jnp.arange(Wi)
    jj = jnp.clip(dvals[:, None] - ii[None, :] + off, 0, Lt + 1)
    g = ttr_c[:, jj]                                  # (B, D, Wi)
    return jnp.transpose(g, (1, 0, 2))


@functools.partial(
    __import__("jax").jit,
    static_argnames=("local", "need_bt"))
def viterbi_batch(qp, qtr, tp, ttr, cell_off, t_L,
                  shift, smin_local, penalty_gap_query,
                  penalty_gap_template, ss_score=None,
                  local=True, need_bt=True):
    """Align one query against a batch of templates.

    Args:
      qp:   (Lq+2, 20) f32 query odds profile (already divided by null)
      qtr:  (Lq+2, 7)  f32 query log2 transitions
      tp:   (B, Lt+2, 20) f32 template odds profiles (padded cols = 0)
      ttr:  (B, Lt+2, 7)  f32 template transitions (padded cols = -FLT_MAX)
      cell_off: (B, Lq+1, Lt+1) bool, True = forbidden cell
      t_L:  (B,) int32 true template lengths
      shift: score offset per aligned pair (par.shift)
      ss_score: optional (B, Lq+1, Lt+1) f32 secondary-structure score to
        add to the match score (already weighted by ssw)
      local: Smith-Waterman vs global
    Returns (score, i2, j2, bt).
    """
    import jax
    import jax.numpy as jnp
    from jax import lax

    Lq = qp.shape[0] - 2
    Lt = tp.shape[1] - 2
    B = tp.shape[0]
    Wi = Lq + 1
    D = Lq + Lt - 1
    f32 = jnp.float32
    NEG = f32(-FLT_MAX)

    # ---- match scores Si[b, i, j] for i,j in 1..L  (MXU) ----
    dot = jnp.einsum("ia,bja->bij", qp[1:Lq + 1], tp[:, 1:Lt + 1],
                     preferred_element_type=jnp.float32)
    Si = _log2f4(dot) + f32(shift)
    if ss_score is not None:
        Si = Si + ss_score[:, 1:, 1:]
    Si = jnp.pad(Si, ((0, 0), (1, 0), (1, 0)))

    co_add = jnp.where(cell_off, NEG, f32(0.0))

    smin = f32(0.0) if local else NEG
    pq = f32(penalty_gap_query)
    pt = f32(penalty_gap_template)
    iidx = jnp.arange(Wi)
    tL_vec = jnp.asarray(t_L, jnp.int32)

    # ---- pre-skewed scan inputs ----
    si_d = _skew_bij(Si, Lq, Lt, f32(0.0))            # (D, B, Wi)
    co_d = _skew_bij(co_add, Lq, Lt, f32(0.0))
    tm2m_1 = _skew_tr(ttr[:, :, M2M], Lq, Lt, -1)
    td2m_1 = _skew_tr(ttr[:, :, D2M], Lq, Lt, -1)
    ti2m_1 = _skew_tr(ttr[:, :, I2M], Lq, Lt, -1)
    tm2d_1 = _skew_tr(ttr[:, :, M2D], Lq, Lt, -1)
    td2d_1 = _skew_tr(ttr[:, :, D2D], Lq, Lt, -1)
    tm2i_0 = _skew_tr(ttr[:, :, M2I], Lq, Lt, 0)
    ti2i_0 = _skew_tr(ttr[:, :, I2I], Lq, Lt, 0)

    # query transitions by lane (constant across diagonals)
    qm2m_1 = qtr[jnp.maximum(iidx - 1, 0), M2M][None, :]
    qd2m_1 = qtr[jnp.maximum(iidx - 1, 0), D2M][None, :]
    qi2m_1 = qtr[jnp.maximum(iidx - 1, 0), I2M][None, :]
    qm2d_1 = qtr[jnp.maximum(iidx - 1, 0), M2D][None, :]
    qd2d_1 = qtr[jnp.maximum(iidx - 1, 0), D2D][None, :]
    qm2i_0 = qtr[iidx, M2I][None, :]
    qi2i_0 = qtr[iidx, I2I][None, :]

    # per-diagonal masks / boundary rows, precomputed (D, Wi)
    dvals = jnp.arange(2, Lq + Lt + 1)
    jj = dvals[:, None] - iidx[None, :]
    on_d = (iidx[None, :] >= 1) & (jj >= 1) & (jj <= Lt)
    mm0_d = jnp.where(iidx[None, :] == 0, -jj.astype(f32) * pt,
                      jnp.where(jj == 0, -iidx.astype(f32)[None, :] * pq,
                                NEG))
    mm0_d = jnp.where((jj < 0) | (jj > Lt), NEG, mm0_d)

    def state0(d):
        j = d - iidx
        mm = jnp.where(iidx == 0, -j.astype(f32) * pt,
                       jnp.where(j == 0, -iidx.astype(f32) * pq, NEG))
        mm = jnp.where((j < 0) | (j > Lt), NEG, mm)
        mm = jnp.broadcast_to(mm[None, :], (B, Wi))
        neg = jnp.full((B, Wi), NEG)
        return mm, neg, neg, neg, neg

    def up(x):
        return jnp.pad(x[:, :-1], ((0, 0), (1, 0)),
                       constant_values=-FLT_MAX)

    def step(carry, xs):
        (mm1, dg1, mi1, gd1, im1), (mm2, dg2, mi2, gd2, im2), \
            best, best_i, best_j = carry
        (d, si, co, tm2m1, td2m1, ti2m1, tm2d1, td2d1, tm2i0, ti2i0,
         on, mm0row) = xs
        on_b = on[None, :]

        mm_diag = up(mm2)
        gd_diag = up(gd2)
        im_diag = up(im2)
        dg_diag = up(dg2)
        mi_diag = up(mi2)

        c_mm = mm_diag + qm2m_1 + tm2m1
        best5 = jnp.maximum(smin, c_mm)
        code = jnp.where(c_mm > smin, MM, STOP).astype(jnp.int32)
        c_gd = gd_diag + qm2m_1 + td2m1
        code = jnp.where(c_gd > best5, GD, code)
        best5 = jnp.maximum(best5, c_gd)
        c_im = im_diag + qi2m_1 + tm2m1
        code = jnp.where(c_im > best5, IM, code)
        best5 = jnp.maximum(best5, c_im)
        c_dg = dg_diag + qd2m_1 + tm2m1
        code = jnp.where(c_dg > best5, DG, code)
        best5 = jnp.maximum(best5, c_dg)
        c_mi = mi_diag + qm2m_1 + ti2m1
        code = jnp.where(c_mi > best5, MI, code)
        best5 = jnp.maximum(best5, c_mi)
        mm_new = best5 + si + co

        mm_up = up(mm1)
        dg_up = up(dg1)
        mi_up = up(mi1)
        a_dg = mm_up + qm2d_1
        b_dg = dg_up + qd2d_1
        bit_dg = a_dg > b_dg
        dg_new = jnp.maximum(a_dg, b_dg) + co
        a_mi = mm_up + qm2m_1 + tm2i0
        b_mi = mi_up + qm2m_1 + ti2i0
        bit_mi = a_mi > b_mi
        mi_new = jnp.maximum(a_mi, b_mi) + co

        a_gd = mm1 + tm2d1
        b_gd = gd1 + td2d1
        bit_gd = a_gd > b_gd
        gd_new = jnp.maximum(a_gd, b_gd) + co
        a_im = mm1 + qm2i_0 + tm2m1
        b_im = im1 + qi2i_0 + tm2m1
        bit_im = a_im > b_im
        im_new = jnp.maximum(a_im, b_im) + co

        mm0 = jnp.broadcast_to(mm0row[None, :], (B, Wi))
        negrow = jnp.full((B, Wi), NEG)
        mm_new = jnp.where(on_b, mm_new, mm0)
        dg_new = jnp.where(on_b, dg_new, negrow)
        mi_new = jnp.where(on_b, mi_new, negrow)
        gd_new = jnp.where(on_b, gd_new, negrow)
        im_new = jnp.where(on_b, im_new, negrow)

        byte = (code
                | jnp.where(bit_gd, 8, 0)
                | jnp.where(bit_im, 16, 0)
                | jnp.where(bit_dg, 32, 0)
                | jnp.where(bit_mi, 64, 0)).astype(jnp.uint8)
        byte = jnp.where(on_b, byte, jnp.uint8(0))

        if local:
            cand_on = on_b
        else:
            # global: only last-ROW and last-COLUMN cells compete
            # (hhviterbialgorithm.cpp:191-192,461-463); the last column
            # is each template's TRUE length, not the padded width
            j_of = d - iidx
            cand_on = on_b & ((j_of[None, :] == tL_vec[:, None])
                              | (iidx[None, :] == Lq))
        cand = jnp.where(cand_on, mm_new, NEG)
        k = jnp.argmax(cand, axis=1)
        cand_s = jnp.take_along_axis(cand, k[:, None], axis=1)[:, 0]
        cand_i = k.astype(jnp.int32)
        cand_j = (d - k).astype(jnp.int32)
        upd = (cand_s > best) | ((cand_s == best) & (cand_i < best_i))
        best = jnp.where(upd, cand_s, best)
        best_i = jnp.where(upd, cand_i, best_i)
        best_j = jnp.where(upd, cand_j, best_j)

        new_carry = ((mm_new, dg_new, mi_new, gd_new, im_new),
                     (mm1, dg1, mi1, gd1, im1),
                     best, best_i, best_j)
        return new_carry, byte if need_bt else None

    init = (state0(1), state0(0),
            jnp.full((B,), NEG), jnp.zeros((B,), jnp.int32),
            jnp.zeros((B,), jnp.int32))
    xs = (dvals, si_d, co_d, tm2m_1, td2m_1, ti2m_1, tm2d_1, td2d_1,
          tm2i_0, ti2i_0, on_d, mm0_d)
    carry, bytes_by_diag = lax.scan(step, init, xs)
    _, _, best, best_i, best_j = carry

    if need_bt:
        # de-skew diagonals back into (B, Lq+1, Lt+1) with one scatter
        jjn = np.arange(2, Lq + Lt + 1)[:, None] - np.arange(Wi)[None, :]
        valid = (jjn >= 1) & (jjn <= Lt) & (np.arange(Wi)[None, :] >= 1)
        jc = np.clip(jjn, 0, Lt)
        flat_idx = (np.broadcast_to(np.arange(Wi)[None, :], jjn.shape)
                    * (Lt + 1) + jc)
        vals = jnp.where(jnp.asarray(valid)[None, :, :],
                         bytes_by_diag.transpose(1, 0, 2),
                         jnp.uint8(0))
        bt_flat = jnp.zeros((B, (Lq + 1) * (Lt + 1)), dtype=jnp.uint8)
        fi = jnp.asarray(flat_idx.reshape(-1))
        bt_flat = bt_flat.at[:, fi].max(vals.reshape(B, -1))
        bt = bt_flat.reshape(B, Lq + 1, Lt + 1)
    else:
        bt = jnp.zeros((B, 1, 1), dtype=jnp.uint8)

    return best, best_i, best_j, bt


# ---------------------------------------------------------------- device ----

@functools.partial(
    __import__("jax").jit, static_argnames=("kmax",))
def backtrace_walk(bt, i2, j2, kmax):
    """Batched device-side decode of the byte backtrace matrices.

    Same transition rules as the scalar host walk below
    (src/hhviterbi.cpp:83-160), vectorised over lanes as a
    ``lax.scan`` of ``kmax`` steps with one batched gather per step,
    so only the O(B * (Lq+Lt)) step lists cross the device->host
    boundary instead of the O(B * Lq * Lt) byte matrices.

    Returns (states (B,kmax) u8, ii (B,kmax) i16, jj (B,kmax) i16,
    n (B,) i32 recorded steps, matched_cols (B,) i32); entries at
    k >= n[b] are garbage and must be sliced off by the caller.
    """
    import jax
    import jax.numpy as jnp

    bt = jnp.asarray(bt)
    B, Li, Wj = bt.shape
    btf = bt.reshape(B, Li * Wj).astype(jnp.int32)
    i32 = jnp.int32

    def step(carry, _):
        i, j, state = carry
        valid = state != STOP
        b = jnp.take_along_axis(btf, (i * Wj + j)[:, None], axis=1)[:, 0]
        is_mm = state == MM
        border_ij = (i <= 1) | (j <= 1)
        mm_next = jnp.where(border_ij, STOP, b & 7)
        gd_next = jnp.where(j <= 1, STOP,
                            jnp.where((b & 8) > 0, MM, GD))
        im_next = jnp.where(j <= 1, STOP,
                            jnp.where((b & 16) > 0, MM, IM))
        dg_next = jnp.where(i <= 1, STOP,
                            jnp.where((b & 32) > 0, MM, DG))
        mi_next = jnp.where(i <= 1, STOP,
                            jnp.where((b & 64) > 0, MM, MI))
        nxt = jnp.where(is_mm, mm_next,
              jnp.where(state == GD, gd_next,
              jnp.where(state == IM, im_next,
              jnp.where(state == DG, dg_next,
              jnp.where(state == MI, mi_next, STOP))))).astype(i32)
        # moves happen only on the non-STOP branches
        di = (jnp.where(is_mm & ~border_ij, 1, 0)
              + jnp.where(((state == DG) | (state == MI)) & (i > 1), 1, 0))
        dj = (jnp.where(is_mm & ~border_ij, 1, 0)
              + jnp.where(((state == GD) | (state == IM)) & (j > 1), 1, 0))
        rec = (state.astype(jnp.uint8), i.astype(jnp.int16),
               j.astype(jnp.int16), valid, is_mm & valid)
        i_n = jnp.where(valid, i - di, i)
        j_n = jnp.where(valid, j - dj, j)
        s_n = jnp.where(valid, nxt, STOP)
        return (i_n, j_n, s_n), rec

    init = (i2.astype(i32), j2.astype(i32),
            jnp.full((B,), MM, i32))
    _, (st, ii, jj, valid, mm_rec) = jax.lax.scan(
        step, init, None, length=kmax)
    n = valid.astype(i32).sum(axis=0)
    matched = mm_rec.astype(i32).sum(axis=0)
    return (st.T, ii.T, jj.T, n, matched)


@functools.partial(
    __import__("jax").jit, static_argnames=("kmax",))
def _backtrace_walk_packed(bt, i2, j2, score, kmax):
    """backtrace_walk with every output packed into ONE f32 array
    [score, i2, j2, n, matched, st[k], ii[k], jj[k]] per lane: the
    remote-TPU link charges fixed latency per device->host transfer,
    so callers fetch once per batch instead of eight times."""
    import jax.numpy as jnp

    st, ii, jj, n, matched = backtrace_walk(bt, i2, j2, kmax)
    f32 = jnp.float32
    cols = [score.astype(f32)[:, None], i2.astype(f32)[:, None],
            j2.astype(f32)[:, None], n.astype(f32)[:, None],
            matched.astype(f32)[:, None], st.astype(f32),
            ii.astype(f32), jj.astype(f32)]
    return jnp.concatenate(cols, axis=1)


@functools.partial(
    __import__("jax").jit, static_argnames=("kmax", "B"))
def backtrace_walk_packed8_words(btw, i2, j2, score, kmax, B):
    """The packed8 walk over the TEMPLATE-LANES backtrace words
    (ops/viterbi_lanes.viterbi_backtrace_lanes): btw is
    (nB, Lt, P4, G, BK) int32, four row-bytes per word, lane
    b = n*G*BK + g*BK + bk.  Identical step logic and payload layout
    to _backtrace_walk_packed8 — only the byte gather differs (flat
    word index + in-word shift instead of a (B, Li*Wj) row gather), so
    backtrace_walk_unpack8 / the native decoder consume either."""
    import jax
    import jax.numpy as jnp

    nB, Lt, P4, G, BK = btw.shape
    TILE = G * BK
    flat = btw.reshape(-1)
    i32 = jnp.int32
    b = jnp.arange(B, dtype=i32)
    n_idx = b // TILE
    g_idx = (b % TILE) // BK
    bk_idx = b % BK
    base = (n_idx * (Lt * P4) * TILE) + g_idx * BK + bk_idx

    def read_byte(i, j):
        iq = jnp.maximum(i - 1, 0)
        jq = jnp.maximum(j - 1, 0)
        widx = base + ((jq * P4) + (iq >> 2)) * TILE
        word = jnp.take(flat, widx, mode="clip")
        return (word >> (8 * (iq & 3))) & 0xFF

    def step(carry, _):
        i, j, state = carry
        valid = state != STOP
        bb = read_byte(i, j)
        is_mm = state == MM
        border_ij = (i <= 1) | (j <= 1)
        mm_next = jnp.where(border_ij, STOP, bb & 7)
        gd_next = jnp.where(j <= 1, STOP,
                            jnp.where((bb & 8) > 0, MM, GD))
        im_next = jnp.where(j <= 1, STOP,
                            jnp.where((bb & 16) > 0, MM, IM))
        dg_next = jnp.where(i <= 1, STOP,
                            jnp.where((bb & 32) > 0, MM, DG))
        mi_next = jnp.where(i <= 1, STOP,
                            jnp.where((bb & 64) > 0, MM, MI))
        nxt = jnp.where(is_mm, mm_next,
              jnp.where(state == GD, gd_next,
              jnp.where(state == IM, im_next,
              jnp.where(state == DG, dg_next,
              jnp.where(state == MI, mi_next, STOP))))).astype(i32)
        di = (jnp.where(is_mm & ~border_ij, 1, 0)
              + jnp.where(((state == DG) | (state == MI)) & (i > 1), 1, 0))
        dj = (jnp.where(is_mm & ~border_ij, 1, 0)
              + jnp.where(((state == GD) | (state == IM)) & (j > 1), 1, 0))
        rec = (jnp.where(valid, state, 0).astype(jnp.int8), valid)
        i_n = jnp.where(valid, i - di, i)
        j_n = jnp.where(valid, j - dj, j)
        s_n = jnp.where(valid, nxt, STOP)
        return (i_n, j_n, s_n), rec

    st, n = _walk_chunked(step, i2, j2, kmax, B)

    def b8(x):
        return jax.lax.bitcast_convert_type(x, jnp.int8)

    header = jnp.concatenate(
        [b8(score.astype(jnp.float32)), b8(i2.astype(jnp.int16)),
         b8(j2.astype(jnp.int16)), b8(n)], axis=1)
    return jnp.concatenate([header, st.T], axis=1)


def _walk_chunked(step, i2, j2, kmax: int, B: int, chunk: int = 64):
    """Drive a walk ``step`` function for up to ``kmax`` steps with
    early exit: a while_loop over 64-step scan chunks that stops once
    every lane has reached STOP.  Device cost is per-INDEX (the gather
    floor), so skipping the dead tail after the longest real path cuts
    walk time proportionally — payloads are identical (unwritten slots
    stay zero, exactly what the full-length scan records for stopped
    lanes).  Returns (st (kmax, B) int8, n (B,) int32)."""
    import jax
    import jax.numpy as jnp

    i32 = jnp.int32
    nchunks = -(-kmax // chunk)
    kpad = nchunks * chunk

    def chunk_body(c):
        k, i, j, state, st, n = c
        (i, j, state), (rec, valid) = jax.lax.scan(
            step, (i, j, state), None, length=chunk)
        st = jax.lax.dynamic_update_slice(st, rec, (k * chunk,
                                                    jnp.int32(0)))
        n = n + valid.astype(i32).sum(axis=0)
        return (k + 1, i, j, state, st, n)

    def cond(c):
        k, _i, _j, state, _st, _n = c
        return (k < nchunks) & jnp.any(state != STOP)

    st0 = jnp.zeros((kpad, B), jnp.int8)
    init = (jnp.int32(0), i2.astype(i32), j2.astype(i32),
            jnp.full((B,), MM, i32), st0, jnp.zeros((B,), i32))
    _k, _i, _j, _s, st, n = jax.lax.while_loop(cond, chunk_body, init)
    return st[:kmax], n


@functools.partial(
    __import__("jax").jit, static_argnames=("kmax",))
def _backtrace_walk_packed8(bt, i2, j2, score, kmax):
    """Minimal-payload walk: ONE int8 array per batch of
    [score(4B) i2(2B) j2(2B) n(2B) pad(2B) st[kmax](1B each)] per lane.

    The (ii, jj) step positions are NOT shipped: for every recorded
    step the walk's move is purely state-determined (MM: -1,-1;
    GD/IM: 0,-1; DG/MI: -1,0 — a border-blocked move forces STOP so
    the next step is never recorded), so the host reconstructs them
    from (i2, j2) + the state bytes with a cumsum.  Cuts the
    device->host transfer ~12x vs the f32 packing (the tunneled-TPU
    link is bandwidth-bound on these fetches)."""
    import jax
    import jax.numpy as jnp

    bt = jnp.asarray(bt)
    B, Li, Wj = bt.shape
    btf = bt.reshape(B, Li * Wj).astype(jnp.int32)
    i32 = jnp.int32

    def step(carry, _):
        i, j, state = carry
        valid = state != STOP
        b = jnp.take_along_axis(btf, (i * Wj + j)[:, None], axis=1)[:, 0]
        is_mm = state == MM
        border_ij = (i <= 1) | (j <= 1)
        mm_next = jnp.where(border_ij, STOP, b & 7)
        gd_next = jnp.where(j <= 1, STOP,
                            jnp.where((b & 8) > 0, MM, GD))
        im_next = jnp.where(j <= 1, STOP,
                            jnp.where((b & 16) > 0, MM, IM))
        dg_next = jnp.where(i <= 1, STOP,
                            jnp.where((b & 32) > 0, MM, DG))
        mi_next = jnp.where(i <= 1, STOP,
                            jnp.where((b & 64) > 0, MM, MI))
        nxt = jnp.where(is_mm, mm_next,
              jnp.where(state == GD, gd_next,
              jnp.where(state == IM, im_next,
              jnp.where(state == DG, dg_next,
              jnp.where(state == MI, mi_next, STOP))))).astype(i32)
        di = (jnp.where(is_mm & ~border_ij, 1, 0)
              + jnp.where(((state == DG) | (state == MI)) & (i > 1), 1, 0))
        dj = (jnp.where(is_mm & ~border_ij, 1, 0)
              + jnp.where(((state == GD) | (state == IM)) & (j > 1), 1, 0))
        rec = (jnp.where(valid, state, 0).astype(jnp.int8), valid)
        i_n = jnp.where(valid, i - di, i)
        j_n = jnp.where(valid, j - dj, j)
        s_n = jnp.where(valid, nxt, STOP)
        return (i_n, j_n, s_n), rec

    st, n = _walk_chunked(step, i2, j2, kmax, B)

    def b8(x):
        return jax.lax.bitcast_convert_type(x, jnp.int8)

    header = jnp.concatenate(
        [b8(score.astype(jnp.float32)), b8(i2.astype(jnp.int16)),
         b8(j2.astype(jnp.int16)), b8(n)], axis=1)
    return jnp.concatenate([header, st.T], axis=1)


def backtrace_walk_unpack8(packed, kmax):
    """Fetch + unpack the int8 walk: positions rebuilt on host from
    the state bytes (see _backtrace_walk_packed8)."""
    packed = np.ascontiguousarray(np.asarray(packed))
    sc_v = packed[:, 0:4].copy().view(np.float32)[:, 0]
    i2_v = packed[:, 4:6].copy().view(np.int16)[:, 0].astype(np.int32)
    j2_v = packed[:, 6:8].copy().view(np.int16)[:, 0].astype(np.int32)
    n = packed[:, 8:12].copy().view(np.int32)[:, 0]
    nmax = int(n.max()) if n.size else 0
    st = packed[:, 12: 12 + max(nmax, 1)]
    di = ((st == MM) | (st == DG) | (st == MI)).astype(np.int32)
    dj = ((st == MM) | (st == GD) | (st == IM)).astype(np.int32)
    ii = i2_v[:, None] - np.cumsum(di, axis=1) + di
    jj = j2_v[:, None] - np.cumsum(dj, axis=1) + dj
    kidx = np.arange(st.shape[1])[None, :]
    matched = ((st == MM) & (kidx < n[:, None])).sum(axis=1)

    def unpack(b):
        nb = int(n[b])
        i_steps = np.zeros(nb + 1, dtype=np.int32)
        j_steps = np.zeros(nb + 1, dtype=np.int32)
        states = np.zeros(nb + 1, dtype=np.int8)
        i_steps[1:] = ii[b, :nb]
        j_steps[1:] = jj[b, :nb]
        states[1:] = st[b, :nb]
        if nb:
            states[nb] = MM
        return i_steps, j_steps, states, int(matched[b])

    unpack.score = sc_v
    unpack.i2 = i2_v
    unpack.j2 = j2_v
    return unpack


class DecodedBatch:
    """Arrays from the native batched walk decode (one per lane, with a
    leading zero column so per-hit slices [:n+1] match the step arrays
    backtrace_walk_unpack8's unpack(b) built)."""

    __slots__ = ("score", "sc_ss", "i2", "j2", "n", "matched",
                 "ii2", "jj2", "st2", "S2", "zss")


def decode_rescore_native(packed_np, kmax: int, q_p, t_ps, corr: float,
                          nat, pnul=None) -> DecodedBatch:
    """Run native vit_decode_rescore over a fetched walk payload.

    ``packed_np``: (B, 12+kmax) int8 host array; ``t_ps``: one (Lt+2, 20)
    float32 profile array per REAL lane.  Returns per-lane final scores
    (with the correlation term), matched counts and (B, nmax+1) path
    arrays whose per-lane slices are bit-identical to the Python
    decode loop's outputs (see the C source for the parity contract)."""
    from .. import fastmath as fm

    B = packed_np.shape[0]
    Breal = len(t_ps)
    n_hdr = packed_np[:Breal, 8:12].copy().view(np.int32)[:, 0]
    nmax = int(n_hdr.max()) if Breal else 0
    # clamp like the C side: a corrupt header must not size allocations
    K1 = min(max(nmax, 0), int(kmax)) + 1
    d = DecodedBatch()
    d.ii2 = np.zeros((B, K1), np.int32)
    d.jj2 = np.zeros((B, K1), np.int32)
    d.st2 = np.zeros((B, K1), np.int8)
    d.S2 = np.zeros((B, K1), np.float32)
    d.zss = np.zeros(K1, np.float32)
    d.score = np.zeros(B, np.float32)
    d.sc_ss = np.zeros(B, np.float32)
    d.n = np.zeros(B, np.int32)
    d.matched = np.zeros(B, np.int32)
    d.i2 = np.zeros(B, np.int32)
    d.j2 = np.zeros(B, np.int32)
    lg2, diff = fm._fast_log2_tables()
    qp32 = np.ascontiguousarray(q_p, dtype=np.float32)
    tps32 = [np.ascontiguousarray(t, dtype=np.float32) for t in t_ps]
    args = [packed_np, int(kmax), int(Breal), qp32, tps32,
            float(np.float32(corr)), lg2, diff,
            d.ii2, d.jj2, d.st2, d.S2, d.score, d.sc_ss,
            d.n, d.matched, d.i2, d.j2]
    if pnul is not None:
        args.append(np.ascontiguousarray(pnul, dtype=np.float32))
    nat.vit_decode_rescore(*args)
    return d


def band_intervals(pi, pj, W: int, Lq: int, Lt: int, n_i: int, n_j: int):
    """Per-column / per-row ±W band intervals around a monotone path —
    the compact form of :func:`exclude_alignment_mask`'s region.  A cell
    (i, j) is inside the band iff lo_c[j] <= i <= hi_c[j] or
    lo_r[i] <= j <= hi_r[i].  Empty intervals encode as (1, 0).
    Returns int32 arrays lo_c, hi_c (n_j,), lo_r, hi_r (n_i,)."""
    pi = np.asarray(pi, dtype=np.int64)
    pj = np.asarray(pj, dtype=np.int64)
    from ..native import load as _load_native

    nat = _load_native()
    if nat is not None and hasattr(nat, "band_intervals"):
        lo_c = np.empty(n_j, np.int32)
        hi_c = np.empty(n_j, np.int32)
        lo_r = np.empty(n_i, np.int32)
        hi_r = np.empty(n_i, np.int32)
        nat.band_intervals(np.ascontiguousarray(pi),
                           np.ascontiguousarray(pj), W, Lq, Lt,
                           lo_c, hi_c, n_j, lo_r, hi_r, n_i)
        return lo_c, hi_c, lo_r, hi_r
    BIG = np.int64(1 << 60)
    min_i = np.full(n_j, BIG, np.int64)
    max_i = np.full(n_j, -1, np.int64)
    np.minimum.at(min_i, pj, pi)
    np.maximum.at(max_i, pj, pi)
    valid = max_i >= 0
    lo_c = np.where(valid, np.maximum(1, min_i - W), 1).astype(np.int32)
    hi_c = np.where(valid, np.minimum(Lq, max_i + W), 0).astype(np.int32)
    min_j = np.full(n_i, BIG, np.int64)
    max_j = np.full(n_i, -1, np.int64)
    np.minimum.at(min_j, pi, pj)
    np.maximum.at(max_j, pi, pj)
    valid = max_j >= 0
    lo_r = np.where(valid, np.maximum(1, min_j - W), 1).astype(np.int32)
    hi_r = np.where(valid, np.minimum(Lt, max_j + W), 0).astype(np.int32)
    return lo_c, hi_c, lo_r, hi_r


@functools.partial(__import__("jax").jit, static_argnames=())
def exclusion_mask_device(lo_c, hi_c, lo_r, hi_r):
    """Build the (B, Li, Wj) bool cell-off mask ON DEVICE from per-path
    band intervals (lo_c/hi_c (B, P, Wj), lo_r/hi_r (B, P, Li)).

    The altali exclusion masks are O(B*Lq*Lt) bools — ~170 MB per
    batch — but are fully determined by O(B*P*(Lq+Lt)) intervals, so
    shipping intervals and broadcasting on device replaces the largest
    host->device transfer of the search funnel."""
    import jax.numpy as jnp

    B, P, Wj = lo_c.shape
    Li = lo_r.shape[2]
    i_idx = jnp.arange(Li, dtype=jnp.int32)[None, :, None]
    j_idx = jnp.arange(Wj, dtype=jnp.int32)[None, None, :]
    mask = jnp.zeros((B, Li, Wj), bool)
    for p in range(P):      # static; P <= altali-1 <= 3
        col = ((i_idx >= lo_c[:, p, None, :])
               & (i_idx <= hi_c[:, p, None, :]))
        row = ((j_idx >= lo_r[:, p, :, None])
               & (j_idx <= hi_r[:, p, :, None]))
        mask = mask | col | row
    return mask


def backtrace_walk_dispatch(bt, i2, j2, score, kmax):
    """Dispatch the device backtrace walk WITHOUT blocking: returns the
    device-resident packed array for :func:`backtrace_walk_unpack`.
    Callers queue several batches before fetching any result, so the
    per-fetch link latency overlaps the next batch's compute."""
    return _backtrace_walk_packed(bt, i2, j2, score, kmax=kmax)


def backtrace_walk_unpack(packed, kmax):
    """Fetch + unpack a packed device walk (one transfer per batch);
    returns the same unpack callable as :func:`backtrace_walk_host`."""
    packed = np.asarray(packed)
    sc_v = packed[:, 0]
    i2_v = packed[:, 1].astype(np.int32)
    j2_v = packed[:, 2].astype(np.int32)
    n = packed[:, 3].astype(np.int32)
    matched = packed[:, 4].astype(np.int32)
    st = packed[:, 5: 5 + kmax].astype(np.int8)
    ii = packed[:, 5 + kmax: 5 + 2 * kmax].astype(np.int32)
    jj = packed[:, 5 + 2 * kmax: 5 + 3 * kmax].astype(np.int32)

    def unpack(b):
        nb = int(n[b])
        i_steps = np.zeros(nb + 1, dtype=np.int32)
        j_steps = np.zeros(nb + 1, dtype=np.int32)
        states = np.zeros(nb + 1, dtype=np.int8)
        i_steps[1:] = ii[b, :nb]
        j_steps[1:] = jj[b, :nb]
        states[1:] = st[b, :nb]
        if nb:
            states[nb] = MM
        return i_steps, j_steps, states, int(matched[b])

    unpack.score = sc_v
    unpack.i2 = i2_v
    unpack.j2 = j2_v
    return unpack


def backtrace_walk_host(bt, i2, j2, kmax, score=None):
    """Run :func:`backtrace_walk` and unpack lane ``b`` results in the
    exact format of the scalar :func:`backtrace` (leading placeholder
    0, end->start order, last state overwritten to MM).

    With ``score`` given, all outputs (including score/i2/j2) cross
    the device->host link as one packed array; the unpack callable
    then grows ``.score``, ``.i2``, ``.j2`` numpy attributes."""
    if score is not None:
        packed = np.asarray(_backtrace_walk_packed(bt, i2, j2, score,
                                                   kmax=kmax))
        sc_v = packed[:, 0]
        i2_v = packed[:, 1].astype(np.int32)
        j2_v = packed[:, 2].astype(np.int32)
        n = packed[:, 3].astype(np.int32)
        matched = packed[:, 4].astype(np.int32)
        st = packed[:, 5: 5 + kmax].astype(np.int8)
        ii = packed[:, 5 + kmax: 5 + 2 * kmax].astype(np.int32)
        jj = packed[:, 5 + 2 * kmax: 5 + 3 * kmax].astype(np.int32)

        def unpack(b):
            nb = int(n[b])
            i_steps = np.zeros(nb + 1, dtype=np.int32)
            j_steps = np.zeros(nb + 1, dtype=np.int32)
            states = np.zeros(nb + 1, dtype=np.int8)
            i_steps[1:] = ii[b, :nb]
            j_steps[1:] = jj[b, :nb]
            states[1:] = st[b, :nb]
            if nb:
                states[nb] = MM
            return i_steps, j_steps, states, int(matched[b])

        unpack.score = sc_v
        unpack.i2 = i2_v
        unpack.j2 = j2_v
        return unpack
    st, ii, jj, n, matched = backtrace_walk(bt, i2, j2, kmax)
    st = np.asarray(st)
    ii = np.asarray(ii)
    jj = np.asarray(jj)
    n = np.asarray(n)
    matched = np.asarray(matched)

    def unpack(b):
        nb = int(n[b])
        i_steps = np.zeros(nb + 1, dtype=np.int32)
        j_steps = np.zeros(nb + 1, dtype=np.int32)
        states = np.zeros(nb + 1, dtype=np.int8)
        i_steps[1:] = ii[b, :nb]
        j_steps[1:] = jj[b, :nb]
        states[1:] = st[b, :nb]
        if nb:
            states[nb] = MM   # first state set to MM (reference quirk)
        return i_steps, j_steps, states, int(matched[b])

    return unpack


# ------------------------------------------------------------------ host ----

def backtrace(bt: np.ndarray, start_i: int, start_j: int):
    """Scalar backtrace over one lane's byte matrix
    (src/hhviterbi.cpp:83-160).

    Returns (i_steps, j_steps, states, matched_cols); step arrays are
    1-based like the reference (index 0 unused), ordered end->start.
    """
    i, j = int(start_i), int(start_j)
    i_steps = [0]
    j_steps = [0]
    states = [0]
    state = MM
    matched_cols = 0
    while state != STOP:
        states.append(state)
        i_steps.append(i)
        j_steps.append(j)
        b = int(bt[i, j])
        if state == MM:
            matched_cols += 1
            if i <= 1 or j <= 1:
                state = STOP
            else:
                state = b & 0x07
                i -= 1
                j -= 1
        elif state == GD:
            if j <= 1:
                state = STOP
            else:
                if b & 8:
                    state = MM
                j -= 1
        elif state == IM:
            if j <= 1:
                state = STOP
            else:
                if b & 16:
                    state = MM
                j -= 1
        elif state == DG:
            if i <= 1:
                state = STOP
            else:
                if b & 32:
                    state = MM
                i -= 1
        elif state == MI:
            if i <= 1:
                state = STOP
            else:
                if b & 64:
                    state = MM
                i -= 1
        else:
            state = STOP
    states[len(states) - 1] = MM  # first state set to MM (reference quirk)
    return (np.array(i_steps, dtype=np.int32),
            np.array(j_steps, dtype=np.int32),
            np.array(states, dtype=np.int8),
            matched_cols)


def exclude_alignment_mask(cell_off: np.ndarray, i_steps, j_steps, Lq, Lt):
    """Cross out cells around a previous alignment path
    (src/hhviterbi.cpp:61-77, VITERBI_PATH_WIDTH=40); vectorized over
    the path (per column the step rows are contiguous, so the union of
    ±W windows is [min_i - W, max_i + W], and transposed for rows)."""
    from ..search.posterior import _band_set

    _band_set(cell_off, np.asarray(i_steps)[1:], np.asarray(j_steps)[1:],
              40, Lq, Lt, True)
    return cell_off
