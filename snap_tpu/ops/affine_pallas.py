"""Pallas TPU kernel for the batched affine-gap extension scorer.

Same semantics as ops.affine.affine_extend (the AffineGapVectorized
computeScore equivalent, AffineGapVectorized.h:821-1345 — see that
module's docstring for the recurrences); the whole per-candidate DP
runs in one kernel with every state plane resident in VMEM. The jnp
version round-trips ~6 [N, L] arrays through HBM for each of the T
text rows, which makes it HBM-latency-bound.

Layout mirrors ops.dp_pallas: candidates along sublanes (R per grid
step), pattern columns along lanes. The per-row text base comes from a
rolling register (column 0, then rotate left); the in-row insertion
(F) recurrence is a max-plus prefix scan by lane doubling with the run
start column packed into the low bits so ties prefer the later start,
exactly like the jnp associative_scan combine.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..constants import (
    AG_GAP_EXTEND,
    AG_GAP_OPEN,
    AG_MATCH,
    AG_MISMATCH,
)
from .affine import (
    ExtendResult,
    LOG_GAP_EXTEND,
    LOG_GAP_OPEN,
    NEG_F,
    NEG_I,
    _pack,
    finish_extend,
)

COL_BITS = 8  # lane index fits (LP <= 256)


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _kernel(jc_ref, pat_ref, logq_ref, plen_ref, text_ref, tlen_ref,
            sinit_ref, out_i_ref, out_f_ref, T: int, L: int,
            MATCH: int, SUB: int, OPEN: int, EXT: int):
    R, LP = pat_ref.shape
    jcols = jc_ref[:]                    # [R, LP] 0..LP-1
    pattern = pat_ref[:]
    pat_logq = logq_ref[:]
    plen = plen_ref[:, 0:1]
    tlen = tlen_ref[:, 0:1]
    score_init = sinit_ref[:, 0:1]
    in_pat = jcols < plen

    h_prev = jnp.maximum(jnp.int32(0), score_init - OPEN - jcols * EXT)
    h_prev = jnp.where(in_pat, h_prev, NEG_I)
    hlp_prev = LOG_GAP_OPEN + jcols.astype(jnp.float32) * LOG_GAP_EXTEND
    hct_prev = _pack(jnp.int32(0), jcols + 1, jnp.int32(0))
    e = jnp.zeros((R, LP), jnp.int32)
    elp = jnp.full((R, LP), NEG_F, jnp.float32)
    ect = jnp.zeros((R, LP), jnp.int32)

    last_col = jnp.maximum(plen - 1, jnp.int32(0))  # [R, 1]

    best_g = jnp.full((R, 1), -1, jnp.int32)
    best_g_row = jnp.zeros((R, 1), jnp.int32)
    best_g_lp = jnp.full((R, 1), NEG_F, jnp.float32)
    best_g_ct = jnp.zeros((R, 1), jnp.int32)
    best_l = jnp.full((R, 1), -1, jnp.int32)
    best_l_row = jnp.zeros((R, 1), jnp.int32)
    best_l_col = jnp.zeros((R, 1), jnp.int32)
    best_l_lp = jnp.full((R, 1), NEG_F, jnp.float32)
    best_l_ct = jnp.zeros((R, 1), jnp.int32)

    text_reg = text_ref[:]               # rolling: column 0 = current row

    def shift_right(x, sh, fill):
        head = jnp.full((R, sh), fill, x.dtype)
        return jnp.concatenate([head, x[:, :-sh]], axis=1)

    def rot_left1(x):
        return jnp.concatenate([x[:, 1:], x[:, :1]], axis=1)

    def row(i, state):
        (h_prev, hlp_prev, hct_prev, e, elp, ect,
         best_g, best_g_row, best_g_lp, best_g_ct,
         best_l, best_l_row, best_l_col, best_l_lp, best_l_ct,
         text_reg) = state

        tb = text_reg[:, 0:1]            # [R, 1]
        text_reg = rot_left1(text_reg)

        is_n = (tb >= 4) | (pattern >= 4)
        eq = tb == pattern
        s = jnp.where(
            is_n, jnp.int32(-1),
            jnp.where(eq, jnp.int32(MATCH), jnp.int32(-SUB)),
        )
        mism = ~eq

        is0 = i == jnp.int32(0)
        h_init = jnp.where(
            is0, score_init,
            jnp.maximum(jnp.int32(0), score_init - OPEN - (i - 1) * EXT),
        )  # [R, 1]
        hlp_init = jnp.where(
            is0,
            jnp.float32(0.0),
            LOG_GAP_OPEN
            + jnp.maximum(i - 1, jnp.int32(0)).astype(jnp.float32)
            * LOG_GAP_EXTEND,
        )
        hct_init = jnp.where(
            is0, jnp.int32(0),
            _pack(jnp.int32(0), jnp.int32(0), i),
        )

        at0 = jcols == jnp.int32(0)
        hdiag = jnp.where(at0, h_init, shift_right(h_prev, 1, NEG_I))
        hdlp = jnp.where(at0, hlp_init, shift_right(hlp_prev, 1, NEG_F))
        hdct = jnp.where(
            at0, hct_init, shift_right(hct_prev, 1, jnp.int32(0))
        )

        m = jnp.where(hdiag > 0, hdiag + s, jnp.int32(0))
        mlp = hdlp + jnp.where(mism, pat_logq, jnp.float32(0.0))
        mct = hdct + jnp.where(
            mism, jnp.int32(_pack(1, 0, 0)), jnp.int32(0)
        )

        # F: max-plus inclusive scan of adj = max(M-OPEN,0) + j*EXT with
        # ties preferring the later run start; pack (adj, j) into int32
        t_ins = jnp.maximum(m - OPEN, jnp.int32(0))
        adj = t_ins + jcols * EXT
        cb = jnp.int32(COL_BITS)
        v = (jnp.minimum(adj, jnp.int32(1 << 22)) << cb) | jcols
        lp = mlp + LOG_GAP_OPEN
        ct = mct
        sh = 1
        while sh < LP:
            v_s = shift_right(v, sh, jnp.int32(-(1 << 30)))
            lp_s = shift_right(lp, sh, NEG_F)
            ct_s = shift_right(ct, sh, jnp.int32(0))
            take = v_s > v  # packed ties impossible (j unique)
            v = jnp.where(take, v_s, v)
            lp = jnp.where(take, lp_s, lp)
            ct = jnp.where(take, ct_s, ct)
            sh <<= 1
        cum_v = v >> cb
        cum_j = v & jnp.int32((1 << COL_BITS) - 1)
        pv = shift_right(cum_v, 1, NEG_I)
        pj = shift_right(cum_j, 1, jnp.int32(0))
        plp = shift_right(lp, 1, NEG_F)
        pct = shift_right(ct, 1, jnp.int32(0))
        f = jnp.where(at0, NEG_I, pv - (jcols - 1) * EXT)
        run_m1 = jnp.where(at0, jnp.int32(0), jcols - pj - 1)
        flp = jnp.where(at0, NEG_F, plp) + run_m1.astype(
            jnp.float32
        ) * LOG_GAP_EXTEND
        fct = jnp.where(at0, jnp.int32(0), pct) + jnp.where(
            jcols > 0, _pack(jnp.int32(0), run_m1 + 1, jnp.int32(0)),
            jnp.int32(0)
        )

        take_e = e > m
        h = jnp.where(take_e, e, m)
        hlp = jnp.where(take_e, elp, mlp)
        hct = jnp.where(take_e, ect, mct)
        take_f = f > h
        h = jnp.where(take_f, f, h)
        hlp = jnp.where(take_f, flp, hlp)
        hct = jnp.where(take_f, fct, hct)
        h = jnp.where(in_pat, h, NEG_I)

        e_ext = e - EXT
        t_del = jnp.maximum(m - OPEN, jnp.int32(0))
        take_ext = e_ext > t_del
        e_new = jnp.where(take_ext, e_ext, t_del)
        elp_new = jnp.where(
            take_ext, elp + LOG_GAP_EXTEND, mlp + LOG_GAP_OPEN
        )
        ect_new = jnp.where(take_ext, ect, mct) + jnp.int32(_pack(0, 0, 1))

        row_live = i < tlen  # [R, 1]

        # global readout at column plen-1 (mask + reduce: no dynamic
        # lane indexing on TPU)
        at_last = jcols == last_col
        g = jnp.sum(jnp.where(at_last, h, jnp.int32(0)), axis=1,
                    keepdims=True,
                    dtype=jnp.int32)
        glp = jnp.sum(jnp.where(at_last, hlp, jnp.float32(0.0)), axis=1,
                      keepdims=True)
        gct = jnp.sum(jnp.where(at_last, hct, jnp.int32(0)), axis=1,
                      keepdims=True,
                      dtype=jnp.int32)
        upd_g = row_live & (g >= best_g)
        best_g = jnp.where(upd_g, g, best_g)
        best_g_row = jnp.where(upd_g, i, best_g_row)
        best_g_lp = jnp.where(upd_g, glp, best_g_lp)
        best_g_ct = jnp.where(upd_g, gct, best_g_ct)

        hm = jnp.where(in_pat, h, NEG_I)
        rowmax = jnp.max(hm, axis=1, keepdims=True)
        colmax = jnp.max(
            jnp.where(hm == rowmax, jcols, jnp.int32(-1)), axis=1,
            keepdims=True
        )
        at_cm = jcols == colmax
        l_lp = jnp.sum(jnp.where(at_cm, hlp, jnp.float32(0.0)), axis=1,
                       keepdims=True)
        l_ct = jnp.sum(jnp.where(at_cm, hct, jnp.int32(0)), axis=1,
                       keepdims=True,
                       dtype=jnp.int32)
        upd_l = row_live & (rowmax > best_l)
        best_l = jnp.where(upd_l, rowmax, best_l)
        best_l_row = jnp.where(upd_l, i, best_l_row)
        best_l_col = jnp.where(upd_l, colmax, best_l_col)
        best_l_lp = jnp.where(upd_l, l_lp, best_l_lp)
        best_l_ct = jnp.where(upd_l, l_ct, best_l_ct)

        h = jnp.where(row_live, h, h_prev)
        hlp = jnp.where(row_live, hlp, hlp_prev)
        hct = jnp.where(row_live, hct, hct_prev)
        e_new = jnp.where(row_live, e_new, e)
        elp_new = jnp.where(row_live, elp_new, elp)
        ect_new = jnp.where(row_live, ect_new, ect)

        return (h, hlp, hct, e_new, elp_new, ect_new,
                best_g, best_g_row, best_g_lp, best_g_ct,
                best_l, best_l_row, best_l_col, best_l_lp, best_l_ct,
                text_reg)

    state = (h_prev, hlp_prev, hct_prev, e, elp, ect,
             best_g, best_g_row, best_g_lp, best_g_ct,
             best_l, best_l_row, best_l_col, best_l_lp, best_l_ct,
             text_reg)
    state = jax.lax.fori_loop(jnp.int32(0), jnp.int32(T), row, state)
    (best_g, best_g_row, best_g_lp, best_g_ct,
     best_l, best_l_row, best_l_col, best_l_lp, best_l_ct) = state[6:15]

    out_i_ref[:, 0:1] = best_g
    out_i_ref[:, 1:2] = best_g_row
    out_i_ref[:, 2:3] = best_g_ct
    out_i_ref[:, 3:4] = best_l
    out_i_ref[:, 4:5] = best_l_row
    out_i_ref[:, 5:6] = best_l_col
    out_i_ref[:, 6:7] = best_l_ct
    out_f_ref[:, 0:1] = best_g_lp
    out_f_ref[:, 1:2] = best_l_lp


def affine_extend_pallas(
    pattern: jax.Array,    # [N, L] uint8 codes
    pat_logq: jax.Array,   # [N, L] f32 ln P(error)
    plen: jax.Array,       # [N] i32
    text: jax.Array,       # [N, T] uint8 codes
    tlen: jax.Array,       # [N] i32
    score_init: jax.Array, # [N] i32
    end_bonus: jax.Array,  # [N] i32
    interpret: bool | None = None,
    match: int = AG_MATCH,       # -gm/-gs/-go/-ge penalties
    sub: int = AG_MISMATCH,
    gap_open: int = AG_GAP_OPEN,
    gap_extend: int = AG_GAP_EXTEND,
) -> ExtendResult:
    """Drop-in Pallas replacement for ops.affine.affine_extend."""
    N, L = pattern.shape
    T = text.shape[1]
    LP = _round_up(L, 128)
    TP = _round_up(T, 128)
    R = 32
    NP = _round_up(max(N, R), R)

    if interpret is None:
        interpret = jax.default_backend() == "cpu"

    import sys

    if sys.getrecursionlimit() < 100_000:
        sys.setrecursionlimit(100_000)

    def pad(a, rows, cols, fill):
        out = jnp.full((rows, cols), fill, a.dtype)
        return out.at[: a.shape[0], : a.shape[1]].set(a)

    pat_i = pad(pattern.astype(jnp.int32), NP, LP, 4)
    logq = pad(pat_logq.astype(jnp.float32), NP, LP, 0.0)
    plen_i = pad(plen.astype(jnp.int32)[:, None], NP, 1, 1)
    t = pad(text.astype(jnp.int32), NP, TP, 5)
    tlen_i = pad(tlen.astype(jnp.int32)[:, None], NP, 1, 0)
    sinit = pad(score_init.astype(jnp.int32)[:, None], NP, 1, 0)

    jc = jnp.broadcast_to(jnp.arange(LP, dtype=jnp.int32)[None, :], (R, LP))

    def _row0(i):
        return jnp.zeros_like(i), jnp.zeros_like(i)

    def _rowi(i):
        return i, jnp.zeros_like(i)

    out_i, out_f = pl.pallas_call(
        functools.partial(
            _kernel, T=T, L=L, MATCH=match, SUB=sub,
            OPEN=gap_open + gap_extend, EXT=gap_extend,
        ),
        grid=(NP // R,),
        in_specs=[
            pl.BlockSpec((R, LP), _row0, memory_space=pltpu.VMEM),
            pl.BlockSpec((R, LP), _rowi, memory_space=pltpu.VMEM),
            pl.BlockSpec((R, LP), _rowi, memory_space=pltpu.VMEM),
            pl.BlockSpec((R, 1), _rowi, memory_space=pltpu.VMEM),
            pl.BlockSpec((R, TP), _rowi, memory_space=pltpu.VMEM),
            pl.BlockSpec((R, 1), _rowi, memory_space=pltpu.VMEM),
            pl.BlockSpec((R, 1), _rowi, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((R, 128), _rowi, memory_space=pltpu.VMEM),
            pl.BlockSpec((R, 128), _rowi, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((NP, 128), jnp.int32),
            jax.ShapeDtypeStruct((NP, 128), jnp.float32),
        ],
        interpret=interpret,
    )(jc, pat_i, logq, plen_i, t, tlen_i, sinit)

    gi = out_i[:N]
    gf = out_f[:N]
    return finish_extend(
        gi[:, 0], gi[:, 1], gf[:, 0], gi[:, 2],
        gi[:, 3], gi[:, 4], gi[:, 5], gf[:, 1], gi[:, 6],
        plen.astype(jnp.int32), score_init.astype(jnp.int32),
        end_bonus.astype(jnp.int32),
        pat_logq=pat_logq.astype(jnp.float32),
    )
