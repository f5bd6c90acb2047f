"""Pallas TPU kernel for the batched fitting-alignment edit distance.

Same semantics as ops.dp.fitting_edit_distance (the LV-equivalent
scorer; see that module's docstring for the recurrences), but the whole
per-candidate DP runs inside one kernel invocation with all six state
rows resident in VMEM — the jnp version round-trips ~6 [N, W] arrays
through HBM for every one of the L pattern rows plus log2(W) extra
passes for the in-row scan, which makes it HBM-bound.

Layout: candidates along sublanes (R per grid step), text columns along
lanes (padded to a 128 multiple). The in-row min-plus deletion scan is
log-step doubling over the lane axis with the run-start column packed
into the low 8 bits of the cost so the scan carries (cost, col) in one
int32 plus a float32 log-prob alongside.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .dp import (
    DPResult,
    EDIT_UNIT,
    INDEL_BITS,
    LOG_GAP_EXTEND,
    LOG_GAP_OPEN,
    LOG_PERFECT,
    NEG,
    PINF,
)

STEP = np.int32(EDIT_UNIT + 1)      # one edit + one indel base
COST_OFF = np.int32(1 << 19)        # offset so packed costs stay positive
COL_BITS = 9                        # lane index fits (WP <= 512)
COL_MASK = np.int32((1 << COL_BITS) - 1)


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _kernel(jc_ref, pat_ref, logq_ref, plen_ref, text_ref,
            out_i_ref, out_f_ref, W: int, L: int,
            anchored: bool = False):
    # NB (Mosaic on this jax version): broadcasted_iota and pltpu.roll
    # fail to lower inside TC kernels, and dynamic lane slices are
    # unimplemented — so the column-index plane arrives as an input,
    # shifts are static-slice concats, and the per-row pattern base
    # comes from a rolling register (column 0, then rotate left).
    R, WP = text_ref.shape
    jcols = jc_ref[:]
    in_w = jcols <= jnp.int32(W)  # valid "text consumed" counts are 0..W

    if anchored:
        # seed-anchored LV (LandauVishkin.h:100): text start pinned at
        # column 0; leading deletion runs cost one edit per base
        m = jnp.where(in_w & (jcols == jnp.int32(0)), jnp.int32(0), PINF)
        d = jnp.where(
            in_w & (jcols > jnp.int32(0)), jcols * STEP, PINF
        )
        dlp = jnp.where(
            in_w & (jcols > jnp.int32(0)),
            jnp.float32(LOG_GAP_OPEN)
            + (jcols - jnp.int32(1)).astype(jnp.float32)
            * jnp.float32(LOG_GAP_EXTEND),
            NEG,
        )
    else:
        m = jnp.where(in_w, jnp.int32(0), PINF)
        d = jnp.full((R, WP), PINF, jnp.int32)
        dlp = jnp.full((R, WP), NEG, jnp.float32)
    i_ = jnp.full((R, WP), PINF, jnp.int32)
    mlp = jnp.zeros((R, WP), jnp.float32)
    ilp = jnp.full((R, WP), NEG, jnp.float32)

    ans_c = jnp.full((R, 1), PINF, jnp.int32)
    ans_lp = jnp.full((R, 1), NEG, jnp.float32)
    ans_e = jnp.zeros((R, 1), jnp.int32)

    plen = plen_ref[:, 0:1]  # [R, 1]
    text = text_ref[:]       # [R, WP] int32 codes (5 = pad)
    pat_reg = pat_ref[:]     # rolling registers, column 0 = current row
    lq_reg = logq_ref[:]

    def shift_right(x, sh, fill):
        head = jnp.full((R, sh), fill, x.dtype)
        return jnp.concatenate([head, x[:, :-sh]], axis=1)

    def rot_left1(x):
        return jnp.concatenate([x[:, 1:], x[:, :1]], axis=1)

    def row(i, carry):
        (m, i_, d, mlp, ilp, dlp, ans_c, ans_lp, ans_e,
         pat_reg, lq_reg) = carry
        pb = pat_reg[:, 0:1]    # [R, 1] int32
        lq = lq_reg[:, 0:1]     # [R, 1] f32
        pat_reg = rot_left1(pat_reg)
        lq_reg = rot_left1(lq_reg)
        mism = text != pb
        # text column j holds base j-1 ("consumed j chars" convention):
        # compare against text shifted so lane j sees base j-1
        subp = jnp.where(mism, jnp.int32(EDIT_UNIT), jnp.int32(0))
        sublp = jnp.where(mism, lq, jnp.float32(0.0))

        # prev best across states, with log-prob carried by the same mask
        pb1 = jnp.minimum(m, i_)
        pl1 = jnp.where(m <= i_, mlp, ilp)
        prev = jnp.minimum(pb1, d)
        prevlp = jnp.where(pb1 <= d, pl1, dlp)

        m_new = shift_right(prev + subp, 1, PINF)
        mlp_new = shift_right(prevlp + sublp, 1, NEG)

        i_open = m + STEP
        i_ext = i_ + STEP
        take_ext = i_ext <= i_open
        i_new = jnp.where(take_ext, i_ext, i_open)
        ilp_new = jnp.where(
            take_ext, ilp + LOG_GAP_EXTEND, mlp + LOG_GAP_OPEN
        )

        # in-row deletion: D[j] = min_{l<j} mi[l] + (j-l)*STEP where
        # mi = min(M,I) of THIS row; min-plus prefix scan by doubling
        mi = jnp.minimum(m_new, i_new)
        milp = jnp.where(m_new <= i_new, mlp_new, ilp_new)
        adj = jnp.minimum(mi - jcols * STEP + COST_OFF, jnp.int32(1 << 20))
        adj = jnp.maximum(adj, jnp.int32(0))
        cb = jnp.int32(COL_BITS)
        v = (adj << cb) | jcols
        lp = milp
        sh = 1
        while sh < WP:
            v_s = shift_right(v, sh, jnp.int32(0x7FFFFFFF))
            lp_s = shift_right(lp, sh, NEG)
            take = v_s < v
            v = jnp.where(take, v_s, v)
            lp = jnp.where(take, lp_s, lp)
            sh <<= 1
        cum_cost = (v >> cb) - COST_OFF
        cum_col = v & COL_MASK
        pcost = shift_right(cum_cost, 1, PINF)
        pcol = shift_right(cum_col, 1, jnp.int32(0))
        plp = shift_right(lp, 1, NEG)
        d_new = pcost + jcols * STEP
        d_new = jnp.where(jcols == jnp.int32(0), PINF, d_new)
        dels_m1 = (jcols - pcol - jnp.int32(1)).astype(jnp.float32)
        dlp_new = jnp.where(
            jcols == jnp.int32(0),
            NEG,
            plp + LOG_GAP_OPEN + dels_m1 * LOG_GAP_EXTEND,
        )

        # harvest at the final pattern row of each candidate
        fin = jnp.where(in_w, jnp.minimum(m_new, i_new), PINF)
        finlp = jnp.where(m_new <= i_new, mlp_new, ilp_new)
        packed = jnp.minimum(fin + COST_OFF, jnp.int32(1 << 20))
        packed = (jnp.maximum(packed, jnp.int32(0)) << cb) | jcols
        best = jnp.min(packed, axis=1, keepdims=True)
        bcol = best & COL_MASK
        bcost = (best >> cb) - COST_OFF
        blp = jnp.sum(
            jnp.where(jcols == bcol, finlp, 0.0), axis=1, keepdims=True
        )
        is_last = plen == (jnp.asarray(i, jnp.int32) + jnp.int32(1))
        ans_c = jnp.where(is_last, bcost, ans_c)
        ans_lp = jnp.where(is_last, blp, ans_lp)
        ans_e = jnp.where(is_last, bcol, ans_e)

        return (m_new, i_new, d_new, mlp_new, ilp_new, dlp_new,
                ans_c, ans_lp, ans_e, pat_reg, lq_reg)

    carry = (m, i_, d, mlp, ilp, dlp, ans_c, ans_lp, ans_e,
             pat_reg, lq_reg)
    # int32 bounds: under jax_enable_x64 a Python-int bound makes the
    # loop index int64, which Mosaic cannot lower (64-bit unsupported)
    carry = jax.lax.fori_loop(jnp.int32(0), jnp.int32(L), row, carry)
    ans_c, ans_lp, ans_e = carry[6], carry[7], carry[8]

    out_i_ref[:, 0:1] = ans_c
    out_i_ref[:, 1:2] = ans_e
    out_f_ref[:, 0:1] = ans_lp


def fitting_edit_distance_pallas(
    pattern: jax.Array,    # [N, L] uint8 codes
    pat_logq: jax.Array,   # [N, L] float32
    plen: jax.Array,       # [N] int32
    text: jax.Array,       # [N, W] uint8 codes
    interpret: bool | None = None,
    anchored: bool = False,
) -> DPResult:
    """Drop-in Pallas replacement for ops.dp.fitting_edit_distance."""
    N, L = pattern.shape
    W = text.shape[1]
    WP = _round_up(W + 1, 128)
    LP = _round_up(L, 128)
    R = 32  # candidates per grid step
    NP = _round_up(max(N, R), R)

    if interpret is None:
        interpret = jax.default_backend() == "cpu"

    # Mosaic lowering of the doubled-scan body recurses deeply
    import sys

    if sys.getrecursionlimit() < 100_000:
        sys.setrecursionlimit(100_000)

    def pad(a, rows, cols, fill):
        out = jnp.full((rows, cols), fill, a.dtype)
        return out.at[: a.shape[0], : a.shape[1]].set(a)

    pat_i = pad(pattern.astype(jnp.int32), NP, LP, 4)
    logq = pad(pat_logq.astype(jnp.float32), NP, LP, 0.0)
    plen_i = pad(plen.astype(jnp.int32)[:, None], NP, 1, 1)
    # text occupies lanes 0..W-1; pad lanes hold code 5 (never matches)
    t = pad(text.astype(jnp.int32), NP, WP, 5)

    jc = jnp.broadcast_to(
        jnp.arange(WP, dtype=jnp.int32)[None, :], (R, WP)
    )

    # index maps must not return Python ints: under jax_enable_x64 they
    # trace as i64 scalars and Mosaic cannot legalize the i64 returns
    def _row0(i):
        return jnp.zeros_like(i), jnp.zeros_like(i)

    def _rowi(i):
        return i, jnp.zeros_like(i)

    grid = (NP // R,)
    out_i, out_f = pl.pallas_call(
        functools.partial(_kernel, W=W, L=L, anchored=anchored),
        grid=grid,
        in_specs=[
            pl.BlockSpec((R, WP), _row0, memory_space=pltpu.VMEM),
            pl.BlockSpec((R, LP), _rowi, memory_space=pltpu.VMEM),
            pl.BlockSpec((R, LP), _rowi, memory_space=pltpu.VMEM),
            pl.BlockSpec((R, 1), _rowi, memory_space=pltpu.VMEM),
            pl.BlockSpec((R, WP), _rowi, memory_space=pltpu.VMEM),
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
    )(jc, pat_i, logq, plen_i, t)

    packed = out_i[:N, 0]
    end_col = out_i[:N, 1]
    lp = out_f[:N, 0]
    dist = packed >> INDEL_BITS
    indels = packed & np.int32(EDIT_UNIT - 1)
    log_prob = lp + (plen - dist).astype(jnp.float32) * np.float32(
        LOG_PERFECT
    )
    return DPResult(
        dist=dist, log_prob=log_prob, end_col=end_col, indels=indels
    )
