"""Batched affine-gap extension scoring (Smith-Waterman-Gotoh variant).

Behavioral reference: SNAP's AffineGapVectorized<±1>::computeScore
(AffineGapVectorized.h:821-1345) — the aligner-side scorer used when a
candidate's Landau-Vishkin distance exceeds maxKForSameAlignment
(BaseAligner.cpp:1203-1290). Semantics preserved:

- scoring: match +1, mismatch -4, first gap base -(6+1), extension -1,
  any N/pad involvement -1 (ntTransitionMatrix, AffineGapVectorized.h:126);
- gaps open only from the M state (E/F recurrences use max(M-open, 0));
- H values floored at 0 against a scoreInit baseline (local-ish DP);
- leading pattern/text gaps charged from scoreInit
  (init rows, AffineGapVectorized.h:973-989, 1021-1027);
- global-vs-local end choice: the pattern tail is soft-clipped iff
  bestLocal >= bestGlobal + endBonus, where endBonus is the 5'/3' end
  bonus by strand (AffineGapVectorized.h:948-966, 1168-1175);
  global ties prefer the latest text row, local ties the earliest row
  and the largest pattern offset;
- match probability along the argmax path: per-mismatch phred error,
  per-gap-run open*extend^(len-1), (1-SNP_PROB)^nMatches, clipped tail
  charged as one gap run (AffineGapVectorized.h:1255-1331).

Instead of SNAP's backtrace, (log-prob, mismatch/ins/del counts) are
carried through the recurrences alongside the scores, following the
same tie rules — so no traceback storage is needed and the whole batch
is one fixed-shape wavefront. Farrar striping is pointless on TPU; the
in-row F recurrence is a max-plus prefix scan.
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import (
    AG_GAP_EXTEND,
    AG_GAP_OPEN,
    AG_MATCH,
    AG_MISMATCH,
    GAP_EXTEND_PROB,
    GAP_OPEN_PROB,
    SNP_PROB,
)

OPEN = AG_GAP_OPEN + AG_GAP_EXTEND  # first gap base cost (stored +extend)
EXT = AG_GAP_EXTEND
NEG_I = np.int32(-(1 << 29))
NEG_F = np.float32(-1e30)

LOG_GAP_OPEN = np.float32(math.log(GAP_OPEN_PROB))
LOG_GAP_EXTEND = np.float32(math.log(GAP_EXTEND_PROB))
LOG_PERFECT = np.float32(math.log(1.0 - SNP_PROB))

# packed counts: (mism << 20) | (ins << 10) | del
def _pack(mism, ins, dl):
    return (mism << 20) | (ins << 10) | dl


class ExtendResult(NamedTuple):
    score: jax.Array         # [N] i32 chosen alignment score (DP units)
    valid: jax.Array         # [N] bool (score > score_init)
    edits: jax.Array         # [N] i32 mismatches + gap bases
    log_prob: jax.Array      # [N] f32 ln match probability of this part
    pattern_clip: jax.Array  # [N] i32 soft-clipped pattern tail bases
    text_used: jax.Array     # [N] i32 text rows consumed by chosen alignment


def affine_extend(
    pattern: jax.Array,    # [N, L] uint8 codes
    pat_logq: jax.Array,   # [N, L] f32 ln P(error)
    plen: jax.Array,       # [N] i32 pattern length (0 => no extension)
    text: jax.Array,       # [N, T] uint8 codes
    tlen: jax.Array,       # [N] i32 usable text length
    score_init: jax.Array, # [N] i32
    end_bonus: jax.Array,  # [N] i32
    match: int = AG_MATCH,       # -gm/-gs/-go/-ge penalties
    sub: int = AG_MISMATCH,      # (AlignerOptions.cpp:702-768)
    gap_open: int = AG_GAP_OPEN,
    gap_extend: int = AG_GAP_EXTEND,
) -> ExtendResult:
    OPEN = gap_open + gap_extend
    EXT = gap_extend
    N, L = pattern.shape
    T = text.shape[1]
    jcols = jnp.arange(L, dtype=jnp.int32)[None, :]
    in_pat = jcols < plen[:, None]

    # --- row -1 init: leading pattern insertions from scoreInit ---
    h_prev = jnp.maximum(0, score_init[:, None] - OPEN - jcols * EXT)
    h_prev = jnp.where(in_pat, h_prev, NEG_I)
    hlp_prev = jnp.broadcast_to(
        LOG_GAP_OPEN + jcols.astype(jnp.float32) * LOG_GAP_EXTEND, (N, L)
    )
    hct_prev = jnp.broadcast_to(_pack(0, jcols + 1, 0), (N, L)).astype(jnp.int32)
    # E state (text-gap / deletion), per column
    e = jnp.zeros((N, L), dtype=jnp.int32)
    elp = jnp.full((N, L), NEG_F, dtype=jnp.float32)
    ect = jnp.zeros((N, L), dtype=jnp.int32)

    # M-state row storage for E/F updates (gaps open only from M)
    last_col = jnp.maximum(plen - 1, 0).astype(jnp.int64)[:, None]

    best_g = jnp.full((N,), -1, dtype=jnp.int32)
    best_g_row = jnp.zeros((N,), dtype=jnp.int32)
    best_g_lp = jnp.full((N,), NEG_F, dtype=jnp.float32)
    best_g_ct = jnp.zeros((N,), dtype=jnp.int32)

    best_l = jnp.full((N,), -1, dtype=jnp.int32)
    best_l_row = jnp.zeros((N,), dtype=jnp.int32)
    best_l_col = jnp.zeros((N,), dtype=jnp.int32)
    best_l_lp = jnp.full((N,), NEG_F, dtype=jnp.float32)
    best_l_ct = jnp.zeros((N,), dtype=jnp.int32)

    def max_scan_combine(x, y):
        xv, xl, xc, xj = x
        yv, yl, yc, yj = y
        take_y = yv >= xv  # ties prefer the later (larger l) run start
        return (
            jnp.where(take_y, yv, xv),
            jnp.where(take_y, yl, xl),
            jnp.where(take_y, yc, xc),
            jnp.where(take_y, yj, xj),
        )

    def row(i, state):
        (h_prev, hlp_prev, hct_prev, e, elp, ect,
         best_g, best_g_row, best_g_lp, best_g_ct,
         best_l, best_l_row, best_l_col, best_l_lp, best_l_ct) = state

        tb = jax.lax.dynamic_slice_in_dim(text, i, 1, axis=1)  # [N,1]
        # transition score
        is_n = (tb >= 4) | (pattern >= 4)
        eq = tb == pattern
        s = jnp.where(is_n, np.int32(-1),
                      jnp.where(eq, np.int32(match), np.int32(-sub)))
        # probability-model mismatch: code inequality (N==N is a match)
        mism = ~eq

        h_init = jnp.where(
            i == 0,
            score_init,
            jnp.maximum(0, score_init - OPEN - (i - 1) * EXT),
        )  # [N]
        hlp_init = jnp.broadcast_to(
            jnp.where(
                i == 0,
                np.float32(0.0),
                LOG_GAP_OPEN
                + jnp.maximum(i - 1, 0).astype(jnp.float32) * LOG_GAP_EXTEND,
            ),
            (N,),
        )
        hct_init = jnp.broadcast_to(
            jnp.where(i == 0, 0, _pack(0, 0, i)).astype(jnp.int32), (N,)
        )

        hdiag = jnp.concatenate([h_init[:, None], h_prev[:, :-1]], axis=1)
        hdlp = jnp.concatenate([hlp_init[:, None], hlp_prev[:, :-1]], axis=1)
        hdct = jnp.concatenate([hct_init[:, None], hct_prev[:, :-1]], axis=1)

        m = jnp.where(hdiag > 0, hdiag + s, 0)
        mlp = hdlp + jnp.where(mism, pat_logq, 0.0)
        mct = hdct + jnp.where(mism, _pack(1, 0, 0), 0)

        # F (insertion, within-row): F[j] = max_{l<j}(max(M[l]-OPEN,0) - (j-1-l)*EXT)
        t_ins = jnp.maximum(m - OPEN, 0)
        adj = t_ins + jcols * EXT
        cum_v, cum_lp, cum_ct, cum_j = jax.lax.associative_scan(
            max_scan_combine,
            (adj, mlp + LOG_GAP_OPEN, mct, jnp.broadcast_to(jcols, adj.shape)),
            axis=1,
        )
        f = jnp.concatenate(
            [jnp.full((N, 1), NEG_I, jnp.int32),
             cum_v[:, :-1] - (jcols[:, 1:] - 1) * EXT],
            axis=1,
        )
        run_m1 = jnp.concatenate(
            [jnp.zeros((N, 1), jnp.int32), jcols[:, 1:] - cum_j[:, :-1] - 1],
            axis=1,
        )
        flp = jnp.concatenate(
            [jnp.full((N, 1), NEG_F, jnp.float32), cum_lp[:, :-1]], axis=1
        ) + run_m1.astype(jnp.float32) * LOG_GAP_EXTEND
        fct = jnp.concatenate(
            [jnp.zeros((N, 1), jnp.int32), cum_ct[:, :-1]], axis=1
        ) + _pack(0, run_m1 + 1, 0) * (jcols > 0)

        # H = max(m, e, f); e wins only if > m; f wins only if > max(m, e)
        take_e = e > m
        h = jnp.where(take_e, e, m)
        hlp = jnp.where(take_e, elp, mlp)
        hct = jnp.where(take_e, ect, mct)
        take_f = f > h
        h = jnp.where(take_f, f, h)
        hlp = jnp.where(take_f, flp, hlp)
        hct = jnp.where(take_f, fct, hct)
        h = jnp.where(in_pat, h, NEG_I)

        # E update for next row: max(e - EXT, m - OPEN, 0); tie prefers open
        e_ext = e - EXT
        t_del = jnp.maximum(m - OPEN, 0)
        take_ext = e_ext > t_del
        e_new = jnp.where(take_ext, e_ext, t_del)
        elp_new = jnp.where(take_ext, elp + LOG_GAP_EXTEND, mlp + LOG_GAP_OPEN)
        ect_new = jnp.where(take_ext, ect, mct) + _pack(0, 0, 1)

        row_live = i < tlen  # [N]

        # global readout at column plen-1
        g = jnp.take_along_axis(h, last_col, axis=1)[:, 0]
        glp = jnp.take_along_axis(hlp, last_col, axis=1)[:, 0]
        gct = jnp.take_along_axis(hct, last_col, axis=1)[:, 0]
        upd_g = row_live & (g >= best_g)
        best_g = jnp.where(upd_g, g, best_g)
        best_g_row = jnp.where(upd_g, i, best_g_row)
        best_g_lp = jnp.where(upd_g, glp, best_g_lp)
        best_g_ct = jnp.where(upd_g, gct, best_g_ct)

        # local: max over valid columns; ties -> largest column
        hm = jnp.where(in_pat, h, NEG_I)
        rowmax = jnp.max(hm, axis=1)
        colmax = jnp.max(jnp.where(hm == rowmax[:, None], jcols, -1), axis=1)
        l_lp = jnp.take_along_axis(hlp, colmax.astype(jnp.int64)[:, None], axis=1)[:, 0]
        l_ct = jnp.take_along_axis(hct, colmax.astype(jnp.int64)[:, None], axis=1)[:, 0]
        upd_l = row_live & (rowmax > best_l)
        best_l = jnp.where(upd_l, rowmax, best_l)
        best_l_row = jnp.where(upd_l, i, best_l_row)
        best_l_col = jnp.where(upd_l, colmax, best_l_col)
        best_l_lp = jnp.where(upd_l, l_lp, best_l_lp)
        best_l_ct = jnp.where(upd_l, l_ct, best_l_ct)

        # freeze state for dead rows
        h = jnp.where(row_live[:, None], h, h_prev)
        hlp = jnp.where(row_live[:, None], hlp, hlp_prev)
        hct = jnp.where(row_live[:, None], hct, hct_prev)
        e_new = jnp.where(row_live[:, None], e_new, e)
        elp_new = jnp.where(row_live[:, None], elp_new, elp)
        ect_new = jnp.where(row_live[:, None], ect_new, ect)

        return (h, hlp, hct, e_new, elp_new, ect_new,
                best_g, best_g_row, best_g_lp, best_g_ct,
                best_l, best_l_row, best_l_col, best_l_lp, best_l_ct)

    state = (h_prev, hlp_prev.astype(jnp.float32),
             hct_prev.astype(jnp.int32), e, elp, ect,
             best_g, best_g_row, best_g_lp, best_g_ct,
             best_l, best_l_row, best_l_col, best_l_lp, best_l_ct)
    state = jax.lax.fori_loop(0, T, row, state)
    (_, _, _, _, _, _,
     best_g, best_g_row, best_g_lp, best_g_ct,
     best_l, best_l_row, best_l_col, best_l_lp, best_l_ct) = state

    return finish_extend(
        best_g, best_g_row, best_g_lp, best_g_ct,
        best_l, best_l_row, best_l_col, best_l_lp, best_l_ct,
        plen, score_init, end_bonus,
        pat_logq=pat_logq,
    )


def _hq_log_err() -> np.float32:
    """log-error threshold equivalent to the reference's raw-byte test
    qualityString[i] >= 65 (AffineGapVectorized.h:698): the phred
    table is monotone in the quality byte, so 'byte >= 65' is exactly
    'log error <= table[65]' (the table clamps, so this must come from
    the table, not from 10^-q/10)."""
    from ..constants import phred_to_probability_table

    return np.float32(math.log(phred_to_probability_table()[65]) + 1e-6)


HQ_LOG_ERR = _hq_log_err()


def finish_extend(
    best_g, best_g_row, best_g_lp, best_g_ct,
    best_l, best_l_row, best_l_col, best_l_lp, best_l_ct,
    plen, score_init, end_bonus,
    pat_logq=None,
) -> ExtendResult:
    """Global-vs-local choice + probability epilogue, shared between the
    jnp recurrence above and the Pallas kernel (ops.affine_pallas)."""
    # choose local iff different and local >= global + endBonus
    choose_local = (best_l != best_g) & (best_l >= best_g + end_bonus)
    if pat_logq is not None:
        # "Try not to clip high quality bases (>= 65) from the read"
        # (AffineGapVectorized.h:692-720): the clip boundary walks
        # right through consecutive high-quality bases; when that walk
        # reaches the end of the pattern the local clip is abandoned
        # and the full pattern is consumed (the bases surface as
        # indels/mismatches in the full-pattern readout). A walk that
        # stops early leaves the clip standing, so mixed-quality tails
        # still soft-clip exactly like the reference.
        N, L = pat_logq.shape
        pos = jnp.arange(L, dtype=jnp.int32)[None, :]
        hq = (pat_logq <= HQ_LOG_ERR) & (pos < plen[:, None])
        pre = jnp.cumsum(hq.astype(jnp.int32), axis=1)
        total = pre[:, -1]
        start = jnp.clip(best_l_col, 0, L - 1)
        before = jnp.where(
            start > 0,
            jnp.take_along_axis(
                pre, jnp.maximum(start - 1, 0)[:, None].astype(jnp.int64),
                axis=1,
            )[:, 0],
            0,
        )
        hq_from_col = total - before           # hq count in [col, plen)
        span = jnp.maximum(plen - start, 0)    # bases in [col, plen)
        all_hq_to_end = hq_from_col == span
        clip_len = jnp.maximum(plen - 1 - best_l_col, 0)
        choose_local = choose_local & ~(all_hq_to_end & (clip_len > 0))
    score = jnp.where(choose_local, best_l, best_g)
    row_used = jnp.where(choose_local, best_l_row, best_g_row)
    col_used = jnp.where(choose_local, best_l_col, jnp.maximum(plen - 1, 0))
    lp = jnp.where(choose_local, best_l_lp, best_g_lp)
    ct = jnp.where(choose_local, best_l_ct, best_g_ct)

    clip = plen - 1 - col_used  # soft-clipped pattern tail
    mismatches = ct >> 20
    ins = (ct >> 10) & 0x3FF
    dl = ct & 0x3FF
    consumed = plen - clip
    n_matches = jnp.maximum(consumed - mismatches - ins, 0)
    lp = lp + n_matches.astype(jnp.float32) * LOG_PERFECT
    # clipped tail charged as one indel run (AffineGapVectorized.h:1331)
    lp = lp + jnp.where(
        clip > 0,
        LOG_GAP_OPEN + jnp.maximum(clip - 1, 0).astype(jnp.float32) * LOG_GAP_EXTEND,
        0.0,
    )

    valid = score > score_init
    empty = plen <= 0
    return ExtendResult(
        score=jnp.where(empty, score_init, score),
        valid=valid | empty,
        edits=jnp.where(empty, 0, mismatches + ins + dl),
        log_prob=jnp.where(empty, 0.0, lp),
        pattern_clip=jnp.where(empty, 0, clip),
        text_used=jnp.where(empty, 0, row_used + 1),
    )
