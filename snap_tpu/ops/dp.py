"""Batched fitting-alignment edit-distance DP with match probability.

This is the TPU-native replacement for SNAP's Landau-Vishkin scorer
(LandauVishkin.h:100 computeEditDistance). Semantics preserved:

- unit-cost edit distance of the (clipped) read against a reference
  window, with the read fully aligned and the placement within the
  window free (SNAP achieves the same effect by seeding LV at each
  candidate offset; the window form scores all nearby offsets at once,
  which also subsumes SNAP's 48bp nearby-candidate merge --
  BaseAligner.cpp:1353-1443 -- keep-best semantics);
- fewest-indels tie-break among minimum-edit paths
  (LandauVishkin.h:238-257) via a lexicographic packed (edits, indels)
  DP value;
- match probability along the chosen path
  (LandauVishkin.h:275-342): product of per-mismatch phred error
  probabilities, per-indel-run probabilities
  GAP_OPEN_PROB * GAP_EXTEND_PROB^(len-1), and the
  (1-SNP_PROB)^(len-edits) perfect-match prior. Run-based indel
  probability is reproduced exactly by a 3-state (M/I/D) DP where
  entering a gap state adds log(open) and staying adds log(extend).

Layout: everything is [N, W] tensors (N = batch of candidates, W =
window width); the row loop over pattern positions is a lax.fori_loop
of pure elementwise VPU ops plus one min-plus prefix scan for the
in-row deletion recurrence. No per-candidate control flow.
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import GAP_EXTEND_PROB, GAP_OPEN_PROB, SNP_PROB

# Packed DP value: (edits << INDEL_BITS) | indel_count, so integer min is
# lexicographic (fewest edits, then fewest indels).
INDEL_BITS = 10
EDIT_UNIT = 1 << INDEL_BITS
PINF = np.int32(1 << 29)

LOG_GAP_OPEN = math.log(GAP_OPEN_PROB)
LOG_GAP_EXTEND = math.log(GAP_EXTEND_PROB)
LOG_PERFECT = math.log(1.0 - SNP_PROB)
NEG = np.float32(-1e30)


def log_phred_error_table() -> np.ndarray:
    """log(P(base wrong)) indexed by raw phred+33 byte (float32).

    Mirrors lv_phredToProbability (LandauVishkin.cpp:744-752).
    """
    from ..constants import phred_to_probability_table

    return np.log(phred_to_probability_table()).astype(np.float32)


class DPResult(NamedTuple):
    dist: jax.Array      # [N] int32 edit distance (>= huge when plen==0)
    log_prob: jax.Array  # [N] float32 natural-log match probability
    end_col: jax.Array   # [N] int32 text chars consumed at alignment end
    indels: jax.Array    # [N] int32 total indel bases on the chosen path


def _min3_with_logp(a, alp, b, blp, c, clp):
    """Elementwise lexicographic min of packed values, carrying logp.

    Ties prefer a, then b (a is the diagonal/M state: SNAP prefers
    fewest-indel, i.e. match/substitute, moves).
    """
    ab = jnp.minimum(a, b)
    ablp = jnp.where(a <= b, alp, blp)
    out = jnp.minimum(ab, c)
    outlp = jnp.where(ab <= c, ablp, clp)
    return out, outlp


def fitting_edit_distance(
    pattern: jax.Array,    # [N, L] uint8 base codes (4=N, 5=pad)
    pat_logq: jax.Array,   # [N, L] float32 log P(error) at each pattern base
    plen: jax.Array,       # [N] int32 effective (clipped) pattern length
    text: jax.Array,       # [N, W] uint8 base codes (5=pad never matches)
    anchored: bool = False,
) -> DPResult:
    """Fitting alignment: pattern fully aligned, free text end.

    anchored=False: free placement in text (both ends free) — the
    windowed form that scores all nearby offsets at once.
    anchored=True: the text START is pinned at column 0, exactly SNAP's
    seed-anchored Landau-Vishkin extension (LandauVishkin.h:100,
    BaseAligner.cpp:1160-1176): a path may begin with a deletion run
    (text consumed before any pattern) but each deleted base costs an
    edit, so candidates 30bp apart stop collapsing onto one windowed
    optimum.

    Returns per candidate the minimum edit distance, the natural-log
    match probability of the chosen path, and the exclusive end column
    (number of text chars consumed), enabling end-location-based merge.
    """
    N, L = pattern.shape
    W = text.shape[1]
    step = np.int32(EDIT_UNIT + 1)  # one edit + one indel base

    # State rows over text-consumed counts j in 0..W.
    jc0 = jnp.arange(W + 1, dtype=jnp.int32)[None, :]
    if anchored:
        m = jnp.where(jc0 == 0, np.int32(0), PINF)
        m = jnp.broadcast_to(m, (N, W + 1)).astype(jnp.int32)
        # leading deletion run: j text bases consumed pre-pattern
        d = jnp.where(jc0 > 0, jc0 * step, PINF)
        d = jnp.broadcast_to(d, (N, W + 1)).astype(jnp.int32)
        dlp = jnp.where(
            jc0 > 0,
            np.float32(LOG_GAP_OPEN)
            + (jc0 - 1).astype(jnp.float32) * np.float32(LOG_GAP_EXTEND),
            NEG,
        )
        dlp = jnp.broadcast_to(dlp, (N, W + 1)).astype(jnp.float32)
    else:
        m = jnp.zeros((N, W + 1), dtype=jnp.int32)       # free start
        d = jnp.full((N, W + 1), PINF, dtype=jnp.int32)
        dlp = jnp.full((N, W + 1), NEG, dtype=jnp.float32)
    i_ = jnp.full((N, W + 1), PINF, dtype=jnp.int32)
    mlp = jnp.zeros((N, W + 1), dtype=jnp.float32)
    ilp = jnp.full((N, W + 1), NEG, dtype=jnp.float32)

    ans_packed = jnp.full((N,), PINF, dtype=jnp.int32)
    ans_lp = jnp.full((N,), NEG, dtype=jnp.float32)
    ans_end = jnp.zeros((N,), dtype=jnp.int32)

    jcols = jnp.arange(W + 1, dtype=jnp.int32)[None, :]  # [1, W+1]

    def combine(x, y):
        """Associative min-by-cost over (cost, logp, col); ties keep earlier."""
        xc, xl, xj = x
        yc, yl, yj = y
        take_y = yc < xc
        return (
            jnp.where(take_y, yc, xc),
            jnp.where(take_y, yl, xl),
            jnp.where(take_y, yj, xj),
        )

    def row(i, state):
        m, i_, d, mlp, ilp, dlp, ans_packed, ans_lp, ans_end = state
        pb = jax.lax.dynamic_slice_in_dim(pattern, i, 1, axis=1)      # [N,1]
        lq = jax.lax.dynamic_slice_in_dim(pat_logq, i, 1, axis=1)     # [N,1]
        mism = text != pb                                              # [N, W]
        subp = jnp.where(mism, np.int32(EDIT_UNIT), np.int32(0))
        sublp = jnp.where(mism, lq, np.float32(0.0))

        prev_best, prev_lp = _min3_with_logp(m, mlp, i_, ilp, d, dlp)
        m_new = jnp.concatenate(
            [jnp.full((N, 1), PINF, jnp.int32), prev_best[:, :-1] + subp], axis=1
        )
        mlp_new = jnp.concatenate(
            [jnp.full((N, 1), NEG, jnp.float32), prev_lp[:, :-1] + sublp], axis=1
        )

        # Insertion (pattern consumed, no text): open from M, extend from I.
        i_open = m + step
        i_ext = i_ + step
        take_ext = i_ext <= i_open   # tie prefers continuing the run
        i_new = jnp.where(take_ext, i_ext, i_open)
        ilp_new = jnp.where(take_ext, ilp + LOG_GAP_EXTEND, mlp + LOG_GAP_OPEN)

        # Deletion (text consumed, no pattern): in-row min-plus prefix scan
        # over run starts from min(M,I) of THIS row.
        mi, milp = _min3_with_logp(
            m_new, mlp_new, i_new, ilp_new,
            jnp.full_like(m_new, PINF), jnp.full_like(mlp_new, NEG),
        )
        adj = mi - jcols * step           # cost adjusted for run start column
        colc = jnp.broadcast_to(jcols, adj.shape).astype(jnp.int32)
        cum, cumlp, cumcol = jax.lax.associative_scan(
            combine, (adj, milp, colc), axis=1
        )
        # D[j] starts a deletion run at column l = cumcol[j-1]:
        # cost = mi[l] + (j - l) * step; probability = open + (j-l-1)*extend.
        d_new = jnp.concatenate(
            [
                jnp.full((N, 1), PINF, jnp.int32),
                cum[:, :-1] + (jcols[:, 1:]) * step,
            ],
            axis=1,
        )
        dels_minus1 = (jcols[:, 1:] - cumcol[:, :-1] - 1).astype(jnp.float32)
        dlp_new = jnp.concatenate(
            [
                jnp.full((N, 1), NEG, jnp.float32),
                cumlp[:, :-1] + LOG_GAP_OPEN + dels_minus1 * LOG_GAP_EXTEND,
            ],
            axis=1,
        )

        # Harvest result at this pattern row if it's the last real row.
        fin, finlp = _min3_with_logp(
            m_new, mlp_new, i_new, ilp_new,
            jnp.full_like(m_new, PINF), jnp.full_like(mlp_new, NEG),
        )
        best = jnp.min(fin, axis=1)
        bidx = jnp.argmin(fin, axis=1).astype(jnp.int32)
        blp = jnp.take_along_axis(finlp, bidx[:, None].astype(jnp.int64), axis=1)[:, 0]
        is_last = (i + 1) == plen
        ans_packed = jnp.where(is_last, best, ans_packed)
        ans_lp = jnp.where(is_last, blp, ans_lp)
        ans_end = jnp.where(is_last, bidx, ans_end)

        return (m_new, i_new, d_new, mlp_new, ilp_new, dlp_new,
                ans_packed, ans_lp, ans_end)

    state = (m, i_, d, mlp, ilp, dlp, ans_packed, ans_lp, ans_end)
    state = jax.lax.fori_loop(0, L, row, state)
    ans_packed, ans_lp, ans_end = state[6], state[7], state[8]

    dist = ans_packed >> INDEL_BITS
    indels = ans_packed & np.int32(EDIT_UNIT - 1)
    # Perfect-match prior on the matching bases (LandauVishkin.h:341).
    log_prob = ans_lp + (plen - dist).astype(jnp.float32) * np.float32(LOG_PERFECT)
    return DPResult(dist=dist, log_prob=log_prob, end_col=ans_end, indels=indels)
