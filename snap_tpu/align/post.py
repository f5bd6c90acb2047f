"""Host-side result finalization: merge, best selection, MAPQ.

Behavioral reference: SNAP's ScoreSet (BaseAligner.h:260-329):
- candidates aligning to nearby locations (within maxMergeDist=48) merge,
  keeping the lower edit distance / higher match probability and backing
  the loser's probability out of pAll (BaseAligner.cpp:1353-1443);
- best selection: lower score wins, ties by higher matchProbability
  (BaseAligner.cpp updateBestScore);
- MAPQ = min(70, -10*log10(1 - pBest/pAll)) - max(0, popular-10)/2
  (mapq.h:32-68), in float64 like the reference.

Merging uses the DP-reported alignment END location, which is identical
for duplicate discoveries of the same alignment regardless of which
seed anchored them.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import numpy as np

from ..constants import MAPQ_MAX, MAX_MERGE_DIST


@dataclass
class ReadAlignment:
    status: str            # 'single' | 'multi' | 'notfound' | 'filtered'
    direction: int = 0     # 0 forward, 1 RC
    end_loc: int = 0       # exclusive genome end of alignment
    dist: int = -1         # edit distance
    mapq: int = 0
    match_prob: float = 0.0
    prob_all: float = 0.0


def compute_mapq(p_all: float, p_best: float, popular_skipped: int) -> int:
    p_all = max(p_all, p_best)
    if p_best <= 0.0:
        return 0
    ratio = p_best / p_all
    if ratio >= 1.0:
        base = MAPQ_MAX
    else:
        base = min(MAPQ_MAX, int(-10.0 * math.log10(1.0 - ratio)))
    return max(0, base - max(0, popular_skipped - 10) // 2)


def finalize_read(
    dists: np.ndarray,
    log_probs: np.ndarray,
    end_locs: np.ndarray,
    directions: np.ndarray,
    valid: np.ndarray,
    popular: int,
) -> ReadAlignment:
    """Merge scored candidates of one read and pick the primary."""
    sel = valid
    if not np.any(sel):
        return ReadAlignment(status="notfound")
    d = dists[sel].astype(np.int64)
    lp = log_probs[sel].astype(np.float64)
    e = end_locs[sel].astype(np.int64)
    dr = directions[sel].astype(np.int64)
    probs = np.exp(lp)

    order = np.lexsort((e, dr))
    d, probs, e, dr = d[order], probs[order], e[order], dr[order]

    # cluster: same direction and end within MAX_MERGE_DIST of previous
    new_cluster = np.ones(len(d), dtype=bool)
    new_cluster[1:] = (dr[1:] != dr[:-1]) | ((e[1:] - e[:-1]) > MAX_MERGE_DIST)
    cluster_id = np.cumsum(new_cluster) - 1

    n_clusters = cluster_id[-1] + 1
    p_all = 0.0
    best = None  # (dist, -prob, end, dir, prob)
    for c in range(n_clusters):
        m = cluster_id == c
        cd, cp, ce, cdr = d[m], probs[m], e[m], dr[m]
        # rep = lowest dist, ties -> highest prob
        i = np.lexsort((-cp, cd))[0]
        p_all += cp[i]
        cand = (int(cd[i]), -float(cp[i]), int(ce[i]), int(cdr[i]))
        if best is None or cand < best:
            best = cand
    bd, nbp, be, bdr = best
    p_best = -nbp
    mapq = compute_mapq(p_all, p_best, popular)
    return ReadAlignment(
        status="single" if mapq >= 10 else "multi",
        direction=bdr,
        end_loc=be,
        dist=bd,
        mapq=mapq,
        match_prob=p_best,
        prob_all=p_all,
    )
