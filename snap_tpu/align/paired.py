"""Paired-end alignment: batched intersection + chimeric fallback.

Behavioral reference: SNAP's IntersectingPairedEndAligner (the fuzzy
set-intersection algorithm, IntersectingPairedEndAligner.cpp) wrapped by
ChimericPairedEndAligner (ChimericPairedEndAligner.cpp:126-460).

TPU-first re-expression: instead of the sequential dual-cursor
binary-search walk over per-seed hit lists (Phase 2,
IntersectingPairedEndAligner.cpp:530-717), both ends run the standard
batched candidate+scoring wavefront (one device batch holding all ends),
and pairing is a windowed join over each pair's K x K scored candidates:
opposite directions, spacing within [minSpacing, maxSpacing]
(PairedAligner.cpp:55-56 defaults 0/1000). Pair selection, merge anchors
(50bp on both ends, IntersectingPairedEndAligner.h:517-548), pair MAPQ
from pairProbability sums, and the chimeric single-end fallback with the
MAPQ/3 penalty (ChimericPairedEndAligner.cpp:421) follow the reference.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..constants import (
    DEFAULT_MAX_SPACING,
    DEFAULT_MIN_SPACING,
    PAIRED_MERGE_ANCHOR_DIST,
)
from .post import ReadAlignment, compute_mapq, finalize_read

MIN_SCORE_REALIGNMENT = 3       # ChimericPairedEndAligner.h:60
MIN_AG_SCORE_IMPROVEMENT = 24   # ChimericPairedEndAligner.h:62


@dataclass
class PairEndResult:
    status: str                  # 'single' | 'multi' | 'notfound' | 'filtered'
    cand_index: int = -1
    direction: int = 0
    end_loc: int = 0
    dist: int = -1
    mapq: int = 0
    aligned_as_pair: bool = False
    supplementary: bool = False  # ALT supplementary emission (-ea)


def _pair_combos(c0: dict, c1: dict, min_spacing: int, max_spacing: int):
    """All valid pair candidate combinations for one read pair.

    c0/c1: dicts of per-candidate numpy arrays (dist, log_prob, ag_score,
    end_loc, cand_loc, direction, valid). Returns index arrays (i0, i1).
    """
    v0 = np.flatnonzero(c0["valid"])
    v1 = np.flatnonzero(c1["valid"])
    if v0.size == 0 or v1.size == 0:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    l0 = c0["cand_loc"][v0][:, None]
    l1 = c1["cand_loc"][v1][None, :]
    d0 = c0["direction"][v0][:, None]
    d1 = c1["direction"][v1][None, :]
    delta = np.abs(l0.astype(np.int64) - l1.astype(np.int64))
    ok = (d0 != d1) & (delta <= max_spacing) & (delta >= min_spacing)
    i0, i1 = np.nonzero(ok)
    return v0[i0], v1[i1]


def finalize_pair(
    c0: dict,
    c1: dict,
    popular0: int,
    popular1: int,
    min_spacing: int = DEFAULT_MIN_SPACING,
    max_spacing: int = DEFAULT_MAX_SPACING,
    len_ok0: bool = True,
    len_ok1: bool = True,
    first_alt_start: int | None = None,
    alt_awareness: bool = True,
    emit_alt: bool = False,
    max_score_gap_to_prefer_non_alt: int = 64,
    force_spacing: bool = False,
    min_score_realignment: int = MIN_SCORE_REALIGNMENT,   # -en
    min_ag_improvement: int = MIN_AG_SCORE_IMPROVEMENT,   # -eg
    flatten_mapq_at_or_below: int = 3,                    # -fmb
) -> tuple[
    PairEndResult, PairEndResult,
    tuple[PairEndResult, PairEndResult] | None,
]:
    """Pick the pair (or chimeric single) results for one read pair.

    Returns (end0, end1, alt_supplementary_pair | None). ALT handling
    mirrors the intersecting aligner's dual score sets
    (IntersectingPairedEndAligner.cpp:834,1211,1251-1257): a pair is
    non-ALT when its location is below the first-ALT boundary; the
    non-ALT set is emitted unless its best pair score is more than
    max_score_gap worse, and the distinct best ALT pair becomes a
    supplementary result under emit_alt.
    """
    if not (len_ok0 or len_ok1):
        return PairEndResult("filtered"), PairEndResult("filtered"), None

    alt_boundary = (
        first_alt_start
        if (first_alt_start is not None and alt_awareness)
        else None
    )

    pair_found = False
    best = None
    best_alt = None  # distinct best ALT pair (for emit_alt)
    p_all_pairs = 0.0
    p_best_pair = 0.0
    alt_mapqs = (0, 0)
    if len_ok0 and len_ok1:
        i0s, i1s = _pair_combos(c0, c1, min_spacing, max_spacing)
        if i0s.size:
            pair_found = True
            ag = c0["ag_score"][i0s] + c1["ag_score"][i1s]
            dsum = c0["dist"][i0s].astype(np.int64) + c1["dist"][i1s].astype(
                np.int64
            )
            lp = c0["log_prob"][i0s].astype(np.float64) + c1["log_prob"][
                i1s
            ].astype(np.float64)
            probs = np.exp(lp)
            e0 = c0["end_loc"][i0s].astype(np.int64)
            e1 = c1["end_loc"][i1s].astype(np.int64)
            pair_is_alt = (
                (c0["cand_loc"][i0s].astype(np.int64) >= alt_boundary)
                | (c1["cand_loc"][i1s].astype(np.int64) >= alt_boundary)
                if alt_boundary is not None
                else np.zeros(i0s.size, dtype=bool)
            )
            # merge anchors: pairs with both ends within 50 collapse,
            # keeping the better (agScore, probability)
            order = np.lexsort((e1, e0))
            reps: list[int] = []
            for oi in order:
                merged = False
                for rj in reps:
                    if (
                        abs(int(e0[oi]) - int(e0[rj])) <= PAIRED_MERGE_ANCHOR_DIST
                        and abs(int(e1[oi]) - int(e1[rj])) <= PAIRED_MERGE_ANCHOR_DIST
                    ):
                        merged = True
                        # keep the better of the two as the rep
                        if (-ag[oi], -probs[oi]) < (-ag[rj], -probs[rj]):
                            reps[reps.index(rj)] = oi
                        break
                if not merged:
                    reps.append(oi)
            reps_arr = np.array(reps)
            nonalt_reps = reps_arr[~pair_is_alt[reps_arr]]

            def set_best(subset):
                if subset.size == 0:
                    return None
                p_all = float(np.sum(probs[subset]))
                bi = min(subset, key=lambda r: (-ag[r], -probs[r]))
                return int(bi), float(probs[bi]), p_all

            all_best = set_best(reps_arr)
            na_best = set_best(nonalt_reps)
            bi_all = all_best[0]
            if na_best is None or (
                int(dsum[na_best[0]])
                > int(dsum[bi_all]) + max_score_gap_to_prefer_non_alt
            ):
                bi, p_best_pair, p_all_pairs = all_best
            else:
                bi, p_best_pair, p_all_pairs = na_best
                if emit_alt:
                    # best ALT pair as supplementary when it scores at
                    # least as well as the non-ALT primary pair
                    alt_best = set_best(reps_arr[pair_is_alt[reps_arr]])
                    if alt_best is not None and int(dsum[alt_best[0]]) <= int(
                        dsum[bi]
                    ):
                        amapq0 = compute_mapq(
                            all_best[2], alt_best[1], popular0
                        )
                        amapq1 = compute_mapq(
                            all_best[2], alt_best[1], popular1
                        )
                        alt_mapqs = (amapq0, amapq1)
                        best_alt = (
                            int(i0s[alt_best[0]]), int(i1s[alt_best[0]]),
                        )
            best = (int(i0s[bi]), int(i1s[bi]))

    # single-end results (for fallback and the min-MAPQ rule)
    def single_end(c, popular, len_ok):
        if not len_ok:
            return ReadAlignment(status="filtered")
        is_alt = (
            (c["cand_loc"].astype(np.int64) >= alt_boundary)
            if alt_boundary is not None
            else None
        )
        ra, _ = finalize_read(
            c["dist"], c["log_prob"], c["ag_score"], c["end_loc"],
            c["cand_loc"], c["direction"], c["valid"], popular,
            is_alt=is_alt, alt_awareness=alt_awareness,
            max_score_gap_to_prefer_non_alt=max_score_gap_to_prefer_non_alt,
        )
        return ra

    s0 = single_end(c0, popular0, len_ok0)
    s1 = single_end(c1, popular1, len_ok1)

    def single_fallback():
        out = []
        for s, ok in ((s0, len_ok0), (s1, len_ok1)):
            if not ok or s.status in ("notfound", "filtered"):
                out.append(PairEndResult("filtered" if not ok else "notfound"))
                continue
            mapq = s.mapq // 3  # chimeric penalty (ChimericPairedEndAligner.cpp:421)
            mapq = 0 if mapq <= flatten_mapq_at_or_below else mapq
            out.append(
                PairEndResult(
                    status="single" if mapq >= 10 else "multi",
                    cand_index=s.cand_index,
                    direction=s.direction,
                    end_loc=s.end_loc,
                    dist=s.dist,
                    mapq=mapq,
                    aligned_as_pair=False,
                )
            )
        return out[0], out[1], None

    if not pair_found:
        if force_spacing:
            # -fs: either both ends align as a pair or neither does
            # (PairedAligner.cpp:826-834; the chimeric fallback is off)
            return PairEndResult("notfound"), PairEndResult("notfound"), None
        return single_fallback()

    i0, i1 = best
    mapq0 = compute_mapq(p_all_pairs, p_best_pair, popular0)
    mapq1 = compute_mapq(p_all_pairs, p_best_pair, popular1)
    esc0 = bool(c0["escalated"][i0])
    esc1 = bool(c1["escalated"][i1])
    sc0, sc1 = int(c0["dist"][i0]), int(c1["dist"][i1])

    # chimeric double-check (ChimericPairedEndAligner.cpp:230-243, 404-412;
    # disabled under -fs, which bypasses the chimeric aligner entirely)
    compare_single = (
        not force_spacing
        and (esc0 or esc1)
        and max(sc0, sc1) >= min_score_realignment
    )
    if compare_single:
        pair_ag = int(c0["ag_score"][i0]) + int(c1["ag_score"][i1])
        single_ag = 0
        choose_single_mapq = True
        for s, ci, cn in ((s0, i0, c0), (s1, i1, c1)):
            if s.status not in ("notfound", "filtered"):
                sag = int(cn["ag_score"][s.cand_index])
            else:
                sag = 0
            single_ag += sag
            if int(cn["ag_score"][ci]) >= sag:
                choose_single_mapq = False
        if choose_single_mapq:
            if s0.status not in ("notfound", "filtered"):
                mapq0 = min(mapq0, s0.mapq)
            if s1.status not in ("notfound", "filtered"):
                mapq1 = min(mapq1, s1.mapq)
        if single_ag >= pair_ag + min_ag_improvement:
            return single_fallback()

    r0 = PairEndResult(
        status="single" if mapq0 >= 10 else "multi",
        cand_index=i0,
        direction=int(c0["direction"][i0]),
        end_loc=int(c0["end_loc"][i0]),
        dist=sc0,
        mapq=mapq0,
        aligned_as_pair=True,
    )
    r1 = PairEndResult(
        status="single" if mapq1 >= 10 else "multi",
        cand_index=i1,
        direction=int(c1["direction"][i1]),
        end_loc=int(c1["end_loc"][i1]),
        dist=sc1,
        mapq=mapq1,
        aligned_as_pair=True,
    )

    alt_pair = None
    if best_alt is not None:
        a0, a1 = best_alt
        alt_pair = (
            PairEndResult(
                status="multi",
                cand_index=a0,
                direction=int(c0["direction"][a0]),
                end_loc=int(c0["end_loc"][a0]),
                dist=int(c0["dist"][a0]),
                mapq=alt_mapqs[0],
                aligned_as_pair=True,
                supplementary=True,
            ),
            PairEndResult(
                status="multi",
                cand_index=a1,
                direction=int(c1["direction"][a1]),
                end_loc=int(c1["end_loc"][a1]),
                dist=int(c1["dist"][a1]),
                mapq=alt_mapqs[1],
                aligned_as_pair=True,
                supplementary=True,
            ),
        )
    return r0, r1, alt_pair
