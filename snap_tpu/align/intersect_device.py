"""Paired-end fuzzy set intersection as a jitted device wavefront.

Device twin of align/intersect.paired_candidates (phases 1-2 of SNAP's
IntersectingPairedEndAligner, IntersectingPairedEndAligner.cpp:406-717):
same candidate semantics — read-start-normalized locations, disjoint-
hit-set bestPossibleScore lower bounds (.cpp:3585-3625), [minSpacing,
maxSpacing] mate windows on the opposite end/opposite direction
(.cpp:530-717), pair-bound priority ordering — but re-expressed as
fixed-shape tensor ops so the whole intersection runs on the TPU:

- per-seed hit lists arrive as capped row gathers ([R, S, HP]) instead
  of host CSR walks; rows where a recorded lookup overflows the cap
  are flagged for the exact host redo (same protocol as the single-end
  `truncated` wide-redo);
- the host path's per-lookup searchsorted fuzzy windows become
  inclusive max/min scans over per-row sorted entry tables (a lookup
  matches a candidate iff its nearest entry is within fuzzy_dist);
- the mate-window existence + mate-bestPossibleScore range-min
  (host: binary search + sparse min table) become one masked
  compare-and-reduce against the mate row's full entry table (XLA
  fuses the [C, M] compare into the reduction, so nothing big
  materializes);
- the final per-row top-K by (pair_bound, -weight, loc) is one packed
  int64 sort.

Exactness: for rows that are not flagged (no capped lookup, candidate
set within the compaction width) the outputs match paired_candidates
bit-for-bit; tests/test_intersect_device.py asserts equality against
the host implementation on random and repeat-heavy genomes.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..index.index import DeviceIndex, gather_hits, probe
from .intersect import (
    FUZZY_DIST,
    MAX_BIG_HITS,
    _INF16,
    _LOC_BIAS,
    _NOPAIR_PENALTY,
)

_INF_KEY = jnp.int64(1) << 62
_NEG_INF = jnp.int64(-(1 << 40))
_POS_INF = jnp.int64(1 << 40)


@dataclass(frozen=True)
class DeviceIntersectParams:
    """Static (jit-key) geometry of the device intersection."""

    seed_len: int
    max_probe: int = 32          # index bucket span (probe geometry)
    num_seeds: int = 8           # S: lookups per end (-n paired)
    hit_cap: int = 64            # HP: gathered hits per (lookup, dir)
    cand_width: int = 64         # C: compacted candidates per (row, dir)
    max_cand: int = 16           # K: output tile width
    fuzzy_dist: int = FUZZY_DIST
    max_big_hits: int = MAX_BIG_HITS
    max_k_indels: int = 0        # phase-2a detection bound (-i); see
                                 # intersect.IntersectParams.max_k_indels


def _phase1_entries(
    didx: DeviceIndex,
    bases: jax.Array,     # [R, L] uint8, R = 2B (side0 rows then side1)
    len_eff: jax.Array,   # [R] int32
    offsets: jax.Array,   # [R, S] int32 probe offsets (-1 = unused)
    set_ids: jax.Array,   # [R, S] int32 disjoint-set id per lookup
    p: DeviceIntersectParams,
):
    """Phase 1 against ONE index (shard): pack seeds, probe, gather
    hits, normalize into per-(row, dir) entry-key tables.

    Split out so the sharded path can run it per index shard and
    all-gather the entry tables (a lookup's hit list lives wholly in
    one shard, so recorded/popular counts psum and the merged entry
    table is exactly the single-index table; see
    parallel/mesh.paired_candidates_sharded).

    Returns (e_key [2R, M] UNSORTED, rec_by_set [2, R, NS] i32,
    popular [R] i32, n_lookups [R] i32, over [R] bool).
    """
    R, L = bases.shape
    S = p.num_seeds
    SB = 5  # lookup-index bits in the entry key
    HP = p.hit_cap
    M = S * HP
    seed = p.seed_len
    NS = S  # disjoint-set ids are < number of lookups

    # ---- phase 1: pack seeds at the probe offsets, probe ----
    off_ok = offsets >= 0
    offc = jnp.clip(offsets, 0, max(L - seed, 0)).astype(jnp.int64)
    fwd = jnp.zeros((R, S), jnp.uint64)
    rc = jnp.zeros((R, S), jnp.uint64)
    seed_ok = off_ok
    for i in range(seed):
        b = jnp.take_along_axis(bases, offc + i, axis=1)
        ok = b < 4
        seed_ok = seed_ok & ok
        bs = jnp.where(ok, b, 0).astype(jnp.uint64)
        fwd = (fwd << np.uint64(2)) | bs
        rc = rc | ((np.uint64(3) - bs) << np.uint64(2 * i))
    # in-read bounds: offset + seed must fit the clipped read
    seed_ok = seed_ok & (offsets + seed <= len_eff[:, None])

    canonical = jnp.minimum(fwd, rc)
    ric = (fwd <= rc).reshape(-1)
    found, start, n0, n1 = probe(
        didx, canonical.reshape(-1), p.max_probe
    )
    found = found & seed_ok.reshape(-1)
    f_start = jnp.where(ric, start, start + n0.astype(jnp.int64))
    f_n = jnp.where(ric, n0, n1)
    r_start = jnp.where(ric, start + n0.astype(jnp.int64), start)
    r_n = jnp.where(ric, n1, n0)
    f_n = jnp.where(found, f_n, 0)
    r_n = jnp.where(found, r_n, 0)

    so = seed_ok.reshape(-1)
    big_f = so & (f_n >= p.max_big_hits)
    big_r = so & (r_n >= p.max_big_hits)
    popular = (
        big_f.reshape(R, S).sum(axis=1) + big_r.reshape(R, S).sum(axis=1)
    ).astype(jnp.int32)
    n_lookups = seed_ok.sum(axis=1).astype(jnp.int32)
    rec_f = so & ~big_f
    rec_r = so & ~big_r

    # overflow: a recorded lookup has more hits than the gather cap
    over = (
        (rec_f & (f_n > HP)).reshape(R, S).any(axis=1)
        | (rec_r & (r_n > HP)).reshape(R, S).any(axis=1)
    )

    # recorded lookups per disjoint set: [2, R, NS]
    sid1h = jnp.stack(
        [set_ids == w for w in range(NS)], axis=2
    )  # [R, S, NS] bool
    rec_by_set = jnp.stack(
        [
            (rec_f.reshape(R, S, 1) & sid1h).sum(axis=1),
            (rec_r.reshape(R, S, 1) & sid1h).sum(axis=1),
        ],
        axis=0,
    ).astype(jnp.int32)  # [2, R, NS]

    # ---- gather hits, normalize ----
    le = len_eff.astype(jnp.int64)[:, None]
    o64 = offc  # [R, S] clipped offsets (invalid rows masked later)
    sub = jnp.stack([o64, le - seed - o64], axis=0)  # [2, R, S]

    ents = []  # per dir: (key [R, M] i64 sorted asc, payload via bits)
    fz = jnp.int64(p.fuzzy_dist)
    for d, (d_start, d_n, rec) in enumerate(
        ((f_start, f_n, rec_f), (r_start, r_n, rec_r))
    ):
        cnt = jnp.where(rec, jnp.minimum(d_n, HP), 0)
        locs, lvalid = gather_hits(didx.hits, d_start, cnt, HP)  # [R*S, HP]
        norm = jnp.maximum(
            locs.astype(jnp.int64)
            - sub[d].reshape(-1, 1),
            -_LOC_BIAS,
        )
        s_ix = jnp.broadcast_to(
            jnp.arange(S, dtype=jnp.int64)[None, :, None], (R, S, HP)
        ).reshape(R * S, HP)
        key = jnp.where(
            lvalid, ((norm + _LOC_BIAS) << SB) | s_ix, _INF_KEY
        )
        ents.append(key.reshape(R, M))

    e_key = jnp.stack(ents, axis=1).reshape(R * 2, M)  # [2R, M]
    return e_key, rec_by_set, popular, n_lookups, over


def _phase2_from_entries(
    e_key: jax.Array,      # [2R, M] entry keys (any order; sorted here)
    rec_by_set: jax.Array,  # [2, R, NS] i32 recorded lookups per set
    popular: jax.Array,     # [R] i32
    n_lookups: jax.Array,   # [R] i32
    over: jax.Array,        # [R] bool (phase-1 gather-cap overflow)
    len_eff: jax.Array,     # [R] i32
    offsets: jax.Array,     # [R, S] i32 probe offsets
    set_ids: jax.Array,     # [R, S] i32
    min_sp: jax.Array,
    max_sp: jax.Array,
    p: DeviceIntersectParams,
    L: int,
) -> dict:
    """Phase 2 from (possibly shard-merged) entry tables: fuzzy match,
    bestPossibleScore, dedup/compaction, mate windows, phase 2a, top-K.
    M may be S*HP (single index) or S*HP*n_shards (merged)."""
    R2, M = e_key.shape
    R = R2 // 2
    B = R // 2
    S = p.num_seeds
    SB = 5
    C = p.cand_width
    K = p.max_cand
    seed = p.seed_len
    NS = S
    offc = jnp.clip(offsets, 0, max(L - seed, 0)).astype(jnp.int64)
    fz = jnp.int64(p.fuzzy_dist)

    e_key = jnp.sort(e_key, axis=1)
    e_valid = e_key < _INF_KEY
    e_norm = jnp.where(e_valid, e_key >> SB, _POS_INF)  # biased norm
    e_s = (e_key & ((1 << SB) - 1)).astype(jnp.int32)

    # ---- fuzzy per-lookup match via nearest-entry scans ----
    matched = []
    for s in range(S):
        msk = e_valid & (e_s == s)
        pv = jnp.where(msk, e_norm, _NEG_INF)
        prev = jax.lax.associative_scan(jnp.maximum, pv, axis=1)
        nv = jnp.where(msk, e_norm, _POS_INF)
        nxt = jnp.flip(
            jax.lax.associative_scan(
                jnp.minimum, jnp.flip(nv, axis=1), axis=1
            ),
            axis=1,
        )
        matched.append(
            ((e_norm - prev) <= fz) | ((nxt - e_norm) <= fz)
        )
    weight = sum(m.astype(jnp.int32) for m in matched)  # [2R, M]

    # ---- bestPossibleScore: per-set misses, max over sets ----
    # set id of lookup s varies per row: set_ids [R, S]
    sid_rd = jnp.broadcast_to(
        set_ids[:, None, :], (R, 2, S)
    ).reshape(R * 2, S)  # [2R, S]
    rec_rd = rec_by_set.transpose(1, 0, 2).reshape(R * 2, NS)  # [2R, NS]
    bps = jnp.zeros((R * 2, M), jnp.int32)
    for w in range(NS):
        mw = jnp.zeros((R * 2, M), jnp.int32)
        for s in range(S):
            in_w = (sid_rd[:, s] == w)[:, None]
            mw = mw + jnp.where(in_w, matched[s].astype(jnp.int32), 0)
        miss_w = rec_rd[:, w : w + 1] - mw
        bps = jnp.maximum(bps, miss_w)
    bps = jnp.maximum(bps, 0)

    # ---- dedup + compact top-C per (row, dir) ----
    is_start = jnp.concatenate(
        [
            jnp.ones((R * 2, 1), bool),
            e_norm[:, 1:] != e_norm[:, :-1],
        ],
        axis=1,
    ) & e_valid
    n_start = is_start.sum(axis=1).reshape(R, 2)

    # compaction priority: (bps, -weight, norm) — bps ascending keeps
    # every candidate that can beat the kept ones on pair_bound lower
    # bound; weight/norm break ties the same way the host top-K does
    wcap = jnp.minimum(weight, 255).astype(jnp.int64)
    ckey = jnp.where(
        is_start,
        (bps.astype(jnp.int64) << 44)
        | ((255 - wcap) << 36)
        | e_norm,
        _INF_KEY,
    )
    c_sorted = jax.lax.sort(
        (ckey, e_norm, e_s.astype(jnp.int64), bps.astype(jnp.int64),
         wcap),
        dimension=1, num_keys=1, is_stable=True,
    )
    c_norm = c_sorted[1][:, :C]     # [2R, C] biased norm
    c_s = c_sorted[2][:, :C]
    c_bps = c_sorted[3][:, :C]
    c_w = c_sorted[4][:, :C]
    c_live = c_sorted[0][:, :C] < _INF_KEY

    # ---- mate windows: compare vs the mate row's full entry table ----
    # mate of (pair i, side s, dir d) = (pair i, side 1-s, dir 1-d)
    en2 = e_norm.reshape(R, 2, M)
    bp2 = bps.reshape(R, 2, M)
    va2 = e_valid.reshape(R, 2, M)
    mate_norm = jnp.concatenate([en2[B:], en2[:B]], axis=0)[:, ::-1, :]
    mate_bps = jnp.concatenate([bp2[B:], bp2[:B]], axis=0)[:, ::-1, :]
    mate_val = jnp.concatenate([va2[B:], va2[:B]], axis=0)[:, ::-1, :]

    q = c_norm.reshape(R, 2, C, 1)
    t = mate_norm.reshape(R, 2, 1, M)
    tv = mate_val.reshape(R, 2, 1, M)
    d_ = t - q  # biased norms: bias cancels
    in_win = tv & (
        ((d_ >= min_sp) & (d_ <= max_sp))
        | ((d_ >= -max_sp) & (d_ <= -min_sp))
    )
    has_mate = jnp.any(in_win, axis=3).reshape(R * 2, C)
    mate_min = jnp.min(
        jnp.where(in_win, mate_bps.reshape(R, 2, 1, M), jnp.int32(_INF16)),
        axis=3,
    ).reshape(R * 2, C)

    pair_bound = jnp.where(
        has_mate,
        c_bps.astype(jnp.int64) + mate_min.astype(jnp.int64),
        c_bps.astype(jnp.int64) + jnp.int64(_NOPAIR_PENALTY),
    )

    # phase 2a: largest spread to another mate-bearing candidate of the
    # same (row, dir) within maxDistForIndels
    # (IntersectingPairedEndAligner.cpp:720-801)
    if p.max_k_indels > 0:
        mki64 = jnp.int64(p.max_k_indels)
        sp = jnp.abs(c_norm[:, :, None] - c_norm[:, None, :])
        okw = (
            has_mate[:, :, None]
            & has_mate[:, None, :]
            & (sp < mki64)
        )
        big_indel = jnp.max(
            jnp.where(okw, sp, 0), axis=2
        ).astype(jnp.int64)
    else:
        big_indel = jnp.zeros_like(c_norm)

    # ---- top-K per row over both directions ----
    # host order: lexsort((norm, -weight, pair_bound)) per row
    fkey = jnp.where(
        c_live,
        (pair_bound << 44) | ((255 - c_w) << 36) | c_norm,
        _INF_KEY,
    ).reshape(R, 2 * C)
    dirs2 = jnp.broadcast_to(
        jnp.arange(2, dtype=jnp.int64)[None, :, None], (R, 2, C)
    ).reshape(R, 2 * C)
    f_sorted = jax.lax.sort(
        (
            fkey,
            c_norm.reshape(R, 2 * C),
            c_s.reshape(R, 2 * C),
            dirs2,
            c_w.reshape(R, 2 * C),
            pair_bound.reshape(R, 2 * C),
            big_indel.reshape(R, 2 * C),
        ),
        dimension=1, num_keys=1, is_stable=True,
    )
    k_norm = f_sorted[1][:, :K] - _LOC_BIAS
    k_s = f_sorted[2][:, :K]
    k_dir = f_sorted[3][:, :K].astype(jnp.int32)
    k_w = f_sorted[4][:, :K].astype(jnp.int32)
    k_bi = f_sorted[6][:, :K].astype(jnp.int32)
    k_live = f_sorted[0][:, :K] < _INF_KEY

    # oriented anchor offset == the normalization offset for that dir
    o_of_s = jnp.take_along_axis(offc, k_s, axis=1)  # [R, K]
    k_off = jnp.where(
        k_dir == 1,
        len_eff.astype(jnp.int64)[:, None] - seed - o_of_s,
        o_of_s,
    ).astype(jnp.int32)

    # compaction-cut honesty: if a (row, dir) had more than C distinct
    # candidates, a cut one (bps >= the C-th kept bps) could still out-
    # rank the K-th kept candidate on pair_bound; flag those rows
    kth_bound = jnp.where(
        k_live[:, K - 1], f_sorted[5][:, K - 1], jnp.int64(1) << 40
    )
    cut_possible = (n_start > C).reshape(R, 2)
    cut_min_bound = jnp.where(
        c_live[:, C - 1].reshape(R, 2),
        c_bps[:, C - 1].reshape(R, 2).astype(jnp.int64),
        jnp.int64(1) << 40,
    )
    over = over | jnp.any(
        cut_possible & (cut_min_bound < kth_bound[:, None]), axis=1
    )
    if p.max_k_indels > 0:
        # a cut (beyond-C) mate-bearing candidate could contribute a
        # phase-2a spread the compacted view cannot see
        over = over | jnp.any(cut_possible, axis=1)

    return {
        "loc": jnp.where(k_live, k_norm, 0),
        "off": jnp.where(k_live, jnp.maximum(k_off, 0), 0),
        "dir": k_dir,
        "valid": k_live,
        "weight": jnp.where(k_live, k_w, 0),
        "big_indel": jnp.where(k_live, k_bi, 0),
        "popular": popular,
        "n_lookups": n_lookups,
        "overflow": over,
    }


@functools.partial(jax.jit, static_argnames=("p",))
def paired_candidates_device(
    didx: DeviceIndex,
    bases: jax.Array,     # [R, L] uint8, R = 2B (side0 rows then side1)
    len_eff: jax.Array,   # [R] int32
    offsets: jax.Array,   # [R, S] int32 probe offsets (-1 = unused)
    set_ids: jax.Array,   # [R, S] int32 disjoint-set id per lookup
    min_sp: jax.Array,    # [] int64 minSpacing (traced: -ins adapts it)
    max_sp: jax.Array,    # [] int64 maxSpacing
    p: DeviceIntersectParams,
) -> dict:
    """Phases 1-2 on device. Returns a dict of device arrays:

    loc[R,K] i64 (normalized start), off[R,K] i32 (oriented anchor =
    the normalization offset), dir[R,K] i32, valid[R,K] bool,
    weight[R,K] i32, popular[R] i32, n_lookups[R] i32,
    overflow[R] bool (needs exact host redo).
    """
    S = p.num_seeds
    if S > 32:
        raise ValueError(
            f"device intersection packs the lookup index in 5 bits; "
            f"num_seeds={S} > 32 (use the host path)"
        )
    e_key, rec_by_set, popular, n_lookups, over = _phase1_entries(
        didx, bases, len_eff, offsets, set_ids, p
    )
    return _phase2_from_entries(
        e_key, rec_by_set, popular, n_lookups, over, len_eff,
        offsets, set_ids, min_sp, max_sp, p, bases.shape[1],
    )


@functools.partial(jax.jit, static_argnames=("p",))
def _paired_candidates_rows(
    didx: DeviceIndex,
    bases: jax.Array,     # [2B, L] full batch rows (side0 then side1)
    len_eff: jax.Array,
    offsets: jax.Array,
    set_ids: jax.Array,
    rows: jax.Array,      # [M2] i64 pair ids to (re)intersect
    live: jax.Array,      # [M2] bool
    min_sp: jax.Array,
    max_sp: jax.Array,
    p: DeviceIntersectParams,
) -> dict:
    """Run the device intersection on a gathered subset of pairs (both
    sides of each selected pair), under `p`'s (typically wider)
    geometry. Dead pad rows run with len_eff=0."""
    B = bases.shape[0] // 2
    sub = jnp.concatenate([rows, rows + B])
    le = jnp.where(
        jnp.concatenate([live, live]), len_eff[sub], 0
    ).astype(len_eff.dtype)
    return paired_candidates_device(
        didx, bases[sub], le, offsets[sub], set_ids[sub],
        min_sp, max_sp, p,
    )


def paired_wide_redo(
    didx: DeviceIndex,
    bases: jax.Array,
    len_eff: jax.Array,
    offsets: jax.Array,
    set_ids: jax.Array,
    pcd: dict,
    over_rows: np.ndarray,   # host row ids of overflowed pairs
    min_sp,
    max_sp,
    p: DeviceIntersectParams,
    hit_cap: int = 512,
    cand_width: int = 512,
) -> dict:
    """Second, wider device tier for pairs the standard intersection
    flagged (gather-cap or compaction-cut overflow) — the paired
    analogue of the single-end adaptive phase B. A ~25%-repeat genome
    overflows ~18% of pairs at HP=64/C=64 (SINE-density seeds carry
    hundreds of hits); rerunning just those rows at HP=512/C=256 keeps
    them device-resident instead of shipping them to the
    single-core-host exact redo. Pairs that overflow even the wide
    geometry keep their flag and take the host path.

    Row counts are padded to a power of two (>=64) so the wide graphs
    compile for a handful of shapes. Returns pcd with the redone rows'
    fields overwritten and `overflow` updated.
    """
    import dataclasses

    wide_p = dataclasses.replace(
        p, hit_cap=hit_cap, cand_width=cand_width
    )
    # chunk so the wide entry tables ([4*M2, S*HP] i64) and the fused
    # mate-window reduction stay well under HBM
    CHUNK = 2048
    for c0 in range(0, over_rows.size, CHUNK):
        chunk = over_rows[c0 : c0 + CHUNK]
        nb = chunk.size
        M2 = 1 << max(6, int(np.ceil(np.log2(max(nb, 1)))))
        rows = np.zeros(M2, np.int64)
        rows[:nb] = chunk
        live = np.zeros(M2, bool)
        live[:nb] = True
        sub = _paired_candidates_rows(
            didx, bases, len_eff, offsets, set_ids,
            jnp.asarray(rows), jnp.asarray(live),
            min_sp, max_sp, wide_p,
        )
        pcd = _scatter_pcd(pcd, sub, jnp.asarray(rows), jnp.asarray(live))
    return pcd


@jax.jit
def _scatter_pcd(pcd: dict, sub: dict, rows: jax.Array, live: jax.Array):
    B = pcd["overflow"].shape[0] // 2
    M2 = rows.shape[0]
    out = dict(pcd)
    for k in ("loc", "off", "dir", "valid", "weight", "big_indel"):
        for side, base in ((0, 0), (1, B)):
            new = sub[k][side * M2 : (side + 1) * M2]
            old = pcd[k][rows + base]
            out[k] = (
                out[k]
                .at[rows + base]
                .set(jnp.where(live[:, None], new, old))
            )
    ov_new = sub["overflow"][:M2] | sub["overflow"][M2:]
    for base in (0, B):
        out["overflow"] = (
            out["overflow"]
            .at[rows + base]
            .set(
                jnp.where(
                    live, ov_new, pcd["overflow"][rows + base]
                )
            )
        )
    return out


def probe_offsets_for(
    len_eff: np.ndarray, L: int, seed_len: int, num_seeds: int
) -> tuple[np.ndarray, np.ndarray]:
    """Host helper: per-row probe offsets + disjoint-set ids (the
    phase-1 sequence, IntersectingPairedEndAligner.cpp:416-501) for a
    batch of clipped lengths. Cheap: one cached sequence per distinct
    length."""
    from .intersect import intersect_seed_offsets

    R = len_eff.shape[0]
    S = num_seeds
    offsets = np.full((R, S), -1, dtype=np.int32)
    set_ids = np.zeros((R, S), dtype=np.int32)
    n_poss = (np.minimum(len_eff, L) - seed_len + 1).astype(np.int64)
    for npos in np.unique(n_poss):
        if npos <= 0:
            continue
        offs, sets = intersect_seed_offsets(int(npos), seed_len, S)
        rows = np.flatnonzero(n_poss == npos)
        cols = np.arange(len(offs))
        offsets[rows[:, None], cols[None, :]] = offs
        set_ids[rows[:, None], cols[None, :]] = sets
    return offsets, set_ids
