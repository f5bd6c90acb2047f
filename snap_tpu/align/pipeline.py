"""Single-end alignment as one jitted device program.

Behavioral reference: SNAP's BaseAligner::AlignRead (BaseAligner.cpp:273)
re-expressed as fixed-shape tensor wavefronts:

  clip -> seed pack -> hash probe -> hit gather -> candidate
  sort/dedup/top-K -> window gather -> fitting-DP scoring

Differences from the reference by design (TPU-first):
- SNAP probes seeds sequentially with early termination (Ukkonen bound,
  pAll >= 4.9 stop); we look up a fixed set of evenly spaced seed
  offsets and score the top-K candidates in one wavefront. Final
  records match because scoring is exhaustive over the same candidate
  pool; only work, not results, differs.
- SNAP's per-direction candidate hash table with weight lists
  (BaseAligner.h:174-258) becomes sort + run-length dedup + top_k.
- The 48bp nearby merge is subsumed by window scoring + the
  end-location merge in post-processing.

Seed semantics preserved: canonical lookup, RC offset mapping
readLen - seedLen - offset (BaseAligner.cpp:591-606), popular-seed skip
at maxHits counted per (seed, direction) (BaseAligner.cpp:574-579).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import (
    DEFAULT_MAX_DIST,
    DEFAULT_MAX_HITS,
    DEFAULT_NUM_SEEDS_SINGLE,
    DEFAULT_SEED_LEN,
)
from ..index.index import DeviceIndex, gather_hits, pack_read_seeds, probe
from ..ops.dp import fitting_edit_distance, log_phred_error_table

QUAL_CLIP = ord("#")  # ClipBack threshold quality (Read.h:88-108)


@dataclass(frozen=True)
class AlignParams:
    seed_len: int = DEFAULT_SEED_LEN
    num_seeds: int = DEFAULT_NUM_SEEDS_SINGLE  # SNAP -n (per-direction applications)
    hit_cap: int = 16                 # fixed gather width per (seed, dir)
    max_hits: int = DEFAULT_MAX_HITS  # popular-seed skip threshold
    max_k: int = DEFAULT_MAX_DIST
    max_cand: int = 16                # candidates scored per read
    max_probe: int = 32
    explore_popular: bool = False     # -x: score popular seeds' first hits
    extra_search_depth: int = 1       # -D (subsumed by exhaustive top-K
                                      # scoring; kept for CLI parity)
    max_k_indels: int | None = None   # -i maxDistForIndels: the paired
                                      # phase-2a score-raise bound AND the
                                      # DP window margin for big indels
                                      # (IntersectingPairedEndAligner.cpp:
                                      # 720-801). None = auto: paired
                                      # drivers resolve to the reference
                                      # default 40 (AlignerOptions.cpp:108),
                                      # single-end to 0 (BaseAligner never
                                      # consumes maxDistForIndels)
    use_affine_gap: bool = True       # -G- disables AG escalation
    clip_back: bool = True            # default ClipBack (Read.h:88-108);
                                      # ClipFront is host-side (apply_front_clip)
    # Affine-gap penalties (-gm/-gs/-go/-ge/-g5/-g3; flags
    # AlignerOptions.cpp:702-768, defaults AlignerOptions.cpp:79-81).
    # Static jit-key members: changing them recompiles the wavefront.
    ag_match: int = 1
    ag_sub: int = 4
    ag_open: int = 6
    ag_extend: int = 1
    ag_b5: int = 10
    ag_b3: int = 7
    min_weight: int = 1               # -ms minWeightToCheck
    use_ukkonen: bool = True          # -nu disables the dynamic score
                                      # limit replay (DisabledOptimizations
                                      # .noUkkonen, AlignerOptions.h:78-88)

    @property
    def num_lookups(self) -> int:
        # each clean lookup applies the seed in both directions
        # (BaseAligner.cpp:451,669), so -n 25 means 13 lookups
        return self.num_seeds // 2 + 1

    @property
    def mki(self) -> int:
        return self.max_k_indels or 0

    @property
    def max_k_same(self) -> int:
        # maxKForSameAlignment = gapOpen/(sub - gapExtend)
        # (BaseAligner.cpp:1148)
        return self.ag_open // max(self.ag_sub - self.ag_extend, 1)


def snap_seed_wrap_order(seed_len: int) -> np.ndarray:
    """residue -> wrap round, from SNAP's SeedSequencer BFS bisection
    (SeedSequencer.cpp:36-103). Round 0 is residue 0; round w starts at
    the w-th midpoint of the BFS over [1, seed_len-1]."""
    order = np.zeros(seed_len, dtype=np.int32)
    from collections import deque

    q = deque([(1, seed_len - 1)])
    w = 1
    while q:
        lo, hi = q.popleft()
        mid = (lo + hi) // 2
        order[mid] = w
        w += 1
        if hi > mid:
            q.append((mid + 1, hi))
        if lo < mid:
            q.append((lo, mid - 1))
    return order


class SingleAlignOut(NamedTuple):
    """Per-candidate scoring results, K per read (host selects/merges).

    Each candidate carries both the Landau-Vishkin-equivalent result and,
    when escalated (lv dist > maxKForSameAlignment, BaseAligner.cpp:1148),
    the affine-gap rescoring result — mirroring BaseAligner::score's
    default affine-gap mode (BaseAligner.cpp:1203-1290).
    """

    dist: jax.Array      # [B, K] int32 edit distance (AG edits if escalated)
    lv_dist: jax.Array   # [B, K] int32 pre-clipping LV distance (the
                         # Ukkonen-limit gate key, = dist when not escalated)
    indels: jax.Array    # [B, K] int32 indel bases on the LV path (0 =>
                         # gapless winner, fast CIGAR emission)
    log_prob: jax.Array  # [B, K] float32 ln match probability
    ag_score: jax.Array  # [B, K] int32 affine-gap score (selection key)
    end_loc: jax.Array   # [B, K] int64 exclusive LV alignment end in genome
    body_loc: jax.Array  # [B, K] int64 alignment body start (AG candidates)
    cand_loc: jax.Array  # [B, K] int64 raw candidate location (hit - offset)
    escalated: jax.Array # [B, K] bool affine-gap rescoring used
    clip_before: jax.Array  # [B, K] int32 AG soft clip (oriented pattern head)
    clip_after: jax.Array   # [B, K] int32 AG soft clip (oriented pattern tail)
    seed_off: jax.Array  # [B, K] int32 anchoring seed offset
    direction: jax.Array # [B, K] int32 0=forward 1=RC
    valid: jax.Array     # [B, K] bool candidate existed and scored <= max_k
    len_eff: jax.Array   # [B] int32 clipped length
    popular: jax.Array   # [B] int32 popular seeds skipped
    n_lookups: jax.Array # [B] int32 seed lookups performed (stats)
    truncated: jax.Array # [B] bool some lookup overflowed the gather cap


def device_logq(quals: jax.Array) -> jax.Array:
    """ln P(base wrong) from raw phred+33 bytes, computed elementwise.

    Identical math to log(phred_to_probability_table()[q]) (the
    lv_phredToProbability mix-in of SNP_PROB), but as VPU arithmetic:
    the table-lookup form is a [B, L] random-element gather — ~1.6M
    gather indices per batch at 16384x100, tens of ms on TPU — while
    exp/log on the same shape is sub-millisecond."""
    from ..constants import SNP_PROB

    qf = quals.astype(jnp.float32)
    e10 = jnp.exp(
        np.float32(-np.log(10.0) / 10.0) * (qf - np.float32(33.0))
    )
    err = np.float32(1.0) - (np.float32(1.0) - e10) * np.float32(
        1.0 - SNP_PROB
    )
    ok = (quals >= 33) & (quals < 127)
    return jnp.log(jnp.where(ok, err, np.float32(SNP_PROB)))


def clip_back(quals: jax.Array, lens: jax.Array) -> jax.Array:
    """Default ClipBack: drop the trailing run of '#'-quality bases."""
    B, L = quals.shape
    pos = jnp.arange(L, dtype=jnp.int32)[None, :]
    good = (quals != QUAL_CLIP) & (pos < lens[:, None])
    last_good = jnp.max(jnp.where(good, pos, -1), axis=1)
    return (last_good + 1).astype(jnp.int32)


def apply_front_clip(
    bases: np.ndarray, quals: np.ndarray, lens: np.ndarray
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Host-side ClipFront (ReadClippingType ClipFront/ClipBoth,
    Read.h:88-108): shift each read left past its leading run of
    '#'-quality bases. Returns (bases, quals, lens, front_clip) —
    fresh arrays, the inputs are not modified."""
    B, L = bases.shape
    pos = np.arange(L, dtype=np.int32)[None, :]
    good = (quals != QUAL_CLIP) & (pos < lens[:, None])
    first_good = np.where(
        good.any(axis=1), good.argmax(axis=1), lens
    ).astype(np.int32)
    fc = np.minimum(first_good, lens)
    src = pos + fc[:, None]
    srcc = np.minimum(src, L - 1)
    valid = src < lens[:, None]
    out_b = np.where(valid, np.take_along_axis(bases, srcc, axis=1), 4)
    out_q = np.where(valid, np.take_along_axis(quals, srcc, axis=1), 0)
    return (
        out_b.astype(np.uint8),
        out_q.astype(np.uint8),
        (lens - fc).astype(np.int32),
        fc,
    )


def reverse_complement_reads(
    bases: jax.Array, quals: jax.Array, len_eff: jax.Array
) -> tuple[jax.Array, jax.Array]:
    """RC of the clipped read, left-aligned; quals reversed to match.

    flip + variable left-rotate by (L - len) in log2(L) masked static
    rotations: a take_along_axis reversal is a [B, L] random-element
    gather, which costs ~30x more than these shifted selects on TPU.
    """
    B, L = bases.shape
    fb = jnp.flip(bases, axis=1)
    fq = jnp.flip(quals, axis=1)
    sh = (L - len_eff).astype(jnp.int32)[:, None]  # [B, 1] in [0, L]
    step = 1
    while step < L:
        take = (sh & step) != 0
        fb = jnp.where(
            take, jnp.concatenate([fb[:, step:], fb[:, :step]], axis=1), fb
        )
        fq = jnp.where(
            take, jnp.concatenate([fq[:, step:], fq[:, :step]], axis=1), fq
        )
        step <<= 1
    pos = jnp.arange(L, dtype=jnp.int32)[None, :]
    valid = pos < len_eff[:, None]
    comp = jnp.where(fb < 4, 3 - fb, fb)
    rc_bases = jnp.where(valid, comp, np.uint8(4))
    rc_quals = jnp.where(valid, fq, np.uint8(0))
    return rc_bases, rc_quals


def _score_rows(
    didx: DeviceIndex,
    s_pat: jax.Array,    # [M, L] oriented pattern codes
    s_logq: jax.Array,   # [M, L] f32 ln P(error)
    s_plen: jax.Array,   # [M] i32 clipped lengths
    s_loc: jax.Array,    # [M] i64 candidate locations
    s_off: jax.Array,    # [M] i32 anchoring seed offsets
    s_dir: jax.Array,    # [M] i32 directions
    sel_live: jax.Array, # [M] bool
    params: AlignParams,
    L: int,
    margin: int,
    W: int,
    s_bonus: jax.Array | None = None,  # [M] i32 phase-2a score raise
) -> SubsetOut:
    """Tier 2: full fitting DP + affine-gap head/tail on M rows."""
    from ..ops.dp import LOG_PERFECT

    AG_W = max(params.max_k, params.mki)
    if s_bonus is None:
        s_bonus = jnp.zeros(s_plen.shape, jnp.int32)
    # per-candidate acceptance bound: maxK raised by the detected
    # big-indel spread, capped at MAX_K-1 = 126 like computeScoreLimit
    # (IntersectingPairedEndAligner.cpp:2630-2644)
    mk_eff = jnp.minimum(
        jnp.int32(params.max_k) + s_bonus, jnp.int32(126)
    )
    # the Pallas kernels pack a lane index into low bits of int32
    # scores: the fitting DP carries 9 column bits (windows <= 512
    # text chars), the affine kernel 8 (patterns <= 256). Long-read
    # shapes (-rl, snapxl-style) fall back to the jnp recurrences.
    if jax.default_backend() == "tpu" and L + AG_W + 1 <= 256:
        from ..ops.affine_pallas import (
            affine_extend_pallas as affine_extend,
        )
    else:
        from ..ops.affine import affine_extend

    G = didx.genome.shape[0]

    def gather_genome(pos):
        inb = (pos >= 0) & (pos < G)
        return jnp.where(
            inb, didx.genome[jnp.clip(pos, 0, G - 1)], np.uint8(5)
        )

    # affine-gap head/tail extensions (BaseAligner.cpp:1203-1290) on the
    # same subset: escalation only ever applies to candidates here
    seed = params.seed_len
    tail_start = (s_off + seed).astype(jnp.int32)
    jj = jnp.arange(L, dtype=jnp.int32)[None, :]
    TW = L + AG_W + 1
    tcols = jnp.arange(TW, dtype=jnp.int64)[None, :]

    def gather_window(start):
        """[M, TW] forward genome window starting at `start`, via
        [G/8, 8] row gathers (TW/8+2 row indices per candidate instead
        of TW element indices — TPU gather cost scales with the index
        count). Out-of-bounds positions read as PAD (5)."""
        if G % 8 != 0:
            return gather_genome(start[:, None] + tcols)
        g8 = didx.genome.reshape(-1, 8)
        r0 = start >> 3
        nrows = TW // 8 + 2
        blocks = [
            g8[jnp.clip(r0 + j, 0, g8.shape[0] - 1)]
            for j in range(nrows)
        ]
        ab = jnp.concatenate(blocks, axis=1)
        sh = (start & 7).astype(jnp.int32)
        out = jnp.zeros((start.shape[0], TW), jnp.uint8)
        for s in range(8):
            out = jnp.where(
                (sh == s)[:, None],
                jax.lax.slice_in_dim(ab, s, s + TW, axis=1),
                out,
            )
        pos = start[:, None] + tcols
        return jnp.where((pos >= 0) & (pos < G), out, np.uint8(5))

    t_idx = (jj + tail_start[:, None]).astype(jnp.int64)
    t_ok = t_idx < s_plen[:, None]
    t_idxc = jnp.clip(t_idx, 0, L - 1)
    tail_pat = jnp.where(t_ok, jnp.take_along_axis(s_pat, t_idxc, axis=1), np.uint8(4))
    tail_logq = jnp.where(t_ok, jnp.take_along_axis(s_logq, t_idxc, axis=1), 0.0)
    tail_plen = jnp.maximum(s_plen - tail_start, 0).astype(jnp.int32)
    tail_text = gather_window(s_loc + tail_start.astype(jnp.int64))
    tail_tlen = jnp.minimum(
        tail_plen + params.max_k + s_bonus, jnp.int32(TW - 1)
    ).astype(jnp.int32)
    ebonus_tail = jnp.where(
        s_dir == 1, np.int32(params.ag_b5), np.int32(params.ag_b3)
    )
    tail = affine_extend(
        tail_pat, tail_logq, tail_plen, tail_text, tail_tlen,
        s_plen.astype(jnp.int32), ebonus_tail,
        match=params.ag_match, sub=params.ag_sub,
        gap_open=params.ag_open, gap_extend=params.ag_extend,
    )

    h_idx = (s_off[:, None] - 1 - jj).astype(jnp.int64)
    h_ok = h_idx >= 0
    h_idxc = jnp.clip(h_idx, 0, L - 1)
    head_pat = jnp.where(h_ok, jnp.take_along_axis(s_pat, h_idxc, axis=1), np.uint8(4))
    head_logq = jnp.where(h_ok, jnp.take_along_axis(s_logq, h_idxc, axis=1), 0.0)
    head_plen = s_off.astype(jnp.int32)
    head_text = jnp.flip(
        gather_window(s_loc + s_off.astype(jnp.int64) - TW), axis=1
    )
    head_tlen = jnp.minimum(
        head_plen + params.max_k + s_bonus, jnp.int32(TW - 1)
    ).astype(jnp.int32)
    ebonus_head = jnp.where(
        s_dir == 1, np.int32(params.ag_b3), np.int32(params.ag_b5)
    )
    head = affine_extend(
        head_pat, head_logq, head_plen, head_text, head_tlen,
        s_plen.astype(jnp.int32), ebonus_head,
        match=params.ag_match, sub=params.ag_sub,
        gap_open=params.ag_open, gap_extend=params.ag_extend,
    )

    # ---- seed-anchored Landau-Vishkin: tail forward from the seed end
    # plus reverse LV over the head, on the SAME pattern/text rows the
    # affine extensions use (BaseAligner.cpp:1160-1176, LandauVishkin.h:
    # 100). Anchoring is load-bearing for parity: a windowed DP scores
    # nearby candidates identically (they see the same window), while
    # SNAP's per-candidate scores differ by the distance off the anchor
    # diagonal — that difference drives pair selection and MAPQ.
    if jax.default_backend() == "tpu" and TW + 1 <= 512:
        from ..ops.dp_pallas import fitting_edit_distance_pallas

        lv_tail = fitting_edit_distance_pallas(
            tail_pat, tail_logq, tail_plen, tail_text, anchored=True
        )
        lv_head = fitting_edit_distance_pallas(
            head_pat, head_logq, head_plen, head_text, anchored=True
        )
    else:
        lv_tail = fitting_edit_distance(
            tail_pat, tail_logq, tail_plen, tail_text, anchored=True
        )
        lv_head = fitting_edit_distance(
            head_pat, head_logq, head_plen, head_text, anchored=True
        )
    t_empty = tail_plen == 0
    h_empty = head_plen == 0
    t_dist = jnp.where(t_empty, 0, lv_tail.dist)
    h_dist = jnp.where(h_empty, 0, lv_head.dist)
    t_lp = jnp.where(t_empty, 0.0, lv_tail.log_prob)
    h_lp = jnp.where(h_empty, 0.0, lv_head.log_prob)
    s_lv_dist = t_dist + h_dist
    s_lv_logp = t_lp + h_lp + np.float32(seed) * np.float32(LOG_PERFECT)
    lv_indels = jnp.where(t_empty, 0, lv_tail.indels) + jnp.where(
        h_empty, 0, lv_head.indels
    )
    s_end = (
        s_loc
        + (s_off + seed).astype(jnp.int64)
        + jnp.where(t_empty, 0, lv_tail.end_col).astype(jnp.int64)
    )

    s_lv_ok = sel_live & (s_lv_dist <= mk_eff)
    ag_ok = tail.valid & head.valid
    ag_score = tail.score + head.score + seed - 2 * s_plen
    ag_edits = tail.edits + head.edits
    ag_logp = (
        tail.log_prob + head.log_prob
        + np.float32(seed) * np.float32(LOG_PERFECT)
    )
    ag_body_loc = s_loc + (s_off - head.text_used).astype(jnp.int64)

    if params.use_affine_gap:
        # escalation gate: score1 + score2 > maxKForSameAlignment
        # (BaseAligner.cpp:1204) — exact now that the LV is anchored
        s_esc = s_lv_ok & (s_lv_dist > params.max_k_same)
    else:  # -G-: never escalate to affine gap
        s_esc = jnp.zeros_like(s_lv_ok)
    s_dist = jnp.where(s_esc, ag_edits, s_lv_dist)
    s_logp = jnp.where(s_esc, ag_logp, s_lv_logp)
    # phase-3 parity: SNAP's paired aligner selects pairs on the plain
    # LV matchProbability and only swaps in the affine values for the
    # winner in phase 4 (IntersectingPairedEndAligner.cpp:2509-2626),
    # so the pre-escalation LV log-prob rides along
    s_lv_logp_out = s_lv_logp
    s_agsc = jnp.where(
        s_esc, ag_score,
        s_plen - (params.ag_match + params.ag_sub) * s_lv_dist,
    )
    s_ok = s_lv_ok & jnp.where(s_esc, ag_ok, True)
    s_clip_b = jnp.where(s_esc, head.pattern_clip, 0)
    s_clip_a = jnp.where(s_esc, tail.pattern_clip, 0)
    s_body = jnp.where(s_esc, ag_body_loc, s_loc)
    s_indels = jnp.where(s_esc, jnp.int32(1 << 20), lv_indels)
    return SubsetOut(
        dist=s_dist, lv_dist=s_lv_dist.astype(jnp.int32), indels=s_indels,
        log_prob=s_logp, ag_score=s_agsc,
        end_loc=s_end, body_loc=s_body, escalated=s_esc,
        clip_before=s_clip_b, clip_after=s_clip_a, valid=s_ok,
        lv_log_prob=s_lv_logp_out,
    )


class Tier1Out(NamedTuple):
    """Candidate generation + gapless prescreen results (two-phase API).

    The host inspects gapless_dist/weight, decides which candidates need
    the expensive DP tier, and calls score_rows on just those — so clean
    batches never pay for the DP/affine kernels at all (the dynamic
    equivalent of SNAP never calling LV when the XOR scan says perfect).
    """

    cand_loc: jax.Array      # [B, K] int64
    seed_off: jax.Array      # [B, K] int32
    direction: jax.Array     # [B, K] int32
    valid: jax.Array         # [B, K] bool candidate exists
    weight: jax.Array        # [B, K] int32 seed votes
    gapless_dist: jax.Array  # [B, K] int32 mismatches at anchored offset
    gapless_logp: jax.Array  # [B, K] float32
    len_eff: jax.Array       # [B] int32
    popular: jax.Array       # [B] int32
    n_lookups: jax.Array     # [B] int32
    truncated: jax.Array     # [B] bool gather cap overflowed (redo wide)
    big_indel: jax.Array     # [B, K] int16 phase-2a score-raise bonus
                             # (paired; zeros on the single-end path)


class SubsetOut(NamedTuple):
    """Full DP + affine-gap results for a compacted row subset."""

    dist: jax.Array
    lv_dist: jax.Array   # pre-clipping Landau-Vishkin distance: SNAP's
                         # Ukkonen limit gates on THIS (an AG-clipped
                         # alignment keeps its LV score for limit
                         # purposes, BaseAligner.cpp:1160-1205)
    indels: jax.Array
    log_prob: jax.Array
    ag_score: jax.Array
    end_loc: jax.Array
    body_loc: jax.Array
    escalated: jax.Array
    clip_before: jax.Array
    clip_after: jax.Array
    valid: jax.Array
    lv_log_prob: jax.Array  # pre-escalation LV ln(matchProbability)
                            # (phase-3 pair selection key; see
                            # IntersectingPairedEndAligner.cpp:975-1005)


def _align_impl(
    didx: DeviceIndex,
    bases: jax.Array,   # [B, L] uint8
    quals: jax.Array,   # [B, L] uint8
    lens: jax.Array,    # [B] int32
    params: AlignParams,
    tier1_only: bool = False,
    dp_rows: int | None = None,
    return_needs: bool = False,
    return_lowest: bool = False,
    cand_only: bool = False,
):
    B, L = bases.shape
    S = params.num_lookups
    H = params.hit_cap
    K = params.max_cand
    seed = params.seed_len
    margin = max(params.max_k, params.mki) + 1
    W = L + 2 * margin

    len_eff = (
        clip_back(quals, lens) if params.clip_back else lens.astype(jnp.int32)
    )
    rc_bases, rc_quals = reverse_complement_reads(bases, quals, len_eff)

    # ---- seed offsets in SNAP probe order (first pass 0, s, 2s, ...,
    # then wrapped rounds; BaseAligner.cpp:451-526) ----
    fwd_all, rc_all, valid_all = pack_read_seeds(bases, seed)  # [B, P]
    P = L - seed + 1
    wrap_of_residue = snap_seed_wrap_order(seed)  # static table
    pos = np.arange(P, dtype=np.int32)
    rank_static = wrap_of_residue[pos % seed] * (P // seed + 2) + pos // seed
    rank = jnp.asarray(rank_static, dtype=jnp.int32)[None, :]  # [1, P]
    INF_RANK = np.int32(1 << 30)
    usable = valid_all & (pos[None, :] <= (len_eff - seed)[:, None])
    ranks = jnp.where(usable, rank, INF_RANK)  # [B, P]
    # S smallest ranks = the offsets SNAP would probe, in order
    # one payload sort instead of top_k + 3 take_along_axis gathers:
    # sorts shuffle lanes without per-element random gathers, which on
    # TPU makes the sort strictly cheaper than the gathers it replaces
    posP = jnp.broadcast_to(
        jnp.arange(P, dtype=jnp.int32)[None, :], (B, P)
    )
    rank_s, offsets, seed_fwd, seed_rc = (
        a[:, :S]
        for a in jax.lax.sort(
            (ranks, posP, fwd_all, rc_all),
            dimension=1, num_keys=1, is_stable=True,
        )
    )
    seed_ok = rank_s < INF_RANK  # usable already folds valid_all in

    canonical = jnp.minimum(seed_fwd, seed_rc)
    read_is_canon = seed_fwd <= seed_rc

    found, start, n0, n1 = probe(
        didx, canonical.reshape(-1), params.max_probe
    )
    found = found & seed_ok.reshape(-1)
    start0 = start
    start1 = start + n0.astype(jnp.int64)
    ric = read_is_canon.reshape(-1)
    f_start = jnp.where(ric, start0, start1)
    f_n = jnp.where(ric, n0, n1)
    r_start = jnp.where(ric, start1, start0)
    r_n = jnp.where(ric, n1, n0)

    # popular-seed skip (per direction)
    pop_f = found & (f_n > params.max_hits)
    pop_r = found & (r_n > params.max_hits)
    popular = (
        pop_f.reshape(B, S).sum(axis=1) + pop_r.reshape(B, S).sum(axis=1)
    ).astype(jnp.int32)
    if params.explore_popular:
        # -x explorePopularSeeds: don't skip, score the top maxHits
        # (gather cap H applies; BaseAligner.cpp:574-579 -x branch)
        f_n = jnp.where(found, f_n, 0)
        r_n = jnp.where(found, r_n, 0)
    else:
        f_n = jnp.where(found & ~pop_f, f_n, 0)
        r_n = jnp.where(found & ~pop_r, r_n, 0)

    lowest_possible = None
    if return_lowest:
        # SNAP's seed-loop stop bound: after each applied seed,
        # lowestPossibleScoreOfAnyUnseenLocation[dir] = max over rounds
        # of nSeedsApplied[dir] // (wrapCount + 1)
        # (BaseAligner.cpp:993-1012). Popular-skipped probes don't
        # count as applied in that direction (BaseAligner.cpp:669
        # increments only in the not-too-popular branch); -x counts
        # everything. The wrap round of each probe is recoverable from
        # its rank (rank = wrap * DIV + offset_index).
        DIV = P // seed + 2
        wrap_round = jnp.where(seed_ok, rank_s // DIV, 0).astype(
            jnp.int32
        )
        if params.explore_popular:
            ap_f = seed_ok.astype(jnp.int32)
            ap_r = ap_f
        else:
            ap_f = (seed_ok & ~pop_f.reshape(B, S)).astype(jnp.int32)
            ap_r = (seed_ok & ~pop_r.reshape(B, S)).astype(jnp.int32)
        den = wrap_round + 1
        low_f = jnp.max(
            jnp.where(seed_ok, jnp.cumsum(ap_f, axis=1) // den, 0), axis=1
        )
        low_r = jnp.max(
            jnp.where(seed_ok, jnp.cumsum(ap_r, axis=1) // den, 0), axis=1
        )
        lowest_possible = jnp.minimum(low_f, low_r).astype(jnp.int32)

    # Stage barriers: without them XLA fuses the cheap index math into
    # several expensive consumers and recomputes the [B*S, H] expansions
    # repeatedly — the monolithic graph measured 2x slower than the same
    # stages compiled separately.
    f_start, f_n, r_start, r_n = jax.lax.optimization_barrier(
        (f_start, f_n, r_start, r_n)
    )

    f_locs, f_valid = gather_hits(didx.hits, f_start, f_n, H)  # [B*S, H]
    r_locs, r_valid = gather_hits(didx.hits, r_start, r_n, H)
    f_locs, f_valid, r_locs, r_valid = jax.lax.optimization_barrier(
        (f_locs, f_valid, r_locs, r_valid)
    )

    # ---- candidate locations ----
    off_flat = offsets.reshape(-1, 1).astype(jnp.int64)
    le_flat = jnp.repeat(len_eff, S).reshape(-1, 1).astype(jnp.int64)
    cand_f = f_locs.astype(jnp.int64) - off_flat
    cand_r = r_locs.astype(jnp.int64) - (le_flat - seed - off_flat)

    # key packs (dir, location, probe-order index, offset value); dedup
    # ignores everything below the location, so the payload carried out
    # per candidate is the FIRST-probed seed's — SNAP's
    # candidate->seedOffset comes from the seed that inserted the
    # candidate. The offset VALUE rides in the low bits so no
    # offsets-table gather is needed afterwards (a [B, K] element
    # gather costs real time on TPU); probe order above it preserves
    # the insertion-order tie rule. Reads longer than 1024 would
    # overflow the offset field — pack the probe index alone there and
    # gather (snapxl-class shapes are latency-insensitive).
    OFFV_BITS = 10 if L <= 1024 else 0
    PROBE_BITS = 10
    OFF_BITS = PROBE_BITS + OFFV_BITS
    BIG = jnp.int64(1) << (42 + OFF_BITS)
    INF_KEY = jnp.int64(3) << 61  # sorts after every valid key (dir-1
                                  # keys reach BIG + 2^52 < 1.5 * 2^62)
    probe_ix = jnp.broadcast_to(
        jnp.arange(S, dtype=jnp.int64)[None, :, None], (B, S, H)
    ).reshape(B * S, H)
    if OFFV_BITS:
        payload = (probe_ix << OFFV_BITS) | off_flat
    else:
        payload = probe_ix
    key_f = jnp.where(f_valid, (cand_f << OFF_BITS) | payload, INF_KEY)
    key_r = jnp.where(
        r_valid, ((cand_r << OFF_BITS) | payload) + BIG, INF_KEY
    )
    keys = jnp.concatenate(
        [key_f.reshape(B, S * H), key_r.reshape(B, S * H)], axis=1
    )  # [B, M]
    M = 2 * S * H
    keys = jnp.sort(keys, axis=1)

    # run-length dedup + weights on (dir, location) only
    kid = keys >> OFF_BITS
    is_start = jnp.concatenate(
        [jnp.ones((B, 1), bool), kid[:, 1:] != kid[:, :-1]], axis=1
    )
    posm = jnp.arange(M, dtype=jnp.int32)[None, :]
    start_pos = jnp.where(is_start, posm, M)
    # next run start after each position: reverse exclusive cummin
    rev = jnp.flip(start_pos, axis=1)
    nxt = jax.lax.associative_scan(jnp.minimum, rev, axis=1)
    nxt = jnp.flip(nxt, axis=1)
    next_start = jnp.concatenate(
        [nxt[:, 1:], jnp.full((B, 1), M, jnp.int32)], axis=1
    )
    weight = jnp.where(is_start & (keys < INF_KEY), next_start - posm, -1)

    wv, wi = jax.lax.top_k(weight, K)  # [B, K]
    cand_keys = jnp.take_along_axis(keys, wi.astype(jnp.int64), axis=1)
    # -ms minWeightToCheck: candidates below the seed-vote floor are
    # never scored (BaseAligner minWeightToCheck)
    cand_valid = wv >= max(1, params.min_weight)
    cand_weight = jnp.maximum(wv, 0).astype(jnp.int32)
    cand_dir = (cand_keys >= BIG).astype(jnp.int32)
    stripped = jnp.where(cand_dir == 1, cand_keys - BIG, cand_keys)
    cand_loc = stripped >> OFF_BITS
    cand_loc = jnp.where(cand_valid, cand_loc, 0)
    # offset payload -> oriented read offset; RC-oriented patterns
    # anchor at len_eff - seed_len - offset (BaseAligner.cpp:591-606)
    if OFFV_BITS:
        off_of_probe = (stripped & ((1 << OFFV_BITS) - 1)).astype(
            jnp.int64
        )
    else:
        cand_probe = (stripped & ((1 << PROBE_BITS) - 1)).astype(
            jnp.int64
        )
        off_of_probe = jnp.take_along_axis(offsets, cand_probe, axis=1)
    cand_off = jnp.where(
        cand_dir == 1,
        len_eff[:, None] - seed - off_of_probe,
        off_of_probe,
    ).astype(jnp.int32)
    cand_off = jnp.where(cand_valid, jnp.maximum(cand_off, 0), 0)
    cand_loc, cand_off, cand_dir, cand_valid, cand_weight = (
        jax.lax.optimization_barrier(
            (cand_loc, cand_off, cand_dir, cand_valid, cand_weight)
        )
    )

    # per-read truncation flag: (a) some usable lookup had more hits
    # than the gather cap H but was not popular-skipped — its tail hits
    # never became candidates; (b) more distinct in-budget candidates
    # existed than the K-wide tile holds (SNAP scores every candidate,
    # BaseAligner.cpp:918-1028 — the cap is ours). Either way pAll /
    # MAPQ may be wrong and the driver re-runs flagged reads through
    # the host full-hit-list path (wide_single_candidates).
    n_cand = (weight >= max(1, params.min_weight)).sum(axis=1)
    trunc = (
        ((f_n > H).reshape(B, S).any(axis=1))
        | ((r_n > H).reshape(B, S).any(axis=1))
        | (n_cand > K)
    )

    if cand_only:
        bundle = (
            cand_loc, cand_off, cand_dir, cand_valid, cand_weight,
            popular, trunc, len_eff,
            seed_ok.sum(axis=1).astype(jnp.int32),
        )
        if return_lowest:
            return bundle, lowest_possible
        return bundle

    res = _score_from_candidates(
        didx, bases, rc_bases, logq_f_in=None, logq_r_in=None, quals=quals,
        rc_quals=rc_quals, len_eff=len_eff,
        cand_loc=cand_loc, cand_off=cand_off, cand_dir=cand_dir,
        cand_valid=cand_valid, cand_weight=cand_weight,
        popular=popular, truncated=trunc,
        n_lookups=seed_ok.sum(axis=1).astype(jnp.int32),
        params=params, tier1_only=tier1_only, dp_rows=dp_rows,
        return_needs=return_needs,
    )
    if return_lowest:
        if return_needs:
            return res[0], res[1], lowest_possible
        return res, lowest_possible
    return res


def window_words(arr, w0, WW):
    """[N, WW] consecutive words starting at per-row word index w0, via
    ceil((WW+7)/8) row gathers of an [n/8, 8] view + one 8-way phase
    select (gather cost on TPU scales with the number of indices)."""
    if arr.shape[0] % 8 != 0:
        return arr[
            jnp.clip(
                w0[:, None] + jnp.arange(WW, dtype=jnp.int64)[None, :],
                0, arr.shape[0] - 1,
            )
        ]
    a2 = arr.reshape(-1, 8)
    nrows = (WW + 7 + 7) // 8
    r0 = w0 >> 3
    blocks = [
        a2[jnp.clip(r0 + j, 0, a2.shape[0] - 1)] for j in range(nrows)
    ]
    ab = jnp.concatenate(blocks, axis=1)  # [N, nrows*8]
    shw = (w0 & 7).astype(jnp.int32)
    out = jnp.zeros((w0.shape[0], WW), arr.dtype)
    for s in range(8):
        out = jnp.where(
            (shw == s)[:, None],
            jax.lax.slice_in_dim(ab, s, s + WW, axis=1),
            out,
        )
    return out


def align_words(w, ph, lane_bits):
    """Funnel-shift adjacent words by the per-row phase so lane 0 holds
    the window's first base — one variable-shift pass instead of
    nphases shifted jnp.where selects over [N, L]."""
    sh = (lane_bits * ph).astype(jnp.uint32)[:, None]
    lo = w[:, :-1] >> sh
    hi = jnp.where(
        sh == 0, np.uint32(0), w[:, 1:] << (np.uint32(32) - sh)
    )
    return lo | hi  # [N, W-1]


def _score_from_candidates(
    didx: DeviceIndex,
    bases: jax.Array,     # [B, L] uint8
    rc_bases: jax.Array,  # [B, L] uint8 (RC of clipped read)
    logq_f_in,            # [B, L] f32 or None (computed from quals)
    logq_r_in,
    quals: jax.Array,
    rc_quals: jax.Array,
    len_eff: jax.Array,   # [B] int32
    cand_loc: jax.Array,  # [B, K] int64
    cand_off: jax.Array,  # [B, K] int32 oriented anchor offset
    cand_dir: jax.Array,  # [B, K] int32
    cand_valid: jax.Array,  # [B, K] bool
    cand_weight: jax.Array, # [B, K] int32
    popular: jax.Array,   # [B] int32
    truncated: jax.Array, # [B] bool
    n_lookups: jax.Array, # [B] int32
    params: AlignParams,
    tier1_only: bool = False,
    dp_rows: int | None = None,
    return_needs: bool = False,
    max_k_bonus: jax.Array | None = None,  # [B, K] i32 phase-2a raises
):
    """Two-tier scoring of an arbitrary [B, K] candidate set.

    Shared by the device candidate-generation path (_align_impl) and
    injected candidates (paired intersection, wide-hit redo passes).
    """
    B, L = bases.shape
    K = cand_loc.shape[1]
    margin = max(params.max_k, params.mki) + 1
    W = L + 2 * margin
    if max_k_bonus is None:
        flat_bonus = jnp.zeros((B * K,), jnp.int32)
    else:
        flat_bonus = max_k_bonus.reshape(-1).astype(jnp.int32)
    flat_mk_eff = jnp.minimum(
        jnp.int32(params.max_k) + flat_bonus, jnp.int32(126)
    )
    # =====================================================================
    # Scoring. Two tiers, like SNAP's own split between the 64-bit XOR
    # perfect-match scan and the full DP (LandauVishkin.h:377-407):
    #
    #   Tier 1 (every candidate): GAPLESS score at the anchored offset,
    #   read against the 2-bit-packed genome — pure elementwise VPU work,
    #   no per-base gathers.
    #
    #   Tier 2 (compacted subset): candidates whose gapless distance
    #   exceeds maxKForSameAlignment get the full fitting DP and the
    #   affine-gap head/tail extensions. In real data only a small
    #   fraction of candidates need this, so the expensive kernels run
    #   on BK/DP_COMPACT rows instead of BK.
    # =====================================================================
    from ..ops.dp import LOG_PERFECT

    BK = B * K
    flat_dir = cand_dir.reshape(-1)  # [B*K]
    read_ix = jnp.repeat(jnp.arange(B, dtype=jnp.int64), K)
    # phred->log-error lookup per READ ([B, L] element gathers); the
    # naive logq_table[patq] is a [B*K, L] random-element gather and
    # dominated the whole tier-1 step; even the per-READ table lookup
    # is a 1.6M-index gather, so the log-error comes from elementwise
    # arithmetic (device_logq)
    if logq_f_in is None:
        logq_f = device_logq(quals)
        logq_r = device_logq(rc_quals)
    else:
        logq_f, logq_r = logq_f_in, logq_r_in
    plen = len_eff[read_ix]
    flat_loc = cand_loc.reshape(-1)           # [BK]
    flat_off = cand_off.reshape(-1)
    flat_valid = cand_valid.reshape(-1)
    use_gapless_kernel = (
        didx.genome_packed is not None
        and didx.genome_bad16 is not None
        and jax.default_backend() == "tpu"
    )
    if not use_gapless_kernel:
        # candidate-row views (the fused kernel broadcasts per read
        # inside VMEM instead of materializing these [B*K, L] arrays)
        pat = jnp.where(
            (flat_dir == 1)[:, None], rc_bases[read_ix], bases[read_ix]
        )
        pat_logq = jnp.where(
            (flat_dir == 1)[:, None], logq_r[read_ix], logq_f[read_ix]
        )

    # ---- Tier 1: gapless prescreen over packed words ----
    if didx.genome_packed is not None:
        G = didx.genome.shape[0]
        loc_c = jnp.clip(flat_loc, 0, G - 1)
        w0 = loc_c // 16
        phase = (loc_c % 16).astype(jnp.int32)
        WW = L // 16 + 2

        def window_pairs(pb, w0, WW):
            # interleaved (packed, bad16) planes: 2*WW consecutive
            # elements from the [n/16, 16] view — 2 row gathers pull
            # BOTH planes at once (vs 4 with separate arrays)
            e0 = 2 * w0
            r0 = e0 >> 4
            nrows = (2 * WW + 15 + 15) // 16
            blocks = [
                pb[jnp.clip(r0 + j, 0, pb.shape[0] - 1)]
                for j in range(nrows)
            ]
            ab = jnp.concatenate(blocks, axis=1)
            shw = (e0 & 15).astype(jnp.int32)  # even phases only
            out = jnp.zeros((w0.shape[0], 2 * WW), pb.dtype)
            for s in range(0, 16, 2):
                out = jnp.where(
                    (shw == s)[:, None],
                    jax.lax.slice_in_dim(ab, s, s + 2 * WW, axis=1),
                    out,
                )
            return out[:, 0::2], out[:, 1::2]

        if use_gapless_kernel and didx.genome_pb16 is not None:
            words, b16 = window_pairs(didx.genome_pb16, w0, WW)
        else:
            words = window_words(didx.genome_packed, w0, WW)  # [BK, WW]
            b16 = None

        aligned = align_words(words, phase, 2)

        if use_gapless_kernel:
            from ..ops.gapless_pallas import gapless_prescreen_pallas

            PW = (L + 15) // 16
            t_w = aligned[:, :PW]
            if b16 is None:
                b16 = window_words(didx.genome_bad16, w0, WW)
            bad_w = align_words(b16, phase, 2)[:, :PW]

            def pack_pat16(mat):
                padw = PW * 16 - L
                m = jnp.pad(
                    mat, ((0, 0), (0, padw)), constant_values=4
                )
                w = m.reshape(B, PW, 16).astype(jnp.uint32)
                sh = (2 * jnp.arange(16, dtype=jnp.uint32))[None, None, :]
                codes = jnp.where(w < np.uint32(4), w, np.uint32(0)) << sh
                nb = (w >= np.uint32(4)).astype(jnp.uint32) << sh
                return (
                    jnp.sum(codes, axis=2, dtype=jnp.uint32),
                    jnp.sum(nb, axis=2, dtype=jnp.uint32),
                )

            fw, fbad = pack_pat16(bases)
            rw, rbad = pack_pat16(rc_bases)
            gd2, glp_err = gapless_prescreen_pallas(
                t_w.reshape(B, K * PW), bad_w.reshape(B, K * PW),
                fw, rw, fbad, rbad, logq_f, logq_r,
                cand_dir.astype(jnp.int32), len_eff, K, PW,
            )
            gapless_dist = gd2.reshape(-1)
            gapless_logp = (
                glp_err.reshape(-1)
                + (plen - gapless_dist).astype(jnp.float32)
                * np.float32(LOG_PERFECT)
            )
        elif didx.genome_bad16 is not None:
            # XOR + popcount over 2-bit-packed words — the TPU form of
            # SNAP's 64-bit XOR scan (LandauVishkin.h:377-407). Invalid
            # text bases arrive pre-spread at even bit positions
            # (genome_bad16, same word geometry, same funnel shift);
            # read Ns and the in-read length mask are per-word planes.
            PW = (L + 15) // 16
            t_w = aligned[:, :PW]
            b16 = window_words(didx.genome_bad16, w0, WW)
            bad_w = align_words(b16, phase, 2)[:, :PW]

            def pack_pat16(mat):
                padw = PW * 16 - L
                m = jnp.pad(
                    mat, ((0, 0), (0, padw)), constant_values=4
                )
                w = m.reshape(B, PW, 16).astype(jnp.uint32)
                sh = (2 * jnp.arange(16, dtype=jnp.uint32))[None, None, :]
                codes = jnp.where(w < np.uint32(4), w, np.uint32(0)) << sh
                nb = (w >= np.uint32(4)).astype(jnp.uint32) << sh
                return (
                    jnp.sum(codes, axis=2, dtype=jnp.uint32),
                    jnp.sum(nb, axis=2, dtype=jnp.uint32),
                )

            fw, fbad = pack_pat16(bases)
            rw, rbad = pack_pat16(rc_bases)
            dsel = (flat_dir == 1)[:, None]
            pat_w = jnp.where(dsel, rw[read_ix], fw[read_ix])
            pat_b = jnp.where(dsel, rbad[read_ix], fbad[read_ix])
            x = t_w ^ pat_w
            mism_bits = (
                ((x | (x >> np.uint32(1))) & np.uint32(0x55555555))
                | bad_w
                | pat_b
            )
            wbase = (16 * jnp.arange(PW, dtype=jnp.int32))[None, :]
            r16 = jnp.clip(plen[:, None] - wbase, 0, 16).astype(jnp.uint32)
            full = np.uint32(0x55555555)
            partial = (
                (jnp.uint32(1) << (np.uint32(2) * r16)) - np.uint32(1)
            ) & full
            lane_mask = jnp.where(r16 >= np.uint32(16), full, partial)
            mism_bits = mism_bits & lane_mask
            gapless_dist = jnp.sum(
                jax.lax.population_count(mism_bits),
                axis=1, dtype=jnp.int32,
            )
            mb = (
                mism_bits[:, :, None]
                >> (2 * jnp.arange(16, dtype=jnp.uint32))
            ) & np.uint32(1)
            mism = mb.reshape(BK, PW * 16)[:, :L].astype(bool)
            gapless_logp = (
                jnp.where(mism, pat_logq, 0.0).sum(axis=1)
                + (plen - gapless_dist).astype(jnp.float32)
                * np.float32(LOG_PERFECT)
            )
        else:
            lanes = (
                aligned[:, :, None]
                >> (2 * jnp.arange(16, dtype=jnp.uint32))
            ) & np.uint32(3)
            text_g = (
                lanes.reshape(BK, (WW - 1) * 16)[:, :L].astype(jnp.uint8)
            )
            b0w = loc_c // 32
            bphase = (loc_c % 32).astype(jnp.int32)
            BW = L // 32 + 2
            bwords = window_words(didx.genome_bad, b0w, BW)
            baligned = align_words(bwords, bphase, 1)
            badlanes = (
                baligned[:, :, None] >> jnp.arange(32, dtype=jnp.uint32)
            ) & np.uint32(1)
            text_bad = (
                badlanes.reshape(BK, (BW - 1) * 32)[:, :L].astype(bool)
            )
            jl = jnp.arange(L, dtype=jnp.int32)[None, :]
            in_read = jl < plen[:, None]
            in_genome = (flat_loc[:, None] + jl) < G
            mism = (
                ((text_g != pat) | text_bad | (pat >= 4) | ~in_genome)
                & in_read
            )
            gapless_dist = mism.sum(axis=1).astype(jnp.int32)
            gapless_logp = (
                jnp.where(mism, pat_logq, 0.0).sum(axis=1)
                + (plen - gapless_dist).astype(jnp.float32)
                * np.float32(LOG_PERFECT)
            )
    else:  # no packed genome available: force everything through the DP
        gapless_dist = jnp.full((BK,), np.int32(1 << 20))
        gapless_logp = jnp.zeros((BK,), jnp.float32)

    if tier1_only:
        # compact dtypes: tier-1 outputs cross device->host every batch,
        # and the transport (HBM, PCIe, or a tunnel) charges per byte
        return Tier1Out(
            cand_loc=cand_loc.astype(jnp.uint32),
            seed_off=cand_off.astype(jnp.int16),
            direction=cand_dir.astype(jnp.uint8),
            valid=cand_valid,
            weight=jnp.minimum(cand_weight, 255).astype(jnp.uint8),
            gapless_dist=jnp.minimum(
                gapless_dist.reshape(B, K), 1 << 14
            ).astype(jnp.int16),
            gapless_logp=gapless_logp.reshape(B, K),
            len_eff=len_eff,
            popular=popular,
            n_lookups=n_lookups,
            truncated=truncated,
            big_indel=jnp.minimum(flat_bonus, 1023)
            .astype(jnp.int16)
            .reshape(B, K),
        )

    # ---- Tier 2: compact candidates that need gaps ----
    GAPLESS_OK = params.max_k_same  # 2 with default penalties
    flat_weight = cand_weight.reshape(-1)
    # Which candidates justify the full DP? Gapless failures that more
    # than one seed voted for — SNAP's weight-ordered candidate scoring
    # (BaseAligner.h:356, weight lists): a real indel locus collects the
    # seeds from both sides of the indel (two nearby high-weight bins),
    # while random spurious seed hits are weight-1 and score gapless.
    needs_dp = flat_valid & (gapless_dist > GAPLESS_OK)
    if didx.genome_packed is None:
        M = BK  # no prescreen possible: run the full DP everywhere
        sel_key = needs_dp.astype(jnp.int32)
    else:
        # per-read guarantee: when a read has NO good gapless candidate
        # (indel reads, junk), its top-2 weight-ranked candidates get the
        # DP regardless of weight — otherwise weight-1 indel loci would
        # never be scored (candidates come out of top_k weight-sorted,
        # so k < 2 IS the top-2 rank)
        read_min_gapless = jnp.min(
            jnp.where(
                cand_valid, gapless_dist.reshape(B, K), np.int32(1 << 20)
            ),
            axis=1,
        )
        read_needs = (read_min_gapless > GAPLESS_OK)[:, None]
        kpos = jnp.arange(K, dtype=jnp.int32)[None, :]
        promote = (read_needs & (kpos < 2)).reshape(-1)
        needs_dp = needs_dp & ((flat_weight >= 2) | promote)
        M = (
            min(dp_rows, BK)
            if dp_rows is not None
            else max(BK // 8, min(BK, 64))
        )
        # overflow priority: promoted top-2 first, then by weight
        sel_key = jnp.where(
            needs_dp, flat_weight + jnp.where(promote, 1 << 20, 0), 0
        )
    _, sel_idx = jax.lax.top_k(sel_key, M)
    sel_idx = sel_idx.astype(jnp.int64)
    sel_live = needs_dp[sel_idx]

    if use_gapless_kernel:
        # build the oriented pattern rows for just the DP subset (the
        # full [B*K, L] views are never materialized on this path)
        sel_read = read_ix[sel_idx]
        sel_rc = (flat_dir[sel_idx] == 1)[:, None]
        pat_sel = jnp.where(sel_rc, rc_bases[sel_read], bases[sel_read])
        logq_sel = jnp.where(sel_rc, logq_r[sel_read], logq_f[sel_read])
    else:
        pat_sel = pat[sel_idx]
        logq_sel = pat_logq[sel_idx]
    sub = _score_rows(
        didx, pat_sel, logq_sel, plen[sel_idx],
        flat_loc[sel_idx], flat_off[sel_idx], flat_dir[sel_idx],
        sel_live, params, L, margin, W,
        s_bonus=flat_bonus[sel_idx],
    )
    (s_dist, s_indels, s_logp, s_agsc, s_end, s_body, s_esc, s_clip_b,
     s_clip_a, s_ok) = (
        sub.dist, sub.indels, sub.log_prob, sub.ag_score, sub.end_loc,
        sub.body_loc, sub.escalated, sub.clip_before, sub.clip_after,
        sub.valid,
    )

    # ---- combine tiers: scatter the subset results over the gapless ----
    def scatter(base, vals):
        return base.at[sel_idx].set(jnp.where(sel_live, vals, base[sel_idx]))

    gl_ok = flat_valid & ~needs_dp & (gapless_dist <= flat_mk_eff)
    dist = scatter(gapless_dist, s_dist)
    lv_dist = scatter(gapless_dist, sub.lv_dist.astype(gapless_dist.dtype))
    log_prob = scatter(gapless_logp, s_logp)
    agsc = scatter(
        plen - (params.ag_match + params.ag_sub) * gapless_dist, s_agsc
    )
    end_loc = scatter(flat_loc + plen.astype(jnp.int64), s_end)
    body_loc = scatter(flat_loc, s_body)
    ok = scatter(gl_ok, s_ok)
    esc = scatter(jnp.zeros_like(gl_ok), s_esc)
    clip_b = scatter(jnp.zeros((BK,), jnp.int32), s_clip_b)
    clip_a = scatter(jnp.zeros((BK,), jnp.int32), s_clip_a)
    indels = scatter(jnp.zeros((BK,), jnp.int32), s_indels)

    out = SingleAlignOut(
        dist=dist.reshape(B, K),
        lv_dist=lv_dist.reshape(B, K).astype(jnp.int32),
        indels=indels.reshape(B, K),
        log_prob=log_prob.reshape(B, K),
        ag_score=agsc.reshape(B, K),
        end_loc=end_loc.reshape(B, K),
        body_loc=body_loc.reshape(B, K),
        cand_loc=cand_loc,
        escalated=esc.reshape(B, K),
        clip_before=clip_b.reshape(B, K),
        clip_after=clip_a.reshape(B, K),
        seed_off=cand_off,
        direction=cand_dir,
        valid=ok.reshape(B, K),
        len_eff=len_eff,
        popular=popular,
        n_lookups=n_lookups,
        truncated=truncated,
    )
    if return_needs:
        return out, needs_dp.sum().astype(jnp.int32)
    return out


@functools.partial(jax.jit, static_argnames=("params", "tier1_only"))
def score_candidates(
    didx: DeviceIndex,
    bases: jax.Array,       # [B, L] uint8
    quals: jax.Array,       # [B, L] uint8
    len_eff: jax.Array,     # [B] int32 (host-computed clip)
    cand_loc: jax.Array,    # [B, K] int64
    cand_off: jax.Array,    # [B, K] int32 oriented anchor offsets
    cand_dir: jax.Array,    # [B, K] int32
    cand_valid: jax.Array,  # [B, K] bool
    cand_weight: jax.Array, # [B, K] int32
    popular: jax.Array,     # [B] int32
    params: AlignParams,
    tier1_only: bool = True,
    truncated: jax.Array | None = None,  # [B] bool (device-intersect
                                         # overflow -> host exact redo)
    max_k_bonus: jax.Array | None = None,  # [B, K] i32 phase-2a raises
) -> Tier1Out | SingleAlignOut:
    """Score an injected candidate set (host- or device-generated).

    Used by the paired-end intersection (align/intersect.py and its
    device twin align/intersect_device.py) and the wide-hit redo pass:
    candidate generation happened elsewhere; this runs the same
    two-tier scoring wavefront the device candidate path uses.
    """
    rc_bases, rc_quals = reverse_complement_reads(bases, quals, len_eff)
    B = bases.shape[0]
    zeros = jnp.zeros((B,), jnp.int32)
    return _score_from_candidates(
        didx, bases, rc_bases, logq_f_in=None, logq_r_in=None,
        quals=quals, rc_quals=rc_quals, len_eff=len_eff,
        cand_loc=cand_loc, cand_off=cand_off, cand_dir=cand_dir,
        cand_valid=cand_valid, cand_weight=cand_weight,
        popular=popular,
        truncated=(
            jnp.zeros((B,), bool) if truncated is None else truncated
        ),
        n_lookups=zeros, params=params, tier1_only=tier1_only,
        max_k_bonus=max_k_bonus,
    )


@functools.partial(jax.jit, static_argnames=("params",))
def align_single_device(
    didx: DeviceIndex,
    bases: jax.Array,   # [B, L] uint8
    quals: jax.Array,   # [B, L] uint8
    lens: jax.Array,    # [B] int32
    params: AlignParams,
) -> SingleAlignOut:
    """Monolithic single-call wavefront (mesh / dryrun / tests path)."""
    return _align_impl(didx, bases, quals, lens, params, tier1_only=False)


@functools.partial(jax.jit, static_argnames=("params",))
def align_tier1(
    didx: DeviceIndex,
    bases: jax.Array,
    quals: jax.Array,
    lens: jax.Array,
    params: AlignParams,
) -> Tier1Out:
    """Phase 1 of the two-phase driver path: candidates + gapless."""
    return _align_impl(didx, bases, quals, lens, params, tier1_only=True)


@functools.partial(jax.jit, static_argnames=("params",))
def score_rows(
    didx: DeviceIndex,
    bases: jax.Array,     # [B, L] (possibly front-clipped) read codes
    quals: jax.Array,
    len_eff: jax.Array,   # [B] i32 from Tier1Out
    read_ix: jax.Array,   # [M] i64 row index per selected candidate
    dirs: jax.Array,      # [M] i32
    locs: jax.Array,      # [M] i64
    offs: jax.Array,      # [M] i32
    live: jax.Array,      # [M] bool
    params: AlignParams,
    bonus: jax.Array | None = None,  # [M] i32 phase-2a score raises
) -> SubsetOut:
    """Phase 2: DP + AG scoring of host-selected candidate rows.

    The host buckets M to a power of two so recurring subset sizes hit
    the jit cache; dead rows (live=False) are padding.
    """
    B, L = bases.shape
    margin = max(params.max_k, params.mki) + 1
    W = L + 2 * margin
    rc_bases, rc_quals = reverse_complement_reads(bases, quals, len_eff)
    pat = jnp.where((dirs == 1)[:, None], rc_bases[read_ix], bases[read_ix])
    patq = jnp.where((dirs == 1)[:, None], rc_quals[read_ix], quals[read_ix])
    pat_logq = device_logq(patq)
    plen = len_eff[read_ix]
    return _score_rows(
        didx, pat, pat_logq, plen, locs, offs, dirs, live, params,
        L, margin, W, s_bonus=bonus,
    )


@jax.jit
def _pack_subset(sub: "SubsetOut") -> jax.Array:
    """[M, 8] int32 view of a SubsetOut for a single device->host
    fetch: on a link-attached chip each pytree leaf pays a full round
    trip, so the 11-leaf fetch costs 11 RTTs for a few KB of payload.
    Sentinel-bearing / order-relevant fields (dist, lv_dist, ag_score)
    keep full 32-bit width; indels saturates at 0x7FFF (host only
    tests zero/nonzero; it carries a 1<<20 sentinel)."""
    w7 = (
        jnp.minimum(sub.indels.astype(jnp.int32), jnp.int32(0x7FFF))
        | (sub.escalated.astype(jnp.int32) << jnp.int32(16))
        | (sub.valid.astype(jnp.int32) << jnp.int32(17))
    )
    return jnp.stack(
        [
            jax.lax.bitcast_convert_type(
                sub.end_loc.astype(jnp.uint32), jnp.int32
            ),
            jax.lax.bitcast_convert_type(
                sub.body_loc.astype(jnp.uint32), jnp.int32
            ),
            jax.lax.bitcast_convert_type(
                sub.log_prob.astype(jnp.float32), jnp.int32
            ),
            sub.dist.astype(jnp.int32),
            sub.lv_dist.astype(jnp.int32),
            sub.ag_score.astype(jnp.int32),
            (sub.clip_before.astype(jnp.int32) & jnp.int32(0xFFFF))
            | (sub.clip_after.astype(jnp.int32) << jnp.int32(16)),
            w7,
            jax.lax.bitcast_convert_type(
                sub.lv_log_prob.astype(jnp.float32), jnp.int32
            ),
        ],
        axis=1,
    )


def fetch_subset(sub: "SubsetOut") -> "SubsetOut":
    """device SubsetOut -> numpy SubsetOut via the packed transfer."""
    pk = np.ascontiguousarray(jax.device_get(_pack_subset(sub)))
    sx = lambda x: ((x & 0xFFFF) ^ 0x8000) - 0x8000
    return SubsetOut(
        dist=pk[:, 3],
        lv_dist=pk[:, 4],
        indels=(pk[:, 7] & 0x7FFF).astype(np.int32),
        log_prob=np.ascontiguousarray(pk[:, 2]).view(np.float32),
        ag_score=pk[:, 5],
        end_loc=pk[:, 0].astype(np.int64) & 0xFFFFFFFF,
        body_loc=pk[:, 1].astype(np.int64) & 0xFFFFFFFF,
        escalated=((pk[:, 7] >> 16) & 1).astype(bool),
        clip_before=sx(pk[:, 6]).astype(np.int32),
        clip_after=(pk[:, 6] >> 16).astype(np.int32),
        valid=((pk[:, 7] >> 17) & 1).astype(bool),
        lv_log_prob=np.ascontiguousarray(pk[:, 8]).view(np.float32),
    )


@jax.jit
def _pack_tier1(t1):
    """Compress Tier1Out's host-bound fields into two dense arrays so
    the device->host hop ships 16B/candidate in 2 transfers instead of
    29B across 7 (the hop is first-order on a link-attached chip;
    reference accounting: AlignerContext.cpp:533-573).

    cand words: w0 cand_loc (uint32 bitcast); w1 gapless_logp (f32
    bitcast); w2 seed_off(0..15) | weight(16..23) | direction(24) |
    valid(25); w3 gapless_dist(0..15, saturates at 1<<14 which also
    serves as the "no gapless score" sentinel) | big_indel(16..25).
    n_lookups has no host consumer and is dropped.
    """
    w2 = (
        (t1.seed_off.astype(jnp.int32) & jnp.int32(0xFFFF))
        | ((t1.weight.astype(jnp.int32) & jnp.int32(0xFF)) << jnp.int32(16))
        | (t1.direction.astype(jnp.int32) << jnp.int32(24))
        | (t1.valid.astype(jnp.int32) << jnp.int32(25))
    )
    cand = jnp.stack(
        [
            jax.lax.bitcast_convert_type(
                t1.cand_loc.astype(jnp.uint32), jnp.int32
            ),
            jax.lax.bitcast_convert_type(
                t1.gapless_logp.astype(jnp.float32), jnp.int32
            ),
            w2,
            t1.gapless_dist.astype(jnp.int32)
            | (t1.big_indel.astype(jnp.int32) << jnp.int32(16)),
        ],
        axis=2,
    )
    per_read = jnp.stack(
        [
            (t1.len_eff.astype(jnp.int32) & jnp.int32(0xFFFF))
            | (t1.popular.astype(jnp.int32) << jnp.int32(16)),
            t1.truncated.astype(jnp.int32),
        ],
        axis=1,
    )
    return cand, per_read


def two_phase_merge(
    didx: DeviceIndex,
    t1,                 # Tier1Out (device pytree)
    dev_bases,          # [B, L] device array from the tier-1 dispatch
    dev_quals,
    params: AlignParams,
    force_dp: bool = False,
) -> dict:
    """Host half of the two-phase path: pull tier-1 results, decide which
    candidates need the DP tier (same rule the monolithic kernel applies
    on device), run score_rows on a power-of-two-padded subset, and merge
    into flat numpy [B, K] arrays for the record writers.

    Clean batches (no candidate needing gaps) never dispatch tier 2 —
    the dynamic analogue of SNAP skipping LV when the XOR scan says the
    extension is perfect.
    """
    import jax


    cand_pk, read_pk = jax.device_get(_pack_tier1(t1))
    cand_pk = np.ascontiguousarray(cand_pk)
    cand_loc = (cand_pk[:, :, 0].astype(np.int64)) & 0xFFFFFFFF
    B, K = cand_loc.shape
    glp = np.ascontiguousarray(cand_pk[:, :, 1]).view(np.float32)
    w2 = cand_pk[:, :, 2]
    seed_off = (((w2 & 0xFFFF) ^ 0x8000) - 0x8000).astype(np.int32)
    weight = ((w2 >> 16) & 0xFF).astype(np.int32)
    direction = ((w2 >> 24) & 1).astype(np.int32)
    valid = ((w2 >> 25) & 1).astype(bool)
    gd = (cand_pk[:, :, 3] & 0xFFFF).astype(np.int32)
    big_indel = (cand_pk[:, :, 3] >> 16).astype(np.int32)
    mk_eff = np.minimum(params.max_k + big_indel, 126)
    r0 = read_pk[:, 0]
    len_eff = (((r0 & 0xFFFF) ^ 0x8000) - 0x8000).astype(np.int32)
    popular = (r0 >> 16).astype(np.int32)
    truncated = read_pk[:, 1].astype(bool)

    GOK = params.max_k_same
    if force_dp:
        # exact mode (edge-indel redo rows): every imperfect candidate
        # gets the full DP, matching SNAP's always-LV scoring
        # (BaseAligner.cpp:1160-1173) with no gapless shortcut
        needs = valid & (gd > 0)
    else:
        needs = valid & (gd > GOK)
    if not force_dp and didx.genome_packed is not None:
        read_min = np.min(
            np.where(valid, gd, np.int32(1 << 20)), axis=1
        )
        promote = (read_min > GOK)[:, None] & (
            np.arange(K, dtype=np.int32)[None, :] < 2
        )
        needs &= (weight >= 2) | promote

    plen2 = len_eff[:, None].astype(np.int64)
    merged = {
        "dist": gd.astype(np.int64).copy(),
        "lv_dist": gd.astype(np.int64).copy(),
        "indels": np.zeros((B, K), np.int32),
        "log_prob": glp.astype(np.float64).copy(),
        "lv_log_prob": glp.astype(np.float64).copy(),
        "ag_score": (
            plen2 - (params.ag_match + params.ag_sub) * gd
        ).astype(np.int64),
        "end_loc": cand_loc + plen2,
        "body_loc": cand_loc.copy(),
        "cand_loc": cand_loc,
        "escalated": np.zeros((B, K), bool),
        "clip_before": np.zeros((B, K), np.int32),
        "clip_after": np.zeros((B, K), np.int32),
        "seed_off": seed_off,
        "direction": direction,
        "valid": valid & ~needs & (gd <= mk_eff),
        "len_eff": len_eff,
        "popular": popular,
        "weight": weight,
        "truncated": truncated,
        "big_indel": big_indel,
    }

    idx = np.flatnonzero(needs.reshape(-1))
    if idx.size:
        M = 1 << max(5, int(np.ceil(np.log2(idx.size))))
        M = min(M, B * K)
        sel = np.zeros(M, dtype=np.int64)
        sel[: idx.size] = idx[:M]
        live = np.zeros(M, dtype=bool)
        live[: min(idx.size, M)] = True
        flat = lambda a: a.reshape(-1)[sel]
        sub = score_rows(
            didx, dev_bases, dev_quals, t1.len_eff,
            jnp.asarray(sel // K), jnp.asarray(flat(direction)),
            jnp.asarray(flat(cand_loc)), jnp.asarray(flat(seed_off)),
            jnp.asarray(live), params,
            bonus=jnp.asarray(flat(big_indel)),
        )
        sub = fetch_subset(sub)
        n = min(idx.size, M)
        rows, cols = idx[:n] // K, idx[:n] % K
        merged["dist"][rows, cols] = np.asarray(sub.dist)[:n]
        merged["lv_dist"][rows, cols] = np.asarray(sub.lv_dist)[:n]
        merged["indels"][rows, cols] = np.asarray(sub.indels)[:n]
        merged["log_prob"][rows, cols] = np.asarray(sub.log_prob)[:n]
        merged["lv_log_prob"][rows, cols] = np.asarray(sub.lv_log_prob)[:n]
        merged["ag_score"][rows, cols] = np.asarray(sub.ag_score)[:n]
        merged["end_loc"][rows, cols] = np.asarray(sub.end_loc)[:n]
        merged["body_loc"][rows, cols] = np.asarray(sub.body_loc)[:n]
        merged["escalated"][rows, cols] = np.asarray(sub.escalated)[:n]
        merged["clip_before"][rows, cols] = np.asarray(sub.clip_before)[:n]
        merged["clip_after"][rows, cols] = np.asarray(sub.clip_after)[:n]
        merged["valid"][rows, cols] = np.asarray(sub.valid)[:n]
    return merged


# =====================================================================
# Device-side finalization (winner selection + MAPQ on device)
#
# The two-phase host path transfers every [B, K] candidate field over
# the device->host link and finalizes in numpy (post.finalize_batch).
# On a tunneled / PCIe-attached chip that transfer dominates the whole
# step, so this path replicates the ScoreSet semantics
# (BaseAligner.h:260-329, bin merge BaseAligner.cpp:1353-1443, mapq.h:
# 32-68) in the jitted graph and ships only compact per-read winners.
# Reads needing the exact sequential nearby-bin merge are flagged and
# re-finalized on the host from device-resident candidate rows.
# =====================================================================


class WinnerOut(NamedTuple):
    """Compact per-read winner, sized for the device->host hop."""

    found: jax.Array        # [B] bool any surviving candidate
    fallback: jax.Array     # [B] bool needs exact host finalize_read
    cand_k: jax.Array       # [B] int32 winner's candidate slot
    direction: jax.Array    # [B] uint8
    dist: jax.Array         # [B] int16
    mapq: jax.Array         # [B] uint8
    end_loc: jax.Array      # [B] uint32
    body_loc: jax.Array     # [B] uint32
    clip_before: jax.Array  # [B] int16
    clip_after: jax.Array   # [B] int16
    escalated: jax.Array    # [B] bool
    indels: jax.Array       # [B] int32
    len_eff: jax.Array      # [B] int16
    popular: jax.Array      # [B] int16
    valid_count: jax.Array  # [B] int16 (stats: lvCalls analogue)
    esc_count: jax.Array    # [B] int16 (stats: affineGapCalls analogue)
    truncated: jax.Array    # [B] bool hit-cap overflow: redo via wide pass
    edge_indel: jax.Array   # [B] bool gapless dist-2 winner admits a
                            # one-indel dist-1 twin (host force-DP redo)
    ag_flip: jax.Array      # [B] bool a single gap ties/beats the
                            # winner's substitutions (AG traceback path)
    dp_overflow: jax.Array  # [] bool: DP tier truncated, redo via host path


def winner_flags(
    didx: DeviceIndex,
    bases: jax.Array,      # [B, L] device reads (front-clipped layout)
    len_eff: jax.Array,    # [B] effective (back-clipped) length
    dirs: jax.Array,       # [B] winner direction
    end_loc: jax.Array,    # [B] winner end location (int64)
    dist: jax.Array,       # [B] winner edit distance (int64)
    params: AlignParams,
) -> tuple[jax.Array, jax.Array]:
    """Device twins of the two host emission screens, evaluated on each
    read's chosen winner so the host plan path needs no genome reads:

    - single.one_indel_improves (edge-indel honesty): a gapless dist-2
      alignment admitting a one-1bp-indel dist-1 twin — prefix/suffix
      run tests on the -1/0/+1 diagonal match vectors
      (SNAP always-LV scoring, BaseAligner.cpp:1160-1173);
    - single.ag_restructure_possible (emission-time AG CIGAR rule,
      ReadWriter.cpp:231): the exact best single-gap(1..3)-plus-
      substitutions penalty over all split points ties/beats the
      all-substitution penalty.

    Both were ~90ms/batch of host numpy on the e2e critical path (1-core
    host); here they are one [B]-row byte window gather + elementwise
    diagonal scans. Genome windows clamp at the array edge (the host
    versions clamp per-index); alignments within 3bp of the genome
    array edge sit in the PAD margin and never match either way.

    Returns ungated (edge_raw, ag_raw) [B] bools; the caller applies
    the found/gapless/unclipped/dist gates.
    """
    B, L = bases.shape
    M3 = 3
    W = L + 2 * M3 + 1
    plen = jnp.maximum(len_eff.astype(jnp.int64), 0)
    start = end_loc.astype(jnp.int64) - plen
    g = didx.genome
    Gn = g.shape[0]
    ws = jnp.clip(start - M3, 0, Gn - 1)
    if (
        didx.genome_packed is not None
        and didx.genome_bad16 is not None
        and didx.genome_packed.shape[0] % 8 == 0
    ):
        # packed-word window: 2x2 row gathers + funnel shift + lane
        # unpack — ~4 gather indices/read instead of ~15 byte rows
        WN = W // 16 + 2
        w0 = ws // 16
        phase = (ws % 16).astype(jnp.int32)
        aw = align_words(window_words(didx.genome_packed, w0, WN), phase, 2)
        ab16 = align_words(window_words(didx.genome_bad16, w0, WN), phase, 2)
        sh = 2 * jnp.arange(16, dtype=jnp.uint32)
        cw = (aw[:, :, None] >> sh[None, None, :]) & jnp.uint32(3)
        bw = (ab16[:, :, None] >> sh[None, None, :]) & jnp.uint32(1)
        Gw = (
            jnp.where(bw != 0, jnp.uint32(4), cw)
            .reshape(B, -1)[:, :W]
            .astype(g.dtype)
        )
    else:
        # byte-level window rows: same row-gather trick as window_words
        # but on the uint8 genome, truncated to a multiple of 8 (the
        # tail bases are genome padding)
        a2 = g[: (Gn // 8) * 8].reshape(-1, 8)
        nrows = (W + 7 + 7) // 8
        r0 = ws >> 3
        blocks = [
            a2[jnp.clip(r0 + j, 0, a2.shape[0] - 1)] for j in range(nrows)
        ]
        ab = jnp.concatenate(blocks, axis=1)  # [B, nrows*8]
        shw = (ws & 7).astype(jnp.int32)
        Gw = jnp.zeros((B, W), g.dtype)
        for s in range(8):
            Gw = jnp.where(
                (shw == s)[:, None],
                jax.lax.slice_in_dim(ab, s, s + W, axis=1),
                Gw,
            )

    # oriented pattern: forward reads as-is, reverse = RC left-aligned
    # (device bases are already front-clipped, so fe = 0)
    rc, _ = reverse_complement_reads(
        bases, bases, len_eff.astype(jnp.int32)
    )
    P = jnp.where((dirs == 1)[:, None], rc, bases)
    pos = jnp.arange(L, dtype=jnp.int64)[None, :]
    in_read = pos < plen[:, None]
    plen32 = plen.astype(jnp.int32)

    def eq(shift):  # pattern vs genome shifted by `shift` diagonals
        gs = jax.lax.slice_in_dim(Gw, M3 + shift, M3 + shift + L, axis=1)
        return ((P == gs) & (P < 4) & (gs < 4)) | ~in_read

    eqs = {s: eq(s) for s in range(-M3, M3 + 1)}
    zero_col = jnp.zeros((B, 1), jnp.int32)
    cums = {
        s: jnp.concatenate(
            [zero_col, jnp.cumsum((~eqs[s]).astype(jnp.int32), axis=1)],
            axis=1,
        )
        for s in eqs
    }

    # ---- ag_restructure screen: exact best single-gap cost ----
    unit = jnp.int32(params.ag_match + params.ag_sub)
    c0 = cums[0]
    kpos = jnp.arange(L + 1, dtype=jnp.int32)[None, :]
    in_split = kpos <= plen32[:, None]
    BIG = jnp.int32(1 << 30)
    best = jnp.full((B,), BIG)
    pidx = plen[:, None]

    def at_plen(c):
        return jnp.take_along_axis(c, pidx, axis=1)[:, 0]

    for s in range(1, M3 + 1):
        base_pen = jnp.int32(params.ag_open + s * params.ag_extend)
        cs = cums[s]
        tot_s = at_plen(cs)
        cost_d = base_pen + unit * jnp.min(
            jnp.where(in_split, c0 + (tot_s[:, None] - cs), BIG), axis=1
        )
        best = jnp.minimum(best, cost_d)
        cm = cums[-s]
        tot_m = at_plen(cm)
        suf = tot_m[:, None] - cm[:, s:]
        pre = c0[:, : L + 1 - s]
        ok_k = kpos[:, : L + 1 - s] <= (plen32[:, None] - s)
        cost_i = base_pen + jnp.int32(s * params.ag_match) + unit * jnp.min(
            jnp.where(ok_k, pre + suf, BIG), axis=1
        )
        best = jnp.minimum(best, cost_i)
    ag_raw = best <= unit * dist.astype(jnp.int32)

    # ---- one-indel screen: diagonal prefix/suffix runs ----
    posi = jnp.arange(L, dtype=jnp.int32)[None, :]

    def pref(a):  # leading all-True run, capped at plen
        fp = jnp.min(jnp.where(~a, posi, jnp.int32(L)), axis=1)
        return jnp.minimum(fp, plen32)

    def suff(a):  # trailing all-True run within [0, plen)
        lf = jnp.max(jnp.where(~a, posi, jnp.int32(-1)), axis=1)
        return jnp.clip(plen32 - 1 - lf, 0, plen32)

    eq0, eqp, eqm = eqs[0], eqs[1], eqs[-1]
    L0, R0 = pref(eq0), suff(eq0)
    edge_raw = (
        (L0 + suff(eqp) >= plen32)          # 1D: tail on +1 diagonal
        | (L0 + suff(eqm) >= plen32 - 1)    # 1I: tail on -1 diagonal
        | (pref(eqp) + R0 >= plen32 - 1)    # 1I: head on +1 diagonal
        | (pref(eqm) + R0 >= plen32)        # 1D: head on -1 diagonal
    )
    return edge_raw, ag_raw


def _device_finalize(
    out: SingleAlignOut,
    first_alt_start,
    alt_awareness: bool,
    max_score_gap: int,
    use_affine_gap: bool,
    needs_total: jax.Array,
    dp_rows: int,
    max_k: int = 127,
    extra_search_depth: int = 1,
    return_scores: bool = False,
    use_ukkonen: bool = True,
    didx: DeviceIndex | None = None,
    bases: jax.Array | None = None,
    flag_params: AlignParams | None = None,
) -> WinnerOut:
    from ..constants import MAPQ_MAX, MAX_MERGE_DIST

    d = out.dist.astype(jnp.int64)
    lp = out.log_prob.astype(jnp.float32)
    ag = out.ag_score.astype(jnp.int64)
    e = out.end_loc.astype(jnp.int64)
    cl = out.cand_loc.astype(jnp.int64)
    dr = out.direction.astype(jnp.int32)
    v = out.valid
    B, K = d.shape
    alt = cl >= jnp.int64(first_alt_start)
    bins = cl // np.int64(MAX_MERGE_DIST)
    dr_k = jnp.where(v, dr, jnp.int32(9))
    karr = jnp.broadcast_to(jnp.arange(K, dtype=jnp.int32)[None, :], (B, K))

    # host parity: np.lexsort((cl, -probs, d, bins, dr_k, rows)) ==
    # per-row stable sort by (dr_k, bins, d, -lp, cl) — exp is monotone
    (dr_s, bins_s, d_s, _neglp, cl_s, k_s, lp_s, ag_s, e_s, alt_s,
     v_s) = jax.lax.sort(
        (dr_k, bins, d, -lp, cl, karr, lp, ag, e, alt, v),
        dimension=1, num_keys=5, is_stable=True,
    )

    first = jnp.concatenate(
        [
            jnp.ones((B, 1), bool),
            (dr_s[:, 1:] != dr_s[:, :-1]) | (bins_s[:, 1:] != bins_s[:, :-1]),
        ],
        axis=1,
    )
    reps = first & v_s

    # nearby-element merge detection (BaseAligner.cpp:1396-1435): any
    # two consecutive reps in the same direction within 48bp where the
    # better score < 2 => the read takes the exact host path
    pos = jnp.broadcast_to(jnp.arange(K, dtype=jnp.int32)[None, :], (B, K))
    repos = jnp.where(reps, pos, jnp.int32(-1))
    prev_incl = jax.lax.associative_scan(jnp.maximum, repos, axis=1)
    prev = jnp.concatenate(
        [jnp.full((B, 1), -1, jnp.int32), prev_incl[:, :-1]], axis=1
    )
    prev_c = jnp.clip(prev, 0, K - 1).astype(jnp.int64)
    near = (
        reps
        & (prev >= 0)
        & (jnp.take_along_axis(dr_s, prev_c, axis=1) == dr_s)
        & (
            jnp.abs(cl_s - jnp.take_along_axis(cl_s, prev_c, axis=1))
            <= MAX_MERGE_DIST
        )
        & (
            jnp.minimum(jnp.take_along_axis(d_s, prev_c, axis=1), d_s)
            < 2
        )
    )
    fallback = near.any(axis=1)

    # Ukkonen dynamic score limit (BaseAligner::scoreLimit,
    # BaseAligner.cpp:2556-2570): SNAP scores candidates in weight
    # order; ones above extraSearchDepth + min(maxK, running bests)
    # at their turn get ScoreAboveLimit — no result, no pAll. Our
    # candidate slot order IS weight order (top_k by weight), so
    # replay the running limit over original slots. Without this,
    # pAll (and MAPQ) is deflated on repetitive genomes.
    # sorted -> original slot space WITHOUT a [B, K] scatter: k_s is a
    # per-row permutation, so a payload sort keyed on it delivers reps
    # in original slot order (sorts are lane shuffles; scatters/gathers
    # cost ~32ns per index on TPU). pos_sorted records each original
    # slot's sorted position for the inverse mapping below.
    _, rep_orig_i, pos_sorted = jax.lax.sort(
        (k_s, reps.astype(jnp.int32), karr),
        dimension=1, num_keys=1, is_stable=True,
    )
    rep_orig = rep_orig_i.astype(bool)
    INF = jnp.int64(1 << 40)
    d_orig = jnp.where(rep_orig, d, INF)
    lv_orig = jnp.where(rep_orig, out.lv_dist.astype(jnp.int64), INF)
    alt_orig = alt
    D64 = jnp.int64(extra_search_depth)
    gap64 = jnp.int64(max_score_gap)
    mk64 = jnp.int64(max_k)
    run_all = jnp.full((B,), INF)
    run_na = jnp.full((B,), INF)
    inc_cols = []
    for k in range(K):
        dk = d_orig[:, k]
        ak = alt_orig[:, k]
        lim_na = D64 + jnp.minimum(
            mk64, jnp.minimum(run_all + gap64, run_na)
        )
        lim_alt = D64 + jnp.minimum(
            mk64, jnp.minimum(run_all, run_na - jnp.minimum(gap64, run_na))
        )
        lim = jnp.where(ak, lim_alt, lim_na)
        # gate on the PRE-clipping LV distance (SNAP applies its limit
        # inside computeEditDistance before any affine-gap clipping);
        # running bests update with the final (possibly clipped) score
        ok = rep_orig[:, k] & (lv_orig[:, k] <= lim)
        inc_cols.append(ok)
        run_all = jnp.where(ok, jnp.minimum(run_all, dk), run_all)
        run_na = jnp.where(ok & ~ak, jnp.minimum(run_na, dk), run_na)
    if use_ukkonen:
        inc_orig = jnp.stack(inc_cols, axis=1)  # [B, K] original slots
        # back to sorted space without a gather: sort by each original
        # slot's sorted position (inverse of the k_s permutation)
        _, inc_s_i = jax.lax.sort(
            (pos_sorted, inc_orig.astype(jnp.int32)),
            dimension=1, num_keys=1, is_stable=True,
        )
        reps = reps & inc_s_i.astype(bool)

    probs = jnp.where(reps, jnp.exp(lp_s.astype(jnp.float64)), 0.0)
    p_all = probs.sum(axis=1)

    sel_key = -ag_s if use_affine_gap else d_s

    def best_fields(active):
        # host parity: np.lexsort((e, -prob, key, row)) over reps, ties
        # by position in the first sort (lax.sort is stable)
        gate = jnp.where(active, jnp.int32(0), jnp.int32(1))
        srt = jax.lax.sort(
            (gate, sel_key, -lp_s, e_s, k_s, d_s, lp_s, e_s, cl_s, dr_s),
            dimension=1, num_keys=4, is_stable=True,
        )
        # slot 0 = best among active (gate 0 sorts first)
        return {
            "k": srt[4][:, 0],
            "d": srt[5][:, 0],
            "lp": srt[6][:, 0],
            "e": srt[7][:, 0],
            "cl": srt[8][:, 0],
            "dr": srt[9][:, 0],
        }

    best_all = best_fields(reps)
    found = reps.any(axis=1)

    if alt_awareness:
        na = reps & ~alt_s
        best_na = best_fields(na)
        exists_na = na.any(axis=1)
        p_all_na = jnp.where(na, probs, 0.0).sum(axis=1)
        use_na = exists_na & (
            best_na["d"] <= best_all["d"] + jnp.int64(max_score_gap)
        )
        chosen = {
            key: jnp.where(use_na, best_na[key], best_all[key])
            for key in best_all
        }
        chosen_pall = jnp.where(use_na, p_all_na, p_all)
    else:
        chosen = best_all
        chosen_pall = p_all

    p_best = jnp.exp(chosen["lp"].astype(jnp.float64))
    p_all_c = jnp.maximum(chosen_pall, p_best)
    ratio = jnp.where(p_all_c > 0, p_best / jnp.maximum(p_all_c, 1e-300), 0.0)
    base = jnp.where(
        ratio >= 1.0,
        jnp.int64(MAPQ_MAX),
        jnp.minimum(
            jnp.int64(MAPQ_MAX),
            (-10.0 * jnp.log10(jnp.maximum(1.0 - ratio, 1e-300))).astype(
                jnp.int64
            ),
        ),
    )
    base = jnp.where(p_best <= 0.0, 0, base)
    popular = out.popular.astype(jnp.int64)
    mapq = jnp.maximum(
        0, base - jnp.maximum(0, popular - 10) // 2
    )

    wk = chosen["k"].astype(jnp.int64)[:, None]

    def at_w(a):
        return jnp.take_along_axis(a, wk, axis=1)[:, 0]

    # emission screens on device (host twins: single.one_indel_improves
    # / single.ag_restructure_possible); gates mirror the host plan path
    no_flags = jnp.zeros_like(found)
    edge_indel = ag_flip = no_flags
    if didx is not None and bases is not None and flag_params is not None:
        w_indels = at_w(out.indels)
        w_cb = at_w(out.clip_before)
        w_ca = at_w(out.clip_after)
        base_gate = (
            found
            & ~fallback
            & ~out.truncated
            & (w_indels == 0)
            & (w_cb == 0)
            & (w_ca == 0)
        )
        want_edge = flag_params.max_k_same >= 2
        want_ag = use_affine_gap
        if want_edge or want_ag:
            edge_raw, ag_raw = winner_flags(
                didx, bases, out.len_eff, chosen["dr"], chosen["e"],
                chosen["d"], flag_params,
            )
            if want_edge:
                edge_indel = base_gate & (chosen["d"] == 2) & edge_raw
            if want_ag:
                ag_flip = base_gate & (chosen["d"] >= 2) & ag_raw

    win = WinnerOut(
        found=found,
        fallback=fallback,
        cand_k=chosen["k"].astype(jnp.int32),
        direction=chosen["dr"].astype(jnp.uint8),
        dist=chosen["d"].astype(jnp.int16),
        mapq=mapq.astype(jnp.uint8),
        end_loc=chosen["e"].astype(jnp.uint32),
        body_loc=at_w(out.body_loc).astype(jnp.uint32),
        clip_before=at_w(out.clip_before).astype(jnp.int16),
        clip_after=at_w(out.clip_after).astype(jnp.int16),
        escalated=at_w(out.escalated),
        indels=at_w(out.indels).astype(jnp.int32),
        len_eff=out.len_eff.astype(jnp.int16),
        popular=out.popular.astype(jnp.int16),
        valid_count=out.valid.sum(axis=1).astype(jnp.int16),
        esc_count=(out.escalated & out.valid).sum(axis=1).astype(jnp.int16),
        truncated=out.truncated,
        edge_indel=edge_indel,
        ag_flip=ag_flip,
        dp_overflow=needs_total > jnp.int32(dp_rows),
    )
    if return_scores:
        # running bests of the Ukkonen replay = SNAP's
        # scoresForAllAlignments / scoresForNonAltAlignments bestScore
        # at loop exit ((1<<40) when no candidate was included)
        return win, run_all, run_na
    return win


def align_winners_device(
    didx: DeviceIndex,
    bases: jax.Array,
    quals: jax.Array,
    lens: jax.Array,
    first_alt_start: jax.Array,  # [] int64 (traced: no recompile per genome)
    params: AlignParams,
    dp_rows: int | None = None,
    alt_awareness: bool = True,
    max_score_gap: int = 64,
    adaptive: bool = False,
    phase_b_rows: int | None = None,
    phase_c: bool = False,
):
    """Production fast path: align + device finalize.

    Returns (packed winners [B+1, 16] int32, full SingleAlignOut).
    Winners cross device->host as ONE array — per-leaf fetches each pay
    a full link round trip. Row B carries the dp_overflow flag. The
    full per-candidate output stays device-resident for the rare
    fallback rows (gather_merged_rows). dp_rows defaults to ~0.4% of
    B*K (the DP-needing fraction is ~0.25% on 1%-error reads); the
    overflow flag redoes gappier batches via the host-gated path.

    adaptive=True replays SNAP's seed-loop early termination
    (BaseAligner.cpp:1028) as a two-phase wavefront: phase A probes
    only the first unwrapped seed pass with a narrow K=4 candidate
    tile; reads SNAP would have kept seeding (stop bound <=
    scoreLimit), or whose candidates overflowed the narrow tile, are
    compacted into a phase_b_rows-wide full-depth rerun whose results
    scatter back over phase A's. Reads beyond the phase-B capacity
    fall back to the host wide-redo path via the truncated flag.

    The two phases are SEPARATE jit units chained device-to-device
    (no host sync between them): one fused graph held both full
    pipelines and took the remote XLA compiler tens of minutes —
    split, each unit is an ordinary-sized program and phase B reuses
    the non-adaptive compilation pattern.
    """
    B, L = bases.shape
    if dp_rows is None:
        # ~0.25% of B*K rows need the DP tier on 1%-error reads; //128
        # gives ~8x headroom so gappier batches don't trip the
        # dp_overflow full-batch host redo (its cost dwarfs the extra
        # tier rows')
        dp_rows = max(1024, (B * params.max_cand) // 128)
    P = L - params.seed_len + 1
    s1_lookups = (P - 1) // params.seed_len + 1 if P > 0 else 1
    if not adaptive or s1_lookups >= params.num_lookups:
        return _awd_fused(
            didx, bases, quals, lens, first_alt_start, params,
            dp_rows, alt_awareness, max_score_gap,
        )

    # phase B holds every phase-A-unresolved read: repeat-dense genomes
    # leave ~25% of reads unresolved (crowded or gather-capped), so the
    # row budget is B/4, and phase B runs a WIDER tile (hit_cap/K up to
    # 32) so moderately-repeated seeds (LINE-copy counts) resolve on
    # device instead of falling to the host wide redo
    B2 = phase_b_rows or max(min(256, B), B // 4)
    out_a, win_a, needs_a, rows, live, overflow = _awd_phase_a(
        didx, bases, quals, lens, first_alt_start, params,
        alt_awareness, max_score_gap, s1_lookups, B2,
    )
    packed, win_ab, ab = _awd_phase_b(
        didx, bases, quals, lens, first_alt_start, params,
        alt_awareness, max_score_gap, B2,
        out_a, win_a, needs_a, rows, live, overflow,
    )
    if not phase_c:
        return packed, ab
    return _awd_phase_c(
        didx, bases, quals, lens, first_alt_start, params,
        alt_awareness, max_score_gap, packed, win_ab, ab,
    )


def _phase_b_params(params: AlignParams) -> AlignParams:
    """Phase-B tile geometry: wide enough for repeat-family hit counts
    (SINE/LINE copies) that overflow the phase-A caps."""
    import dataclasses

    return dataclasses.replace(
        params,
        max_cand=min(64, max(32, 2 * params.max_cand)),
        hit_cap=max(32, 4 * params.hit_cap),
    )


# The production step is chained from three modest jit units — candgen,
# scoring, finalize — with device-resident handoffs (no host sync).
# One fused graph was both slower at runtime (XLA re-fused the cheap
# index math into several expensive consumers) and pathological to
# compile: the remote XLA service took tens of minutes or wedged on
# the monolith, while each unit below compiles in seconds to a couple
# of minutes.


@functools.partial(
    jax.jit, static_argnames=("params", "return_lowest")
)
def _awd_candidates(didx, bases, quals, lens, params, return_lowest=False):
    return _align_impl(
        didx, bases, quals, lens, params,
        cand_only=True, return_lowest=return_lowest,
    )


@functools.partial(jax.jit, static_argnames=("params", "dp_rows"))
def _awd_score(didx, bases, quals, bundle, params, dp_rows):
    (cand_loc, cand_off, cand_dir, cand_valid, cand_weight,
     popular, trunc, len_eff, n_lookups) = bundle
    rc_bases, rc_quals = reverse_complement_reads(bases, quals, len_eff)
    out, needs = _score_from_candidates(
        didx, bases, rc_bases, logq_f_in=None, logq_r_in=None,
        quals=quals, rc_quals=rc_quals, len_eff=len_eff,
        cand_loc=cand_loc, cand_off=cand_off, cand_dir=cand_dir,
        cand_valid=cand_valid, cand_weight=cand_weight,
        popular=popular, truncated=trunc, n_lookups=n_lookups,
        params=params, tier1_only=False, dp_rows=dp_rows,
        return_needs=True,
    )
    return out, needs


@functools.partial(
    jax.jit,
    static_argnames=(
        "params", "dp_rows", "alt_awareness", "max_score_gap",
        "return_scores",
    ),
)
def _awd_finalize(
    didx, bases, out, first_alt_start, needs_total, params, dp_rows,
    alt_awareness, max_score_gap, return_scores=False,
):
    res = _device_finalize(
        out, first_alt_start, alt_awareness, max_score_gap,
        params.use_affine_gap, needs_total, dp_rows,
        max_k=params.max_k,
        extra_search_depth=params.extra_search_depth,
        use_ukkonen=params.use_ukkonen,
        return_scores=return_scores,
        didx=didx, bases=bases, flag_params=params,
    )
    if return_scores:
        win, run_all, run_na = res
        return pack_winners(win), win, run_all, run_na
    return pack_winners(res), res


def _awd_fused(
    didx, bases, quals, lens, first_alt_start, params,
    dp_rows, alt_awareness, max_score_gap,
):
    bundle = _awd_candidates(didx, bases, quals, lens, params)
    out, needs_total = _awd_score(
        didx, bases, quals, bundle, params, dp_rows
    )
    packed, _ = _awd_finalize(
        didx, bases, out, first_alt_start, needs_total, params, dp_rows,
        alt_awareness, max_score_gap,
    )
    return packed, out


def _awd_phase_a(
    didx, bases, quals, lens, first_alt_start, params,
    alt_awareness, max_score_gap, s1_lookups, B2,
):
    import dataclasses

    B, L = bases.shape
    # Phase A also narrows the candidate tile: most reads have 1-2
    # distinct candidates, so a K/4-wide tile quarters the gapless
    # window gathers (the tier-1 cost driver); reads with more
    # candidates are flagged by the K-overflow bit and rerun at full
    # width in phase B
    K_A = min(4, params.max_cand)
    params_a = dataclasses.replace(
        params, num_seeds=2 * s1_lookups - 2, max_cand=K_A
    )
    # repeat-dense batches push ~15% of phase-A candidate slots into
    # the DP tier; //16 keeps the overflow-redo a genuine rarity
    dp_a = max(512, (B * K_A) // 16)
    bundle, lowest = _awd_candidates(
        didx, bases, quals, lens, params_a, return_lowest=True
    )
    out_a, needs_a = _awd_score(
        didx, bases, quals, bundle, params_a, dp_a
    )
    _, win_a, run_all, run_na = _awd_finalize(
        didx, bases, out_a, first_alt_start, needs_a, params, dp_a,
        alt_awareness, max_score_gap, return_scores=True,
    )
    out_a, rows, live, overflow = _awd_route(
        out_a, lowest, run_all, run_na, params,
        alt_awareness, max_score_gap, B2,
        _phase_b_params(params).max_cand,
    )
    return out_a, win_a, needs_a, rows, live, overflow


@functools.partial(
    jax.jit,
    static_argnames=(
        "params", "alt_awareness", "max_score_gap", "B2", "K_full",
    ),
)
def _awd_route(
    out_a, lowest, run_all, run_na, params,
    alt_awareness, max_score_gap, B2, K_full,
):
    """Phase-A epilogue: SNAP's stop rule picks the unresolved reads,
    compacts them into the phase-B row set, and widens the phase-A
    candidate tile to the full K for the later merge."""
    B = out_a.len_eff.shape[0]
    K_A = out_a.dist.shape[1]
    if K_A != K_full:
        # widen phase-A per-candidate arrays to the full K tile (pad
        # slots carry valid=False) so the phase-B row merge lines up
        def _pad_k(a):
            if a.ndim == 2 and a.shape[1] == K_A:
                return jnp.concatenate(
                    [a, jnp.zeros((B, K_full - K_A), a.dtype)], axis=1
                )
            return a

        out_a = SingleAlignOut(*(_pad_k(x) for x in out_a))

    # SNAP's stop rule (BaseAligner.cpp:1028): quit seeding when
    # min_dir(lowestPossibleScoreOfAnyUnseenLocation) exceeds
    # max(scoreLimit(true), scoreLimit(false)) (scoreLimit:
    # BaseAligner.cpp:2556-2570, computed from the running bests).
    D64 = jnp.int64(params.extra_search_depth)
    mk64 = jnp.int64(params.max_k)
    gap64 = jnp.int64(max_score_gap)
    if alt_awareness:
        lim_na = D64 + jnp.minimum(
            mk64, jnp.minimum(run_all + gap64, run_na)
        )
        lim_alt = D64 + jnp.minimum(
            mk64,
            jnp.minimum(run_all, run_na - jnp.minimum(gap64, run_na)),
        )
        lim = jnp.maximum(lim_na, lim_alt)
    else:
        lim = D64 + jnp.minimum(mk64, run_all)
    resolved = lowest.astype(jnp.int64) > lim
    # truncated phase-A rows (hit-cap or K_A-overflow) rerun at full
    # depth/width in phase B; if still truncated there, the flag
    # survives the merge and routes them to the host wide redo
    unres = (~resolved | out_a.truncated) & (
        out_a.len_eff >= jnp.int32(params.seed_len)
    )

    # compact unresolved reads into a fixed-width full-depth rerun
    _, rows = jax.lax.top_k(unres.astype(jnp.int32), B2)
    rows = rows.astype(jnp.int64)
    live = unres[rows]
    sel = jnp.zeros((B,), bool).at[rows].set(live)
    overflow = unres & ~sel
    return out_a, rows, live, overflow


def _awd_phase_b(
    didx, bases, quals, lens, first_alt_start, params,
    alt_awareness, max_score_gap, B2,
    out_a, win_a, needs_a, rows, live, overflow,
):
    B, L = bases.shape
    # Phase B concentrates every DP-needing read of the WHOLE batch
    # (the unresolved ones) and runs the wide tile (hit_cap/K up to
    # 32), so its DP tier is sized to the concentrated demand: on the
    # 25%-repeat genome that is ~12k candidates per 16k-read batch
    params_b = _phase_b_params(params)
    dp_b = max(2048, (B2 * params_b.max_cand) // 4,
               (B * params.max_cand) // 128)
    b_b, q_b, l_b = bases[rows], quals[rows], lens[rows]
    bundle = _awd_candidates(didx, b_b, q_b, l_b, params_b)
    out_b, needs_b = _awd_score(didx, b_b, q_b, bundle, params_b, dp_b)
    _, win_b = _awd_finalize(
        didx, b_b, out_b, first_alt_start, needs_b, params_b, dp_b,
        alt_awareness, max_score_gap,
    )
    K_A = min(4, params.max_cand)
    dp_a = max(512, (B * K_A) // 16)
    packed, win_ab = _awd_merge(
        out_a, win_a, out_b, win_b, rows, live, overflow,
        needs_a, needs_b, dp_a, dp_b,
    )
    return packed, win_ab, ABOut(out_a, out_b, rows, live, overflow)


class ABOut(NamedTuple):
    """Lazy adaptive-step per-candidate output: the phase-A tile plus
    the phase-B (and optional phase-C) row sets, merged ON DEMAND. The
    eager merge scattered 18 [B2, K] fields per step (~0.6M scatter
    indices, ~20 ms) to build an array that is only ever read for the
    handful of fallback rows; gather_merged_rows does the row-level
    select instead."""

    a: SingleAlignOut
    b: SingleAlignOut
    rows: jax.Array      # [B2] int64 phase-B row ids
    live: jax.Array      # [B2] bool
    overflow: jax.Array  # [B] bool phase-B-capacity overflow rows
    c: SingleAlignOut | None = None   # phase-C wide tile (K may differ)
    rows_c: jax.Array | None = None   # [B3] int64
    live_c: jax.Array | None = None   # [B3] bool


def _awd_phase_c(
    didx, bases, quals, lens, first_alt_start, params,
    alt_awareness, max_score_gap, packed, win_ab, ab,
):
    """Optional third tier: reads still truncated after the phase-B
    wide tile (repeat-family seeds with 33..maxHits hits, or >32
    distinct candidates) rerun at hit_cap=128 / K=64 on B/16 rows.
    The single-end analogue of the paired wide intersection tier; the
    driver enables it per file once a batch shows a material truncated
    fraction (clean genomes never pay for it). Residual truncation
    (beyond the tier's caps or row budget) keeps the flag and takes
    the host wide redo."""
    import dataclasses

    B = bases.shape[0]
    B3 = max(min(128, B), B // 16)
    params_c = dataclasses.replace(
        params, hit_cap=max(128, params.hit_cap), max_cand=64
    )
    dp_c = max(1024, (B3 * params_c.max_cand) // 4)
    rows3, live3 = _awd_pick_rows(win_ab.truncated, B3)
    b_c, q_c, l_c = bases[rows3], quals[rows3], lens[rows3]
    bundle = _awd_candidates(didx, b_c, q_c, l_c, params_c)
    out_c, needs_c = _awd_score(didx, b_c, q_c, bundle, params_c, dp_c)
    _, win_c = _awd_finalize(
        didx, b_c, out_c, first_alt_start, needs_c, params_c, dp_c,
        alt_awareness, max_score_gap,
    )
    packed2 = _awd_merge_c(win_ab, win_c, rows3, live3, needs_c, dp_c)
    return packed2, ab._replace(c=out_c, rows_c=rows3, live_c=live3)


@functools.partial(jax.jit, static_argnames=("B3",))
def _awd_pick_rows(flags, B3: int):
    _, rows = jax.lax.top_k(flags.astype(jnp.int32), B3)
    rows = rows.astype(jnp.int64)
    return rows, flags[rows]


@functools.partial(jax.jit, static_argnames=("dp_c",))
def _awd_merge_c(win_ab, win_c, rows, live, needs_c, dp_c):
    def mrg(a, b):
        return a.at[rows].set(jnp.where(live, b, a[rows]))

    merged = {
        name: mrg(getattr(win_ab, name), getattr(win_c, name))
        for name in WINNER_COLS
    }
    win = WinnerOut(
        **merged,
        dp_overflow=win_ab.dp_overflow | (needs_c > jnp.int32(dp_c)),
    )
    return pack_winners(win)


@functools.partial(jax.jit, static_argnames=("dp_a", "dp_b"))
def _awd_merge(
    out_a, win_a, out_b, win_b, rows, live, overflow,
    needs_a, needs_b, dp_a, dp_b,
):
    B2 = rows.shape[0]

    def mrg(a, b):
        cur = a[rows]
        msk = live.reshape((B2,) + (1,) * (b.ndim - 1))
        return a.at[rows].set(jnp.where(msk, b, cur))

    merged = {
        name: mrg(getattr(win_a, name), getattr(win_b, name))
        for name in WINNER_COLS
    }
    merged["truncated"] = merged["truncated"] | overflow
    win = WinnerOut(
        **merged,
        dp_overflow=(needs_a > jnp.int32(dp_a))
        | (needs_b > jnp.int32(dp_b)),
    )
    return pack_winners(win), win


WINNER_COLS = (
    "found", "fallback", "cand_k", "direction", "dist", "mapq",
    "end_loc", "body_loc", "clip_before", "clip_after", "escalated",
    "indels", "len_eff", "popular", "valid_count", "esc_count",
    "truncated", "edge_indel", "ag_flip",
)


PACK_WORDS = 6


def pack_winners(win: WinnerOut) -> jax.Array:
    """[B+1, 6] int32 bit-packed winner fields; dp_overflow in the
    extra row's column 0.

    The packed winners are the ONLY per-batch device->host transfer on
    the production fast path, and the align step is transfer-bound on
    this link even in good sessions (459KB at 4.4MB/s ~= the whole
    105ms step), so every word here is ~14% of step throughput
    (reference accounting: AlignerContext.cpp:533-573). 17 columns in
    6 words = 24B/read. Word layout (low|high):
      w0 end_loc (uint32 bitcast)      w1 body_loc (uint32 bitcast)
      w2 dist | clip_before            w3 clip_after | len_eff
      w4 valid_count | esc_count | cand_k | popular (8 bits each,
         saturated at 255: counts are bounded by max_cand/num_lookups
         in practice; the host sums them for stats and feeds popular
         to the MAPQ popular-seed penalty, both << 255)
      w5 mapq(0..7) | flags(8..14: found, fallback, direction,
         escalated, truncated, edge_indel, ag_flip) |
         indels_nonzero(15)
    indels compresses to one bit: it carries a 1<<20 "escalated,
    count unknown" sentinel upstream and every host consumer only
    distinguishes zero/nonzero (gapless vs gapped winner).
    """
    M = jnp.int32(0xFFFF)

    def lo16(name):
        return getattr(win, name).astype(jnp.int32) & M

    def pair(lo, hi):
        return lo16(lo) | (lo16(hi) << jnp.int32(16))

    def b8(name, b):
        v = getattr(win, name).astype(jnp.int32)
        return jnp.clip(v, jnp.int32(0), jnp.int32(255)) << jnp.int32(b)

    def bit(name, b):
        return getattr(win, name).astype(jnp.int32) << jnp.int32(b)

    w4 = (
        b8("valid_count", 0) | b8("esc_count", 8)
        | b8("cand_k", 16) | b8("popular", 24)
    )
    w5 = (
        (win.mapq.astype(jnp.int32) & jnp.int32(0xFF))
        | bit("found", 8) | bit("fallback", 9) | bit("direction", 10)
        | bit("escalated", 11) | bit("truncated", 12)
        | bit("edge_indel", 13) | bit("ag_flip", 14)
        | (
            (win.indels.astype(jnp.int32) != jnp.int32(0)).astype(
                jnp.int32
            )
            << jnp.int32(15)
        )
    )
    arr = jnp.stack(
        [
            jax.lax.bitcast_convert_type(win.end_loc, jnp.int32),
            jax.lax.bitcast_convert_type(win.body_loc, jnp.int32),
            pair("dist", "clip_before"),
            pair("clip_after", "len_eff"),
            w4,
            w5,
        ],
        axis=1,
    )
    tail = (
        jnp.zeros((1, PACK_WORDS), jnp.int32)
        .at[0, 0]
        .set(win.dp_overflow.astype(jnp.int32))
    )
    return jnp.concatenate([arr, tail], axis=0)


def _sext16(x: np.ndarray) -> np.ndarray:
    """Low 16 bits of int32 column, sign-extended (matches the int16
    dtypes these fields had on device)."""
    return ((x & 0xFFFF) ^ 0x8000) - 0x8000


class HostWinners:
    """Host-side view of a fetched packed-winner array, presenting the
    WinnerOut field names as numpy columns."""

    def __init__(self, packed: np.ndarray):
        body, meta = packed[:-1].astype(np.int32), packed[-1]
        self.dp_overflow = bool(meta[0])
        self.end_loc = body[:, 0].astype(np.int64) & 0xFFFFFFFF
        self.body_loc = body[:, 1].astype(np.int64) & 0xFFFFFFFF
        self.dist = _sext16(body[:, 2])
        self.clip_before = body[:, 2] >> 16  # arithmetic: sign-extends
        self.clip_after = _sext16(body[:, 3])
        self.len_eff = body[:, 3] >> 16  # lengths are nonnegative
        w4 = body[:, 4]
        self.valid_count = w4 & 0xFF
        self.esc_count = (w4 >> 8) & 0xFF
        self.cand_k = (w4 >> 16) & 0xFF
        self.popular = (w4 >> 24) & 0xFF
        w5 = body[:, 5]
        self.mapq = w5 & 0xFF
        self.found = ((w5 >> 8) & 1).astype(bool)
        self.fallback = ((w5 >> 9) & 1).astype(bool)
        self.direction = (w5 >> 10) & 1
        self.escalated = ((w5 >> 11) & 1).astype(bool)
        self.truncated = ((w5 >> 12) & 1).astype(bool)
        self.edge_indel = ((w5 >> 13) & 1).astype(bool)
        self.ag_flip = ((w5 >> 14) & 1).astype(bool)
        # zero/nonzero only (every consumer tests ==0; see pack_winners)
        self.indels = (w5 >> 15) & 1


@jax.jit
def gather_merged_rows(out, rows: jax.Array):
    """Pack full candidate rows for host-side exact finalization:
    [M, K, 9] int32, ONE device->host transfer (per-leaf fetches each
    pay a link round trip). Same width rules as _pack_subset: order-
    relevant fields stay 32-bit, indels saturates at 0x7FFF (1<<20
    sentinel, host is zero/nonzero only). Unpack with
    unpack_merged_rows.

    `out` is a SingleAlignOut or the adaptive step's lazy ABOut; in
    the latter case each requested row selects between its phase-A
    tile row and (when it was a live phase-B row) the phase-B rerun."""
    r = rows.astype(jnp.int64)
    if isinstance(out, ABOut):
        B = out.a.len_eff.shape[0]
        B2 = out.rows.shape[0]
        posB = (
            jnp.full((B,), -1, jnp.int32)
            .at[out.rows]
            .set(
                jnp.where(
                    out.live,
                    jnp.arange(B2, dtype=jnp.int32),
                    jnp.int32(-1),
                )
            )
        )
        pb = posB[r]
        useB = pb >= 0
        pbc = jnp.clip(pb, 0).astype(jnp.int64)

        def sel(fa, fb):
            va, vb = fa[r], fb[pbc]
            m = useB.reshape((-1,) + (1,) * (va.ndim - 1))
            return jnp.where(m, vb, va)

        sub = SingleAlignOut(*(sel(fa, fb) for fa, fb in zip(out.a, out.b)))
        sub = sub._replace(truncated=sub.truncated | out.overflow[r])
        if out.c is not None:
            # phase-C patch: its K may be wider; pad the a/b rows
            B3 = out.rows_c.shape[0]
            posC = (
                jnp.full((B,), -1, jnp.int32)
                .at[out.rows_c]
                .set(
                    jnp.where(
                        out.live_c,
                        jnp.arange(B3, dtype=jnp.int32),
                        jnp.int32(-1),
                    )
                )
            )
            pc = posC[r]
            useC = pc >= 0
            pcc = jnp.clip(pc, 0).astype(jnp.int64)
            Kc = out.c.dist.shape[1]

            def selc(fs, fc):
                vc = fc[pcc]
                vs = fs
                if vs.ndim == 2 and vs.shape[1] != Kc:
                    vs = jnp.concatenate(
                        [
                            vs,
                            jnp.zeros(
                                (vs.shape[0], Kc - vs.shape[1]), vs.dtype
                            ),
                        ],
                        axis=1,
                    )
                m = useC.reshape((-1,) + (1,) * (vs.ndim - 1))
                return jnp.where(m, vc, vs)

            sub = SingleAlignOut(
                *(selc(fs, fc) for fs, fc in zip(sub, out.c))
            )
        out = sub
        r = jnp.arange(rows.shape[0], dtype=jnp.int64)
    u32 = lambda a: jax.lax.bitcast_convert_type(
        a[r].astype(jnp.uint32), jnp.int32
    )
    w8 = (
        jnp.minimum(out.indels[r].astype(jnp.int32), jnp.int32(0x7FFF))
        | (out.escalated[r].astype(jnp.int32) << jnp.int32(16))
        | (out.valid[r].astype(jnp.int32) << jnp.int32(17))
        | (out.direction[r].astype(jnp.int32) << jnp.int32(18))
    )
    return jnp.stack(
        [
            u32(out.end_loc),
            u32(out.body_loc),
            u32(out.cand_loc),
            jax.lax.bitcast_convert_type(
                out.log_prob[r].astype(jnp.float32), jnp.int32
            ),
            out.dist[r].astype(jnp.int32),
            out.lv_dist[r].astype(jnp.int32),
            out.ag_score[r].astype(jnp.int32),
            (out.clip_before[r].astype(jnp.int32) & jnp.int32(0xFFFF))
            | (out.clip_after[r].astype(jnp.int32) << jnp.int32(16)),
            w8,
        ],
        axis=2,
    )


def unpack_merged_rows(pk: np.ndarray) -> dict:
    """numpy dict view of a fetched gather_merged_rows array."""
    pk = np.ascontiguousarray(pk)
    sx = lambda x: ((x & 0xFFFF) ^ 0x8000) - 0x8000
    return {
        "dist": pk[:, :, 4],
        "lv_dist": pk[:, :, 5],
        "log_prob": np.ascontiguousarray(pk[:, :, 3]).view(np.float32),
        "ag_score": pk[:, :, 6],
        "end_loc": pk[:, :, 0].astype(np.int64) & 0xFFFFFFFF,
        "body_loc": pk[:, :, 1].astype(np.int64) & 0xFFFFFFFF,
        "cand_loc": pk[:, :, 2].astype(np.int64) & 0xFFFFFFFF,
        "escalated": ((pk[:, :, 8] >> 16) & 1).astype(bool),
        "clip_before": sx(pk[:, :, 7]).astype(np.int32),
        "clip_after": (pk[:, :, 7] >> 16).astype(np.int32),
        "indels": (pk[:, :, 8] & 0x7FFF).astype(np.int32),
        "direction": ((pk[:, :, 8] >> 18) & 1).astype(np.int32),
        "valid": ((pk[:, :, 8] >> 17) & 1).astype(bool),
    }
