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
    num_seeds: int = DEFAULT_NUM_SEEDS_SINGLE
    hit_cap: int = 32                 # fixed gather width per (seed, dir)
    max_hits: int = DEFAULT_MAX_HITS  # popular-seed skip threshold
    max_k: int = DEFAULT_MAX_DIST
    max_cand: int = 32                # candidates scored per read
    max_probe: int = 32


class SingleAlignOut(NamedTuple):
    """Per-candidate scoring results, K per read (host selects/merges)."""

    dist: jax.Array      # [B, K] int32 edit distance
    log_prob: jax.Array  # [B, K] float32 ln match probability
    end_loc: jax.Array   # [B, K] int64 exclusive alignment end in genome
    direction: jax.Array # [B, K] int32 0=forward 1=RC
    valid: jax.Array     # [B, K] bool candidate existed and scored <= max_k
    len_eff: jax.Array   # [B] int32 clipped length
    popular: jax.Array   # [B] int32 popular seeds skipped
    n_lookups: jax.Array # [B] int32 seed lookups performed (stats)


def clip_back(quals: jax.Array, lens: jax.Array) -> jax.Array:
    """Default ClipBack: drop the trailing run of '#'-quality bases."""
    B, L = quals.shape
    pos = jnp.arange(L, dtype=jnp.int32)[None, :]
    good = (quals != QUAL_CLIP) & (pos < lens[:, None])
    last_good = jnp.max(jnp.where(good, pos, -1), axis=1)
    return (last_good + 1).astype(jnp.int32)


def reverse_complement_reads(
    bases: jax.Array, quals: jax.Array, len_eff: jax.Array
) -> tuple[jax.Array, jax.Array]:
    """RC of the clipped read, left-aligned; quals reversed to match."""
    B, L = bases.shape
    pos = jnp.arange(L, dtype=jnp.int32)[None, :]
    src = len_eff[:, None] - 1 - pos
    valid = src >= 0
    srcc = jnp.clip(src, 0, L - 1).astype(jnp.int64)
    b = jnp.take_along_axis(bases, srcc, axis=1)
    comp = jnp.where(b < 4, 3 - b, b)
    rc_bases = jnp.where(valid, comp, np.uint8(4))
    rc_quals = jnp.where(valid, jnp.take_along_axis(quals, srcc, axis=1), np.uint8(0))
    return rc_bases, rc_quals


@functools.partial(jax.jit, static_argnames=("params",))
def align_single_device(
    didx: DeviceIndex,
    bases: jax.Array,   # [B, L] uint8
    quals: jax.Array,   # [B, L] uint8
    lens: jax.Array,    # [B] int32
    params: AlignParams,
) -> SingleAlignOut:
    B, L = bases.shape
    S = params.num_seeds
    H = params.hit_cap
    K = params.max_cand
    seed = params.seed_len
    margin = params.max_k + 1
    W = L + 2 * margin

    len_eff = clip_back(quals, lens)
    rc_bases, rc_quals = reverse_complement_reads(bases, quals, len_eff)

    # ---- seed offsets: evenly spaced over the clipped read ----
    span = jnp.maximum(len_eff - seed, 0)  # [B]
    j = jnp.arange(S, dtype=jnp.int32)[None, :]
    denom = max(S - 1, 1)
    offsets = (j * span[:, None]) // denom  # [B, S] monotone nondecreasing
    has_seed = (len_eff >= seed)[:, None]
    dup = jnp.concatenate(
        [jnp.zeros((B, 1), bool), offsets[:, 1:] == offsets[:, :-1]], axis=1
    )
    seed_ok = has_seed & ~dup

    fwd_all, rc_all, valid_all = pack_read_seeds(bases, seed)  # [B, P]
    offs64 = offsets.astype(jnp.int64)
    seed_fwd = jnp.take_along_axis(fwd_all, offs64, axis=1)
    seed_rc = jnp.take_along_axis(rc_all, offs64, axis=1)
    seed_ok = seed_ok & jnp.take_along_axis(valid_all, offs64, axis=1)

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
    f_n = jnp.where(found & ~pop_f, f_n, 0)
    r_n = jnp.where(found & ~pop_r, r_n, 0)

    f_locs, f_valid = gather_hits(didx.hits, f_start, f_n, H)  # [B*S, H]
    r_locs, r_valid = gather_hits(didx.hits, r_start, r_n, H)

    # ---- candidate locations ----
    off_flat = offsets.reshape(-1, 1).astype(jnp.int64)
    le_flat = jnp.repeat(len_eff, S).reshape(-1, 1).astype(jnp.int64)
    cand_f = f_locs.astype(jnp.int64) - off_flat
    cand_r = r_locs.astype(jnp.int64) - (le_flat - seed - off_flat)

    BIG = jnp.int64(1) << 42
    INF_KEY = jnp.int64(1) << 60
    key_f = jnp.where(f_valid, cand_f, INF_KEY)
    key_r = jnp.where(r_valid, cand_r + BIG, INF_KEY)
    keys = jnp.concatenate(
        [key_f.reshape(B, S * H), key_r.reshape(B, S * H)], axis=1
    )  # [B, M]
    M = 2 * S * H
    keys = jnp.sort(keys, axis=1)

    # run-length dedup + weights
    is_start = jnp.concatenate(
        [jnp.ones((B, 1), bool), keys[:, 1:] != keys[:, :-1]], axis=1
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
    cand_valid = wv > 0
    cand_dir = (cand_keys >= BIG).astype(jnp.int32)
    cand_loc = jnp.where(cand_dir == 1, cand_keys - BIG, cand_keys)
    cand_loc = jnp.where(cand_valid, cand_loc, 0)

    # ---- scoring wavefront ----
    logq_table = jnp.asarray(log_phred_error_table())
    flat_dir = cand_dir.reshape(-1)  # [B*K]
    read_ix = jnp.repeat(jnp.arange(B, dtype=jnp.int64), K)
    pat = jnp.where(
        (flat_dir == 1)[:, None], rc_bases[read_ix], bases[read_ix]
    )
    patq = jnp.where(
        (flat_dir == 1)[:, None], rc_quals[read_ix], quals[read_ix]
    )
    pat_logq = logq_table[patq.astype(jnp.int64)].astype(jnp.float32)

    win_start = cand_loc.reshape(-1) - margin
    cols = jnp.arange(W, dtype=jnp.int64)[None, :]
    tpos = win_start[:, None] + cols
    in_bounds = (tpos >= 0) & (tpos < didx.genome.shape[0])
    text = jnp.where(
        in_bounds, didx.genome[jnp.clip(tpos, 0, didx.genome.shape[0] - 1)], np.uint8(5)
    )

    plen = len_eff[read_ix]
    res = fitting_edit_distance(pat, pat_logq, plen, text)

    dist = res.dist.reshape(B, K)
    log_prob = res.log_prob.reshape(B, K)
    end_loc = (win_start + res.end_col.astype(jnp.int64)).reshape(B, K)
    ok = cand_valid & (dist <= params.max_k)

    return SingleAlignOut(
        dist=dist,
        log_prob=log_prob,
        end_loc=end_loc,
        direction=cand_dir,
        valid=ok,
        len_eff=len_eff,
        popular=popular,
        n_lookups=seed_ok.sum(axis=1).astype(jnp.int32),
    )
