"""Multi-chip execution: data-parallel reads x sharded index.

Behavioral reference: the reference is single-node multithreaded
(ParallelTask.h:43, RangeSplitter.h:38); this module is its scale-out
replacement per SURVEY.md section 2.6: reads are data-parallel across
the 'data' mesh axis, and the genome index (hash tables + hit lists,
the ~30GB object for hg38) is sharded across the 'index' axis. Each
device probes its local index shard for all reads in its data column —
a non-owning shard cleanly misses, so no query routing is needed — and
scores its own candidates locally against the (replicated) genome.
Per-shard top-K candidate lists concatenate across the index axis via
the shard_map output spec (an all-gather over ICI), and the existing
merge/selection consumes the union.

Launch across hosts with jax.distributed.initialize(); the mesh spans
all global devices.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..align.pipeline import (
    AlignParams,
    SingleAlignOut,
    Tier1Out,
    _align_impl,
    _device_finalize,
    align_single_device,
    pack_winners,
)
from ..index.index import DeviceIndex


def make_mesh(n_data: int, n_index: int, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    devs = np.array(devices[: n_data * n_index]).reshape(n_data, n_index)
    return Mesh(devs, axis_names=("data", "index"))


def sharded_device_index(arrays: dict, genome_bases: np.ndarray, mesh: Mesh):
    """Place a stacked [n_shards, ...] index on the mesh: tables/hits
    sharded over 'index', genome replicated."""
    idx_spec = NamedSharding(mesh, P("index"))
    repl = NamedSharding(mesh, P())
    from ..index.index import pack_bad16, pack_genome_words

    packed, bad = pack_genome_words(genome_bases)
    return DeviceIndex(
        table=jax.device_put(jnp.asarray(arrays["table"]), idx_spec),
        hits=jax.device_put(jnp.asarray(arrays["hits"]), idx_spec),
        genome=jax.device_put(jnp.asarray(genome_bases), repl),
        genome_packed=jax.device_put(jnp.asarray(packed), repl),
        genome_bad=jax.device_put(jnp.asarray(bad), repl),
        genome_bad16=jax.device_put(
            jnp.asarray(pack_bad16(genome_bases, packed.shape[0])), repl
        ),
    )


@functools.partial(jax.jit, static_argnames=("params", "mesh"))
def align_single_sharded(
    didx: DeviceIndex,   # stacked [n_shards, ...] tables, genome replicated
    bases: jax.Array,    # [B, L] sharded over 'data'
    quals: jax.Array,
    lens: jax.Array,
    params: AlignParams,
    mesh: Mesh,
) -> SingleAlignOut:
    """Run the align wavefront on every (data, index) device; concat the
    per-shard candidate lists along K."""

    def local(didx_local, b, q, l):
        local_idx = DeviceIndex(
            table=didx_local.table[0],
            hits=didx_local.hits[0],
            genome=didx_local.genome,
            genome_packed=didx_local.genome_packed,
            genome_bad=didx_local.genome_bad,
            genome_bad16=didx_local.genome_bad16,
        )
        out = align_single_device(local_idx, b, q, l, params)
        # a seed's hits live wholly in one shard, so popular-seed skips
        # sum across shards; n_lookups/len_eff are shard-independent
        popular = jax.lax.psum(out.popular, "index")
        truncated = (
            jax.lax.psum(out.truncated.astype(jnp.int32), "index") > 0
        )
        return out._replace(popular=popular, truncated=truncated)

    idx_specs = DeviceIndex(
        table=P("index"),
        hits=P("index"),
        genome=P(),
        genome_packed=P(),
        genome_bad=P(),
        genome_bad16=P(),
    )
    cand2d = P("data", "index")  # [B, K*n_shards] concat across shards
    out_specs = SingleAlignOut(
        dist=cand2d, lv_dist=cand2d, indels=cand2d, log_prob=cand2d,
        ag_score=cand2d, end_loc=cand2d,
        body_loc=cand2d, cand_loc=cand2d, escalated=cand2d,
        clip_before=cand2d, clip_after=cand2d, seed_off=cand2d,
        direction=cand2d, valid=cand2d,
        len_eff=P("data"), popular=P("data"), n_lookups=P("data"),
        truncated=P("data"),
    )
    f = shard_map(
        local,
        mesh=mesh,
        in_specs=(idx_specs, P("data"), P("data"), P("data")),
        out_specs=out_specs,
        check_vma=False,
    )
    return f(didx, bases, quals, lens)


def local_index_view(didx: DeviceIndex) -> DeviceIndex:
    """Flat view of a stacked sharded index for genome-only consumers
    (score_rows / score_candidates never probe the hash table)."""
    return DeviceIndex(
        table=didx.table[0],
        hits=didx.hits[0],
        genome=didx.genome,
        genome_packed=didx.genome_packed,
        genome_bad=didx.genome_bad,
        genome_bad16=didx.genome_bad16,
    )


_IDX_SPECS = DeviceIndex(
    table=P("index"), hits=P("index"), genome=P(),
    genome_packed=P(), genome_bad=P(), genome_bad16=P(),
)


def _local_didx(didx_local: DeviceIndex) -> DeviceIndex:
    return DeviceIndex(
        table=didx_local.table[0],
        hits=didx_local.hits[0],
        genome=didx_local.genome,
        genome_packed=didx_local.genome_packed,
        genome_bad=didx_local.genome_bad,
        genome_bad16=didx_local.genome_bad16,
    )


def _merge_out_across_index(out: SingleAlignOut) -> SingleAlignOut:
    """Concatenate per-shard candidate lists along K; reduce per-read
    scalars. A seed's full hit list lives in exactly one shard (shard =
    top murmur bits of the key), so popular-skip counts and truncation
    flags sum/or across shards while len_eff/n_lookups are identical."""
    g2 = lambda x: jax.lax.all_gather(x, "index", axis=1, tiled=True)
    return out._replace(
        dist=g2(out.dist), lv_dist=g2(out.lv_dist), indels=g2(out.indels),
        log_prob=g2(out.log_prob), ag_score=g2(out.ag_score),
        end_loc=g2(out.end_loc), body_loc=g2(out.body_loc),
        cand_loc=g2(out.cand_loc), escalated=g2(out.escalated),
        clip_before=g2(out.clip_before), clip_after=g2(out.clip_after),
        seed_off=g2(out.seed_off), direction=g2(out.direction),
        valid=g2(out.valid),
        popular=jax.lax.psum(out.popular, "index"),
        truncated=jax.lax.psum(out.truncated.astype(jnp.int32), "index") > 0,
    )


@functools.partial(
    jax.jit,
    static_argnames=("params", "mesh", "dp_rows", "alt_awareness",
                     "max_score_gap"),
)
def align_winners_sharded(
    didx: DeviceIndex,          # stacked [n_shards, ...] tables
    bases: jax.Array,           # [B, L] sharded over 'data'
    quals: jax.Array,
    lens: jax.Array,
    first_alt_start: jax.Array,
    params: AlignParams,
    mesh: Mesh,
    dp_rows: int | None = None,
    alt_awareness: bool = True,
    max_score_gap: int = 64,
):
    """Multi-chip production fast path: the same align + device-finalize
    step the single-chip CLI runs (align_winners_device), as a shard_map
    over a (data x index) mesh. Each device probes its index shard for
    its data column, candidate lists all-gather over ICI along the
    'index' axis, and winner selection + MAPQ run on the merged [B_loc,
    K*n_idx] tile. Output winners are replicated along 'index'.
    """
    if dp_rows is None:
        n_data = mesh.shape["data"]
        dp_rows = max(1024, (bases.shape[0] // n_data * params.max_cand) // 256)

    def local(didx_local, b, q, l, fas):
        out, needs_total = _align_impl(
            _local_didx(didx_local), b, q, l, params,
            tier1_only=False, dp_rows=dp_rows, return_needs=True,
        )
        merged = _merge_out_across_index(out)
        needs_max = jax.lax.pmax(needs_total, "index")
        win = _device_finalize(
            merged, fas, alt_awareness, max_score_gap,
            params.use_affine_gap, needs_max, dp_rows,
            max_k=params.max_k,
            extra_search_depth=params.extra_search_depth,
            didx=_local_didx(didx_local), bases=b, flag_params=params,
        )
        # pack per shard WITHOUT the dp_overflow tail row (tails would
        # interleave in the data-axis concat); the flag reduces globally
        packed = pack_winners(win)
        return (
            packed[:-1],
            jax.lax.pmax(jax.lax.pmax(packed[-1:], "data"), "index"),
            merged,
        )

    cand2d = P("data")  # K axis already globally merged inside
    out_specs = (
        P("data"),
        P(),
        SingleAlignOut(
            dist=cand2d, lv_dist=cand2d, indels=cand2d, log_prob=cand2d,
            ag_score=cand2d,
            end_loc=cand2d, body_loc=cand2d, cand_loc=cand2d,
            escalated=cand2d, clip_before=cand2d, clip_after=cand2d,
            seed_off=cand2d, direction=cand2d, valid=cand2d,
            len_eff=P("data"), popular=P("data"), n_lookups=P("data"),
            truncated=P("data"),
        ),
    )
    f = shard_map(
        local,
        mesh=mesh,
        in_specs=(_IDX_SPECS, P("data"), P("data"), P("data"), P()),
        out_specs=out_specs,
        check_vma=False,
    )
    body, tail, merged = f(didx, bases, quals, lens, first_alt_start)
    return jnp.concatenate([body, tail], axis=0), merged


@functools.partial(jax.jit, static_argnames=("params", "mesh"))
def align_tier1_sharded(
    didx: DeviceIndex,
    bases: jax.Array,
    quals: jax.Array,
    lens: jax.Array,
    params: AlignParams,
    mesh: Mesh,
) -> Tier1Out:
    """Sharded tier-1 (candidates + gapless prescreen) for the two-phase
    host-gated path: per-shard candidate tiles concatenate along K.
    Downstream score_rows/two_phase_merge use local_index_view (genome
    is replicated; the DP tier never probes the hash table)."""

    def local(didx_local, b, q, l):
        t1 = _align_impl(
            _local_didx(didx_local), b, q, l, params, tier1_only=True
        )
        g2 = lambda x: jax.lax.all_gather(x, "index", axis=1, tiled=True)
        return t1._replace(
            cand_loc=g2(t1.cand_loc), seed_off=g2(t1.seed_off),
            direction=g2(t1.direction), valid=g2(t1.valid),
            weight=g2(t1.weight), gapless_dist=g2(t1.gapless_dist),
            gapless_logp=g2(t1.gapless_logp),
            big_indel=g2(t1.big_indel),
            popular=jax.lax.psum(t1.popular, "index"),
            truncated=(
                jax.lax.psum(t1.truncated.astype(jnp.int32), "index") > 0
            ),
        )

    c2 = P("data")
    out_specs = Tier1Out(
        cand_loc=c2, seed_off=c2, direction=c2, valid=c2, weight=c2,
        gapless_dist=c2, gapless_logp=c2, len_eff=P("data"),
        popular=P("data"), n_lookups=P("data"), truncated=P("data"),
        big_indel=c2,
    )
    f = shard_map(
        local,
        mesh=mesh,
        in_specs=(_IDX_SPECS, P("data"), P("data"), P("data")),
        out_specs=out_specs,
        check_vma=False,
    )
    return f(didx, bases, quals, lens)


@functools.partial(jax.jit, static_argnames=("p", "mesh"))
def paired_candidates_sharded(
    didx: DeviceIndex,    # stacked [n_shards, ...] tables
    bases0: jax.Array,    # [B, L] side-0 reads, sharded over 'data'
    bases1: jax.Array,    # [B, L] side-1 reads
    len_eff0: jax.Array,  # [B] i32
    len_eff1: jax.Array,
    offsets0: jax.Array,  # [B, S] i32 probe offsets (-1 = unused)
    offsets1: jax.Array,
    set_ids0: jax.Array,  # [B, S] i32 disjoint-set ids
    set_ids1: jax.Array,
    min_sp: jax.Array,    # [] i64
    max_sp: jax.Array,    # [] i64
    p,                    # DeviceIntersectParams
    mesh: Mesh,
) -> dict:
    """Sharded-index twin of intersect_device.paired_candidates_device
    (phases 1-2 of IntersectingPairedEndAligner.cpp:406-717 on a
    (data x index) mesh): each device probes its local index shard for
    its data column's seeds, the per-(row, dir) entry-key tables
    all-gather along 'index' (a seed's hit list lives wholly in one
    shard, so the merged table equals the single-index table; recorded
    / popular counts psum), and phase 2 (fuzzy match, bps, compaction,
    mate windows, phase 2a, top-K) runs on the union.

    Inputs arrive split per side so every local block holds both mates
    of its pairs (the mate-window step pairs local row i with local
    row B_loc + i); outputs are re-concatenated [side0; side1] to the
    [2B] row order the driver uses.
    """
    from ..align.intersect_device import (
        _phase1_entries, _phase2_from_entries,
    )

    L = bases0.shape[1]

    def local(didx_local, b0, b1, le0, le1, of0, of1, si0, si1, mn, mx):
        b = jnp.concatenate([b0, b1], axis=0)
        le = jnp.concatenate([le0, le1], axis=0)
        off = jnp.concatenate([of0, of1], axis=0)
        sid = jnp.concatenate([si0, si1], axis=0)
        e_key, rec, pop, nlk, over = _phase1_entries(
            _local_didx(didx_local), b, le, off, sid, p
        )
        e_key = jax.lax.all_gather(e_key, "index", axis=1, tiled=True)
        rec = jax.lax.psum(rec, "index")
        # popularity / gather-cap overflow are owned by exactly one
        # shard per lookup; n_lookups is table-independent (identical
        # on every shard)
        pop = jax.lax.psum(pop, "index")
        over = jax.lax.psum(over.astype(jnp.int32), "index") > 0
        out = _phase2_from_entries(
            e_key, rec, pop, nlk, over, le, off, sid, mn, mx, p, L
        )
        Bl = b0.shape[0]
        return {k: (v[:Bl], v[Bl:]) for k, v in out.items()}

    d = P("data")
    out_specs = {
        k: (d, d)
        for k in ("loc", "off", "dir", "valid", "weight", "big_indel",
                  "popular", "n_lookups", "overflow")
    }
    f = shard_map(
        local,
        mesh=mesh,
        in_specs=(_IDX_SPECS, d, d, d, d, d, d, d, d, P(), P()),
        out_specs=out_specs,
        check_vma=False,
    )
    halves = f(
        didx, bases0, bases1, len_eff0, len_eff1, offsets0, offsets1,
        set_ids0, set_ids1, min_sp, max_sp,
    )
    return {
        k: jnp.concatenate([v0, v1], axis=0) for k, (v0, v1) in halves.items()
    }
