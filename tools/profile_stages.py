"""Per-stage timing of the single-end align wavefront on the real chip.

Times each stage of align_winners_device separately (same shapes as
bench.py) so perf work targets the actual bottleneck instead of the
monolithic number. Each stage is jitted alone with its inputs
device-resident and donated barriers; 5+ timed iterations, device_get
of a small reduction output to defeat async dispatch.

Usage: python tools/profile_stages.py [--batch 16384]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def timeit(fn, args, n=6, name=""):
    import jax

    out = fn(*args)
    jax.block_until_ready(out)
    # sync via a tiny reduction fetch (block_until_ready on axon can
    # return early)
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        dt = time.perf_counter() - t0
        best = min(best, dt)
    print(f"{name:34s} {best*1e3:9.2f} ms")
    return best, out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16384)
    ap.add_argument("--read-len", type=int, default=100)
    args = ap.parse_args()

    import snap_tpu  # noqa: F401
    import jax
    import jax.numpy as jnp
    import functools
    from snap_tpu.genome import Genome, Contig
    from snap_tpu.constants import PAD
    from snap_tpu.index.build import build_index
    from snap_tpu.index.index import (
        make_device_index, pack_read_seeds, probe, gather_hits,
    )
    from snap_tpu.align import pipeline as P
    from snap_tpu.align.pipeline import (
        AlignParams, align_winners_device, clip_back,
        reverse_complement_reads, snap_seed_wrap_order,
    )

    print("backend:", jax.default_backend())
    rng = np.random.default_rng(0)
    glen = 1_000_000
    L = args.read_len
    B = args.batch
    codes = rng.integers(0, 4, size=glen).astype(np.uint8)
    gb = np.full(glen + 2000, PAD, dtype=np.uint8)
    gb[1000 : 1000 + glen] = codes
    genome = Genome(
        bases=gb, contigs=[Contig(name="chr1", start=1000, length=glen)]
    )
    idx = build_index(genome, seed_len=24)
    didx = make_device_index(idx, gb)
    params = AlignParams(
        seed_len=24, max_probe=idx["max_probe"], num_seeds=14,
        hit_cap=8, max_cand=16,
    )

    starts = rng.integers(0, glen - L - 1, size=B)
    reads = codes[starts[:, None] + np.arange(L)[None, :]]
    mut = rng.random(reads.shape) < 0.01
    reads = np.where(mut, rng.integers(0, 4, reads.shape), reads).astype(
        np.uint8
    )
    b = jnp.asarray(reads)
    q = jnp.asarray(np.full((B, L), ord("I"), np.uint8))
    l = jnp.asarray(np.full(B, L, np.int32))
    fas = jnp.int64(gb.shape[0])

    S = params.num_lookups
    H = params.hit_cap
    K = params.max_cand
    seed = params.seed_len

    # ---- whole step (reference number) ----
    f_whole = functools.partial(
        align_winners_device, params=params
    )
    timeit(
        lambda: jax.tree.map(
            lambda x: x, f_whole(didx, b, q, l, fas)[0]
        ),
        (),
        name="WHOLE align_winners_device",
    )

    # ---- stage 1: clip + rc + seed pack + rank/top_k ----
    @jax.jit
    def stage_seeds(b, q, l):
        len_eff = clip_back(q, l)
        rc_b, rc_q = reverse_complement_reads(b, q, len_eff)
        fwd_all, rc_all, valid_all = pack_read_seeds(b, seed)
        Pn = L - seed + 1
        wrap = snap_seed_wrap_order(seed)
        pos = np.arange(Pn, dtype=np.int32)
        rank_static = wrap[pos % seed] * (Pn // seed + 2) + pos // seed
        rank = jnp.asarray(rank_static, dtype=jnp.int32)[None, :]
        INF = np.int32(1 << 30)
        usable = valid_all & (pos[None, :] <= (len_eff - seed)[:, None])
        ranks = jnp.where(usable, rank, INF)
        neg_top, offs = jax.lax.top_k(-ranks, S)
        offs64 = offs.astype(jnp.int64)
        sf = jnp.take_along_axis(fwd_all, offs64, axis=1)
        sr = jnp.take_along_axis(rc_all, offs64, axis=1)
        return len_eff, rc_b, rc_q, sf, sr, offs, neg_top

    _, st1 = timeit(lambda: stage_seeds(b, q, l), (), name="seeds: clip+rc+pack+rank")
    len_eff, rc_b, rc_q, sf, sr, offs, neg_top = st1

    # ---- stage 2: probe ----
    @jax.jit
    def stage_probe(sf, sr):
        canonical = jnp.minimum(sf, sr).reshape(-1)
        return probe(didx, canonical, params.max_probe)

    _, st2 = timeit(lambda: stage_probe(sf, sr), (), name="probe (hash table)")
    found, start, n0, n1 = st2

    # ---- stage 3: gather hits ----
    @jax.jit
    def stage_gather(start, n0, n1):
        f_locs, f_valid = gather_hits(didx.hits, start, n0, H)
        r_locs, r_valid = gather_hits(
            didx.hits, start + n0.astype(jnp.int64), n1, H
        )
        return f_locs, f_valid, r_locs, r_valid

    _, st3 = timeit(lambda: stage_gather(start, n0, n1), (), name="gather_hits")
    f_locs, f_valid, r_locs, r_valid = st3

    # ---- stage 4: sort/dedup/top-K ----
    @jax.jit
    def stage_dedup(f_locs, f_valid, r_locs, r_valid, offs, len_eff):
        off_flat = offs.reshape(-1, 1).astype(jnp.int64)
        le_flat = jnp.repeat(len_eff, S).reshape(-1, 1).astype(jnp.int64)
        cand_f = f_locs.astype(jnp.int64) - off_flat
        cand_r = r_locs.astype(jnp.int64) - (le_flat - seed - off_flat)
        OFF_BITS = 10
        BIG = jnp.int64(1) << (42 + OFF_BITS)
        INF_KEY = jnp.int64(1) << 62
        probe_ix = jnp.broadcast_to(
            jnp.arange(S, dtype=jnp.int64)[None, :, None], (B, S, H)
        ).reshape(B * S, H)
        key_f = jnp.where(f_valid, (cand_f << OFF_BITS) | probe_ix, INF_KEY)
        key_r = jnp.where(
            r_valid, ((cand_r << OFF_BITS) | probe_ix) + BIG, INF_KEY
        )
        keys = jnp.concatenate(
            [key_f.reshape(B, S * H), key_r.reshape(B, S * H)], axis=1
        )
        M = 2 * S * H
        keys = jnp.sort(keys, axis=1)
        kid = keys >> OFF_BITS
        is_start = jnp.concatenate(
            [jnp.ones((B, 1), bool), kid[:, 1:] != kid[:, :-1]], axis=1
        )
        posm = jnp.arange(M, dtype=jnp.int32)[None, :]
        start_pos = jnp.where(is_start, posm, M)
        rev = jnp.flip(start_pos, axis=1)
        nxt = jax.lax.associative_scan(jnp.minimum, rev, axis=1)
        nxt = jnp.flip(nxt, axis=1)
        next_start = jnp.concatenate(
            [nxt[:, 1:], jnp.full((B, 1), M, jnp.int32)], axis=1
        )
        weight = jnp.where(is_start & (keys < INF_KEY), next_start - posm, -1)
        wv, wi = jax.lax.top_k(weight, K)
        return wv, wi, jnp.take_along_axis(keys, wi.astype(jnp.int64), axis=1)

    timeit(
        lambda: stage_dedup(f_locs, f_valid, r_locs, r_valid, offs, len_eff),
        (), name="sort+dedup+top_k",
    )

    # ---- tier-1 gapless via the full impl with tier1_only ----
    from snap_tpu.align.pipeline import align_tier1

    timeit(
        lambda: align_tier1(didx, b, q, l, params),
        (), name="tier1 total (seeds..gapless)",
    )

    print("done")


if __name__ == "__main__":
    main()
