"""Sharded-index multi-device alignment == single-device alignment.

Runs on the virtual 8-device CPU mesh (conftest). The 2D (data=4,
index=2) sharded path must produce the same final per-read alignments
as the single-shard single-device path.
"""

import numpy as np
import pytest

import snap_tpu  # noqa: F401
import jax
import jax.numpy as jnp

from snap_tpu.align.pipeline import AlignParams, align_single_device
from snap_tpu.align.post import finalize_read
from snap_tpu.constants import PAD
from snap_tpu.genome import Genome, Contig
from snap_tpu.index.build import build_index, shard_index
from snap_tpu.index.index import DeviceIndex
from snap_tpu.parallel.mesh import (
    align_single_sharded,
    make_mesh,
    sharded_device_index,
)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_sharded_matches_single():
    rng = np.random.default_rng(3)
    glen = 30000
    codes = rng.integers(0, 4, size=glen).astype(np.uint8)
    bases_g = np.full(glen + 2000, PAD, np.uint8)
    bases_g[1000 : 1000 + glen] = codes
    genome = Genome(
        bases=bases_g, contigs=[Contig(name="c1", start=1000, length=glen)]
    )
    seed_len = 20
    single = build_index(genome, seed_len)
    sharded = shard_index(genome, seed_len, n_shards=2)

    B, L = 8, 64
    starts = rng.integers(0, glen - L - 1, size=B)
    reads = codes[starts[:, None] + np.arange(L)[None, :]].copy()
    mut = rng.random(reads.shape) < 0.02
    reads = np.where(mut, rng.integers(0, 4, reads.shape), reads).astype(
        np.uint8
    )
    quals = np.full((B, L), ord("I"), np.uint8)
    lens = np.full(B, L, np.int32)

    params = AlignParams(
        seed_len=seed_len,
        max_probe=max(single["max_probe"], sharded["max_probe"]),
        num_seeds=9, hit_cap=8, max_cand=8,
    )

    from snap_tpu.index.index import pack_genome_words

    _p1, _b1 = pack_genome_words(bases_g)
    didx1 = DeviceIndex(
        table=jnp.asarray(single["table"]),
        hits=jnp.asarray(single["hits"]),
        genome=jnp.asarray(bases_g),
        genome_packed=jnp.asarray(_p1),
        genome_bad=jnp.asarray(_b1),
    )
    out1 = align_single_device(
        didx1, jnp.asarray(reads), jnp.asarray(quals), jnp.asarray(lens),
        params,
    )

    mesh = make_mesh(4, 2)
    didx2 = sharded_device_index(sharded, bases_g, mesh)
    out2 = align_single_sharded(
        didx2, jnp.asarray(reads), jnp.asarray(quals), jnp.asarray(lens),
        params, mesh,
    )
    assert np.asarray(out2.dist).shape == (B, 2 * params.max_cand)

    for i in range(B):
        r1, _ = finalize_read(
            *(np.asarray(getattr(out1, f))[i] for f in
              ("dist", "log_prob", "ag_score", "end_loc", "cand_loc",
               "direction", "valid")),
            int(np.asarray(out1.popular)[i]),
        )
        r2, _ = finalize_read(
            *(np.asarray(getattr(out2, f))[i] for f in
              ("dist", "log_prob", "ag_score", "end_loc", "cand_loc",
               "direction", "valid")),
            int(np.asarray(out2.popular)[i]),
        )
        assert r1.status == r2.status, i
        assert r1.end_loc == r2.end_loc, i
        assert r1.dist == r2.dist, i
        assert r1.mapq == r2.mapq, i
        assert r1.direction == r2.direction, i


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_winners_sharded_matches_single():
    """The production fast path (align + device finalize) must produce
    identical packed winners on the (data=4, index=2) mesh and on one
    device."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from snap_tpu.align.pipeline import (
        HostWinners,
        align_winners_device,
    )
    from snap_tpu.index.build import reshard_index
    from snap_tpu.index.index import make_device_index
    from snap_tpu.parallel.mesh import align_winners_sharded

    rng = np.random.default_rng(11)
    glen = 30000
    codes = rng.integers(0, 4, size=glen).astype(np.uint8)
    bases_g = np.full(glen + 2000, PAD, np.uint8)
    bases_g[1000 : 1000 + glen] = codes
    genome = Genome(
        bases=bases_g, contigs=[Contig(name="c1", start=1000, length=glen)]
    )
    seed_len = 20
    single = build_index(genome, seed_len)
    sharded = reshard_index(single, 2)

    B, L = 16, 64
    starts = rng.integers(0, glen - L - 1, size=B)
    reads = codes[starts[:, None] + np.arange(L)[None, :]].copy()
    mut = rng.random(reads.shape) < 0.02
    reads = np.where(mut, rng.integers(0, 4, reads.shape), reads).astype(
        np.uint8
    )
    quals = np.full((B, L), ord("I"), np.uint8)
    lens = np.full(B, L, np.int32)

    params = AlignParams(
        seed_len=seed_len,
        max_probe=max(single["max_probe"], sharded["max_probe"]),
        num_seeds=9, hit_cap=8, max_cand=8,
    )

    didx1 = make_device_index(single, bases_g)
    fas = jnp.int64(bases_g.shape[0])
    win1, _ = align_winners_device(
        didx1, jnp.asarray(reads), jnp.asarray(quals), jnp.asarray(lens),
        fas, params,
    )
    w1 = HostWinners(np.asarray(win1))

    mesh = make_mesh(4, 2)
    didx8 = sharded_device_index(sharded, bases_g, mesh)
    ds = NamedSharding(mesh, P("data"))
    win8, _ = align_winners_sharded(
        didx8,
        jax.device_put(jnp.asarray(reads), ds),
        jax.device_put(jnp.asarray(quals), ds),
        jax.device_put(jnp.asarray(lens), ds),
        fas, params, mesh,
    )
    w8 = HostWinners(np.asarray(win8))

    assert (w1.found == w8.found).all()
    m = w1.found
    # identical final alignment fields for every found read
    for f in ("direction", "dist", "mapq", "end_loc", "clip_before",
              "clip_after", "popular"):
        np.testing.assert_array_equal(
            getattr(w1, f)[m], getattr(w8, f)[m], err_msg=f
        )


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_paired_intersect_sharded_matches_single():
    """Device paired intersection (phases 1-2) on the (data=4, index=2)
    mesh must equal the single-index device intersection bit-for-bit:
    a seed's hit list lives wholly in one shard, so the all-gathered
    entry tables merge to exactly the single-index table."""
    from snap_tpu.align.intersect_device import (
        DeviceIntersectParams,
        paired_candidates_device,
        probe_offsets_for,
    )
    from snap_tpu.index.build import reshard_index
    from snap_tpu.index.index import make_device_index
    from snap_tpu.parallel.mesh import paired_candidates_sharded

    rng = np.random.default_rng(23)
    glen = 30000
    codes = rng.integers(0, 4, size=glen).astype(np.uint8)
    # plant repeats so some lookups are crowded
    unit = codes[500:800].copy()
    for _ in range(12):
        p = int(rng.integers(0, glen - 300))
        codes[p : p + 300] = unit
    bases_g = np.full(glen + 2000, PAD, np.uint8)
    bases_g[1000 : 1000 + glen] = codes
    genome = Genome(
        bases=bases_g, contigs=[Contig(name="c1", start=1000, length=glen)]
    )
    seed_len = 20
    single = build_index(genome, seed_len)
    sharded = reshard_index(single, 2)

    B, L = 8, 100
    p1 = rng.integers(0, glen - 500, size=B)
    ins = rng.integers(250, 450, size=B)
    r1 = codes[p1[:, None] + np.arange(L)[None, :]].copy()
    r2f = codes[(p1 + ins - L)[:, None] + np.arange(L)[None, :]]
    r2 = ((3 - r2f[:, ::-1]) % 4).astype(np.uint8)
    mut = rng.random(r1.shape) < 0.01
    r1 = np.where(mut, rng.integers(0, 4, r1.shape), r1).astype(np.uint8)
    bases = np.concatenate([r1, r2], axis=0)
    len_eff = np.full(2 * B, L, np.int32)

    p = DeviceIntersectParams(
        seed_len=seed_len,
        max_probe=max(single["max_probe"], sharded["max_probe"]),
        num_seeds=8, max_cand=8, max_k_indels=40,
    )
    offsets, set_ids = probe_offsets_for(len_eff, L, seed_len, p.num_seeds)

    didx1 = make_device_index(single, bases_g)
    out1 = paired_candidates_device(
        didx1, jnp.asarray(bases), jnp.asarray(len_eff),
        jnp.asarray(offsets), jnp.asarray(set_ids),
        jnp.int64(50), jnp.int64(500), p,
    )

    mesh = make_mesh(4, 2)
    didx8 = sharded_device_index(sharded, bases_g, mesh)
    out8 = paired_candidates_sharded(
        didx8,
        jnp.asarray(bases[:B]), jnp.asarray(bases[B:]),
        jnp.asarray(len_eff[:B]), jnp.asarray(len_eff[B:]),
        jnp.asarray(offsets[:B]), jnp.asarray(offsets[B:]),
        jnp.asarray(set_ids[:B]), jnp.asarray(set_ids[B:]),
        jnp.int64(50), jnp.int64(500), p, mesh,
    )

    for k in ("loc", "off", "dir", "valid", "weight", "big_indel",
              "popular", "n_lookups", "overflow"):
        np.testing.assert_array_equal(
            np.asarray(out1[k]), np.asarray(out8[k]), err_msg=k
        )
