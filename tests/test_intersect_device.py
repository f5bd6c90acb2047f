"""Device paired intersection vs the host reference implementation.

paired_candidates_device must reproduce align/intersect.paired_candidates
bit-for-bit on rows it does not flag for the exact host redo — on both
a random genome (near-unique seeds) and a repeat-heavy genome (the
hard case the intersection exists for)."""

import numpy as np
import pytest

from snap_tpu.align.intersect import IntersectParams, paired_candidates
from snap_tpu.align.intersect_device import (
    DeviceIntersectParams,
    paired_candidates_device,
    probe_offsets_for,
)
from snap_tpu.constants import PAD
from snap_tpu.genome import Contig, Genome
from snap_tpu.index.index import GenomeIndex

RC = np.array([3, 2, 1, 0, 4], np.uint8)


def _mk_genome(rng, glen, repeat_frac=0.0):
    seq = rng.integers(0, 4, size=glen).astype(np.uint8)
    if repeat_frac > 0:
        budget = int(glen * repeat_frac)
        alu = rng.integers(0, 4, size=300).astype(np.uint8)
        for _ in range(max(1, budget // 2 // 300)):
            p = int(rng.integers(0, glen - 300))
            u = alu.copy()
            d = rng.random(300) < 0.01
            u[d] = rng.integers(0, 4, int(d.sum()))
            seq[p : p + 300] = u
        line = rng.integers(0, 4, size=3000).astype(np.uint8)
        for _ in range(max(1, budget // 2 // 3000)):
            p = int(rng.integers(0, glen - 3000))
            seq[p : p + 3000] = line
    gb = np.full(glen + 2000, PAD, dtype=np.uint8)
    gb[1000 : 1000 + glen] = seq
    genome = Genome(
        bases=gb, contigs=[Contig(name="chr1", start=1000, length=glen)]
    )
    return genome, seq


def _mk_pairs(rng, seq, B, L):
    glen = seq.shape[0]
    inserts = np.clip(
        rng.normal(300, 50, size=B).astype(np.int64), 2 * L + 10, 600
    )
    starts = rng.integers(0, glen - 700, size=B)
    bases = np.full((2 * B, L), 4, np.uint8)
    for i in range(B):
        fwd = seq[starts[i] : starts[i] + L].copy()
        mate = RC[seq[starts[i] + inserts[i] - L : starts[i] + inserts[i]][::-1]].copy()
        for r in (fwd, mate):
            m = rng.random(L) < 0.01
            r[m] = rng.integers(0, 4, int(m.sum()))
        bases[i] = fwd
        bases[B + i] = mate
    return bases


def _compare(
    index, bases, B, L, seed_len=20, hit_cap=32, cand_width=32,
    num_seeds=8,
):
    import jax.numpy as jnp

    R = bases.shape[0]
    len_eff = np.full(R, L, np.int32)
    ip = IntersectParams(
        seed_len=seed_len, num_seeds=num_seeds, max_cand=16,
        max_k_indels=40,
    )
    host = paired_candidates(index.host, bases, len_eff, B, ip)

    offsets, set_ids = probe_offsets_for(len_eff, L, seed_len, num_seeds)
    dp = DeviceIntersectParams(
        seed_len=seed_len,
        max_probe=index.max_probe,
        num_seeds=num_seeds,
        hit_cap=hit_cap,
        cand_width=cand_width,
        max_cand=16,
        max_k_indels=40,
    )
    dev = paired_candidates_device(
        index.device,
        jnp.asarray(bases),
        jnp.asarray(len_eff),
        jnp.asarray(offsets),
        jnp.asarray(set_ids),
        jnp.int64(ip.min_spacing),
        jnp.int64(ip.max_spacing),
        dp,
    )
    dev = {k: np.asarray(v) for k, v in dev.items()}

    over_pair = dev["overflow"][:B] | dev["overflow"][B:]
    over_row = np.concatenate([over_pair, over_pair])
    ok_rows = np.flatnonzero(~over_row)
    assert ok_rows.size > 0
    for f_dev, f_host in (
        ("loc", host.loc),
        ("off", host.off),
        ("dir", host.dir),
        ("valid", host.valid),
        ("weight", host.weight),
        ("big_indel", host.big_indel),
    ):
        d = dev[f_dev][ok_rows]
        h = f_host[ok_rows]
        if f_dev in ("loc", "off", "dir", "weight", "big_indel"):
            d = np.where(dev["valid"][ok_rows], d, 0)
            h = np.where(host.valid[ok_rows], h, 0)
        mism = np.nonzero(d != h)
        assert d.shape == h.shape and (d == h).all(), (
            f"{f_dev} mismatch at {mism[0][:5]}, {mism[1][:5]}: "
            f"dev {d[mism][:5]} host {h[mism][:5]}"
        )
    assert (dev["popular"] == host.popular).all()
    assert (dev["n_lookups"] == host.n_lookups).all()
    return dev, over_pair


def test_device_matches_host_random_genome():
    rng = np.random.default_rng(7)
    genome, seq = _mk_genome(rng, 120_000)
    index = GenomeIndex.build(genome, seed_len=20)
    bases = _mk_pairs(rng, seq, 64, 100)
    dev, over = _compare(index, bases, 64, 100)
    # random genome: nothing should overflow the caps
    assert not over.any()


def test_device_matches_host_many_seeds():
    """num_seeds > 16 exercises the 5-bit lookup-index packing (a
    4-bit field silently corrupted candidate locations for -n > 16)."""
    rng = np.random.default_rng(23)
    genome, seq = _mk_genome(rng, 120_000)
    index = GenomeIndex.build(genome, seed_len=20)
    bases = _mk_pairs(rng, seq, 48, 100)
    dev, over = _compare(index, bases, 48, 100, num_seeds=25)
    assert not over.any()


def test_device_matches_host_repeat_genome():
    rng = np.random.default_rng(11)
    genome, seq = _mk_genome(rng, 120_000, repeat_frac=0.30)
    index = GenomeIndex.build(genome, seed_len=20)
    bases = _mk_pairs(rng, seq, 64, 100)
    dev, over = _compare(index, bases, 64, 100)
    # repeat rows may overflow (they fall back to the host), but the
    # clean majority must match exactly — and some repeats must have
    # stayed within the cap for the test to mean anything
    assert (~over).sum() >= 32


def test_device_overflow_flags_capped_rows():
    rng = np.random.default_rng(13)
    genome, seq = _mk_genome(rng, 60_000)
    # plant a massive exact repeat so its seeds exceed a tiny hit cap
    unit = seq[5000:5060].copy()
    for k in range(40):
        p = 8000 + 200 * k
        seq[p : p + 60] = unit
    genome.bases[1000 : 1000 + seq.shape[0]] = seq
    index = GenomeIndex.build(genome, seed_len=20)
    B, L = 8, 100
    bases = np.full((2 * B, L), 4, np.uint8)
    for i in range(B):
        bases[i, :60] = unit
        bases[i, 60:] = seq[5060:5100]
        mate = RC[seq[5200:5300][::-1]]
        bases[B + i] = mate
    import jax.numpy as jnp

    len_eff = np.full(2 * B, L, np.int32)
    offsets, set_ids = probe_offsets_for(len_eff, L, 20, 8)
    dp = DeviceIntersectParams(
        seed_len=20, max_probe=index.max_probe, num_seeds=8,
        hit_cap=8, cand_width=16, max_cand=16,
    )
    dev = paired_candidates_device(
        index.device, jnp.asarray(bases), jnp.asarray(len_eff),
        jnp.asarray(offsets), jnp.asarray(set_ids),
        jnp.int64(0), jnp.int64(1000), dp,
    )
    over = np.asarray(dev["overflow"])
    assert over[:B].any()


def test_wide_redo_recovers_overflow_rows():
    """paired_wide_redo: pairs the standard HP/C caps flag must come
    back bit-equal to the exact host intersection once rerun at the
    wide geometry (the on-device second tier that replaces the host
    redo for repeat-dense pairs)."""
    import jax.numpy as jnp

    from snap_tpu.align.intersect_device import paired_wide_redo

    rng = np.random.default_rng(31)
    genome, seq = _mk_genome(rng, 120_000, repeat_frac=0.30)
    index = GenomeIndex.build(genome, seed_len=20)
    B, L = 64, 100
    bases = _mk_pairs(rng, seq, B, L)
    len_eff = np.full(2 * B, L, np.int32)
    ip = IntersectParams(
        seed_len=20, num_seeds=8, max_cand=16, max_k_indels=40
    )
    host = paired_candidates(index.host, bases, len_eff, B, ip)
    offsets, set_ids = probe_offsets_for(len_eff, L, 20, 8)
    dp = DeviceIntersectParams(
        seed_len=20, max_probe=index.max_probe, num_seeds=8,
        hit_cap=8, cand_width=8, max_cand=16, max_k_indels=40,
    )
    args = (
        index.device, jnp.asarray(bases), jnp.asarray(len_eff),
        jnp.asarray(offsets), jnp.asarray(set_ids),
        jnp.int64(ip.min_spacing), jnp.int64(ip.max_spacing),
    )
    pcd = paired_candidates_device(*args, dp)
    ov0 = np.asarray(pcd["overflow"])
    ovp0 = ov0[:B] | ov0[B:]
    assert ovp0.any(), "tight caps must overflow on the repeat genome"

    pcd = paired_wide_redo(
        index.device, jnp.asarray(bases), jnp.asarray(len_eff),
        jnp.asarray(offsets), jnp.asarray(set_ids), pcd,
        np.flatnonzero(ovp0),
        jnp.int64(ip.min_spacing), jnp.int64(ip.max_spacing), dp,
        hit_cap=256, cand_width=128,
    )
    dev = {k: np.asarray(v) for k, v in pcd.items()}
    ovp1 = dev["overflow"][:B] | dev["overflow"][B:]
    assert ovp1.sum() < ovp0.sum(), "wide tier must recover rows"
    ok_rows = np.flatnonzero(~np.concatenate([ovp1, ovp1]))
    for f_dev, f_host in (
        ("loc", host.loc), ("off", host.off), ("dir", host.dir),
        ("valid", host.valid), ("weight", host.weight),
        ("big_indel", host.big_indel),
    ):
        d = dev[f_dev][ok_rows]
        h = f_host[ok_rows]
        if f_dev != "valid":
            d = np.where(dev["valid"][ok_rows], d, 0)
            h = np.where(host.valid[ok_rows], h, 0)
        assert (d == h).all(), f_dev
