"""Adaptive two-phase seeding must match the full-depth wavefront.

SNAP stops its seed loop once no unseen location can beat the score
limit (BaseAligner.cpp:1028, bound from :993-1012). The device replay
runs a shallow phase A (first unwrapped seed pass), then compacts the
reads SNAP would have kept seeding into a narrow full-depth phase B.
Reads resolved in phase A stop with a bound proving no deeper seed can
change the answer, so the merged output must EQUAL the full-depth run;
unresolved reads beyond the phase-B capacity must surface as truncated
(the host wide-redo path re-aligns those).
"""

import numpy as np
import pytest

from snap_tpu.align.pipeline import (
    AlignParams,
    HostWinners,
    align_winners_device,
)
from snap_tpu.constants import PAD
from snap_tpu.genome import Contig, Genome
from snap_tpu.index.index import GenomeIndex
from snap_tpu.io.fastq import ReadBatch


@pytest.fixture(scope="module")
def rand_index():
    rng = np.random.default_rng(7)
    glen = 60_000
    codes = rng.integers(0, 4, size=glen).astype(np.uint8)
    bases = np.full(glen + 2000, PAD, dtype=np.uint8)
    bases[1000 : 1000 + glen] = codes
    genome = Genome(
        bases=bases, contigs=[Contig(name="chr1", start=1000, length=glen)]
    )
    return GenomeIndex.build(genome, seed_len=20), codes


def _sample_reads(codes, rng, n, L=100, err=0.02, indel_every=4):
    seqs = np.empty((n, L), np.uint8)
    for i in range(n):
        s = int(rng.integers(0, codes.size - L - 10))
        r = codes[s : s + L + 8].copy()
        if i % indel_every == 1:  # deletion
            p = int(rng.integers(20, L - 20))
            r = np.delete(r, slice(p, p + int(rng.integers(1, 4))))
        elif i % indel_every == 2:  # insertion
            p = int(rng.integers(20, L - 20))
            r = np.insert(r, p, rng.integers(0, 4, int(rng.integers(1, 4))))
        r = r[:L]
        mut = rng.random(L) < err
        seqs[i] = np.where(mut, rng.integers(0, 4, L), r)
    return seqs


def _align(idx, seqs, params, **kw):
    import jax
    import jax.numpy as jnp

    B, L = seqs.shape
    ML = 128
    bases = np.full((B, ML), 4, np.uint8)
    bases[:, :L] = seqs
    quals = np.zeros((B, ML), np.uint8)
    quals[:, :L] = ord("I")
    win, _ = align_winners_device(
        idx.device,
        jnp.asarray(bases),
        jnp.asarray(quals),
        jnp.asarray(np.full(B, L, np.int32)),
        jnp.int64(idx.genome_meta.first_alt_start()),
        params,
        **kw,
    )
    return HostWinners(np.asarray(jax.device_get(win)))


def test_adaptive_matches_full_depth(rand_index):
    idx, codes = rand_index
    rng = np.random.default_rng(11)
    seqs = _sample_reads(codes, rng, 96)
    params = AlignParams(
        seed_len=20, max_probe=idx.max_probe, num_seeds=25,
        hit_cap=8, max_cand=16,
    )
    full = _align(idx, seqs, params, adaptive=False)
    adap = _align(idx, seqs, params, adaptive=True)
    for name in (
        "found", "direction", "dist", "mapq", "end_loc", "body_loc",
        "clip_before", "clip_after", "indels", "truncated",
    ):
        np.testing.assert_array_equal(
            getattr(full, name), getattr(adap, name), err_msg=name
        )


def test_adaptive_phase_b_overflow_flags_truncated(rand_index):
    """With a phase-B capacity of 1 row, nearly every read that SNAP
    would keep seeding must come back truncated = True (honesty flag:
    the driver re-runs those via the host wide-redo path), and the
    reads that phase A resolved must still match full depth."""
    idx, codes = rand_index
    rng = np.random.default_rng(13)
    # high error rate ensures many reads stay unresolved after phase A
    seqs = _sample_reads(codes, rng, 64, err=0.08)
    params = AlignParams(
        seed_len=20, max_probe=idx.max_probe, num_seeds=25,
        hit_cap=8, max_cand=16,
    )
    full = _align(idx, seqs, params, adaptive=False)
    tiny = _align(idx, seqs, params, adaptive=True, phase_b_rows=1)
    wide = _align(idx, seqs, params, adaptive=True)
    n_unres = int(
        (wide.truncated | ~tiny.truncated & ~full.truncated).size
    )
    assert n_unres  # sanity: the batch is non-empty
    # every read is either truncated (host redo takes over) or equal to
    # the full-depth answer
    ok = tiny.truncated | (
        (tiny.found == full.found)
        & (tiny.body_loc == full.body_loc)
        & (tiny.mapq == full.mapq)
        & (tiny.dist == full.dist)
    )
    assert ok.all(), np.flatnonzero(~ok)
    # and the tiny capacity really did overflow somewhere
    assert tiny.truncated.sum() > full.truncated.sum()


def test_phase_c_wide_tile_recovers_truncated_rows():
    """Phase C (hit_cap=128/K=64 on truncated rows) must resolve most
    repeat-truncated reads on device and agree exactly with a
    non-adaptive run at the same wide geometry."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from snap_tpu.align.pipeline import (
        AlignParams, HostWinners, align_winners_device,
    )
    from snap_tpu.constants import PAD
    from snap_tpu.genome import Contig, Genome
    from snap_tpu.index.build import build_index
    from snap_tpu.index.index import make_device_index

    rng = np.random.default_rng(29)
    glen = 600_000
    codes = rng.integers(0, 4, size=glen).astype(np.uint8)
    # plant a 300bp unit 60x: hits overflow the phase-B caps (32) but
    # stay under maxHits=300, so only phase C resolves them on device
    unit = codes[1000:1300].copy()
    for k in range(60):
        p = 5000 + 9500 * k
        codes[p : p + 300] = unit
    bases_g = np.full(glen + 2000, PAD, np.uint8)
    bases_g[1000 : 1000 + glen] = codes
    genome = Genome(
        bases=bases_g, contigs=[Contig(name="c1", start=1000, length=glen)]
    )
    idx = build_index(genome, seed_len=20)
    didx = make_device_index(idx, bases_g)
    params = AlignParams(
        seed_len=20, max_probe=idx["max_probe"], num_seeds=25,
        hit_cap=8, max_cand=16,
    )

    B, L = 256, 100
    # half the reads overlap planted repeat copies
    starts = np.where(
        np.arange(B) % 2 == 0,
        5000 + 9500 * rng.integers(0, 60, B) + rng.integers(0, 250, B),
        rng.integers(0, glen - L - 1, B),
    )
    reads = codes[starts[:, None] + np.arange(L)[None, :]].copy()
    mut = rng.random(reads.shape) < 0.01
    reads = np.where(mut, rng.integers(0, 4, reads.shape), reads).astype(
        np.uint8
    )
    b = jnp.asarray(reads)
    q = jnp.asarray(np.full((B, L), ord("I"), np.uint8))
    l = jnp.asarray(np.full(B, L, np.int32))
    fas = jnp.int64(bases_g.shape[0])

    base, _ = align_winners_device(didx, b, q, l, fas, params, adaptive=True)
    wb = HostWinners(jax.device_get(base))
    assert wb.truncated.sum() > 10, "repeat reads must truncate at A/B"

    wc_packed, _ = align_winners_device(
        didx, b, q, l, fas, params, adaptive=True, phase_c=True
    )
    wc = HostWinners(jax.device_get(wc_packed))
    assert wc.truncated.sum() < wb.truncated.sum() * 0.4, (
        int(wc.truncated.sum()), int(wb.truncated.sum())
    )

    # wide non-adaptive reference at the phase-C geometry
    wide_params = dataclasses.replace(params, hit_cap=128, max_cand=64)
    ref_packed, _ = align_winners_device(
        didx, b, q, l, fas, wide_params, adaptive=False, dp_rows=4096
    )
    wr = HostWinners(jax.device_get(ref_packed))
    fixed = np.flatnonzero(wb.truncated & ~wc.truncated & ~wc.fallback
                           & ~wr.fallback)
    assert fixed.size > 0
    for f in ("found", "direction", "dist", "mapq", "end_loc"):
        np.testing.assert_array_equal(
            np.asarray(getattr(wc, f))[fixed],
            np.asarray(getattr(wr, f))[fixed], err_msg=f,
        )
