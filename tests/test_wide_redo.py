"""The maxHits=300 wide-redo pass (single-end hit-coverage honesty).

The device wavefront gathers hit_cap (16) hits per (seed, direction);
reads whose seeds have 17..300 hits must be re-run over the full hit
lists (BaseAligner.cpp:574-579) or pAll/MAPQ are wrong and low-location
loci are unfindable (descending lists keep the highest locations).
"""

import numpy as np
import pytest

from snap_tpu.align.pipeline import AlignParams
from snap_tpu.align.single import SingleEndAligner
from snap_tpu.constants import PAD
from snap_tpu.genome import Contig, Genome
from snap_tpu.index.index import GenomeIndex
from snap_tpu.io.fastq import ReadBatch


@pytest.fixture(scope="module")
def repeat30_index():
    """30-copy repeat (17..300 hits per seed: above the 16 gather cap,
    below the popular skip), each copy uniquely marked inside the first
    100bp. The TRUE locus for test reads is the FIRST copy — the lowest
    genome location, exactly what a descending-order truncated gather
    drops."""
    rng = np.random.default_rng(23)
    rep = rng.integers(0, 4, size=300).astype(np.uint8)
    parts = [rng.integers(0, 4, size=2000).astype(np.uint8)]
    mk = [40, 55, 70]  # copy id base-4 at fixed in-window positions
    for i in range(30):
        c = rep.copy()
        for d, p in enumerate(mk):
            c[p] = (i >> (2 * d)) & 3
        parts.append(c)
    parts.append(rng.integers(0, 4, size=2000).astype(np.uint8))
    codes = np.concatenate(parts)
    glen = codes.shape[0]
    bases = np.full(glen + 2000, PAD, dtype=np.uint8)
    bases[1000 : 1000 + glen] = codes
    genome = Genome(
        bases=bases, contigs=[Contig(name="chr1", start=1000, length=glen)]
    )
    return GenomeIndex.build(genome, seed_len=24), codes


def _mk_batch(seqs, L=100, ML=128):
    B = len(seqs)
    bases = np.full((B, ML), 4, dtype=np.uint8)
    quals = np.zeros((B, ML), dtype=np.uint8)
    bases[:, :L] = np.stack(seqs)
    quals[:, :L] = ord("I")
    return ReadBatch(
        ids=[f"r{i}".encode() for i in range(B)],
        bases=bases, quals=quals, lengths=np.full(B, L, np.int32),
    )


def test_wide_candidates_cover_low_locations(repeat30_index):
    from snap_tpu.align.intersect import wide_single_candidates

    idx, codes = repeat30_index
    L = 100
    start = 2000 + 0 * 300 + 10  # first copy (lowest location)
    read = codes[start : start + L]
    wc = wide_single_candidates(
        idx.host, read[None, :].astype(np.uint8),
        np.array([L], np.int32), num_lookups=13, seed_len=24,
        max_hits=300,
    )
    locs = wc.loc[0][wc.valid[0]]
    # every copy's locus present (30 candidates), including the lowest
    assert locs.size >= 30
    assert np.any(np.abs(locs - (1000 + start)) <= 2)


def test_truncated_read_realigned_to_true_locus(repeat30_index):
    idx, codes = repeat30_index
    L = 100
    true_start = 2000 + 10  # inside copy 0: markers identify it uniquely
    read = codes[true_start : true_start + L]
    batch = _mk_batch([read])
    params = AlignParams(seed_len=24, max_probe=idx.max_probe)
    aligner = SingleEndAligner(idx, params, batch_size=8, max_read_len=128)
    res = aligner.align_batch(batch)[0]
    assert res["status"] in ("single", "multi")
    assert abs(int(res["start_loc"]) - (1000 + true_start)) <= 2, res
    assert res["nm"] == 0


def test_ambiguous_repeat_read_gets_low_mapq(repeat30_index):
    """A read NOT covering any copy marker matches all 30 copies
    equally: with full hit coverage pAll >> pBest, so MAPQ ~ 0. The
    truncated 16-hit view would overstate uniqueness."""
    idx, codes = repeat30_index
    L = 100
    start = 2000 + 150  # positions 150..250 of copy 0: no markers
    read = codes[start : start + L]
    batch = _mk_batch([read])
    params = AlignParams(seed_len=24, max_probe=idx.max_probe)
    aligner = SingleEndAligner(idx, params, batch_size=8, max_read_len=128)
    res = aligner.align_batch(batch)[0]
    assert res["status"] == "multi"
    assert res["mapq"] <= 3, res
