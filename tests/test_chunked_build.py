"""hg38-scale chunked index build (-sm analogue, GenomeIndex.cpp:630-753).

The chunked builder spills (key, loc, orient) triples into per-bank
partition files and assembles each bank independently under a memory
budget; lookups must be indistinguishable from the in-memory build.
"""

import numpy as np
import pytest

from snap_tpu.constants import BASE_ENCODE, PAD
from snap_tpu.genome import Contig, Genome
from snap_tpu.index.build import (
    build_index,
    build_index_chunked,
    load_index_arrays,
    pack_seeds,
    pack_seeds_range,
    save_index,
)
from snap_tpu.index.host_lookup import HostIndex


@pytest.mark.parametrize("seed_len", [8, 20, 22, 24, 25, 32])
def test_pack_seeds_range_matches_gather(seed_len):
    rng = np.random.default_rng(seed_len)
    bases = rng.integers(0, 4, size=5000).astype(np.uint8)
    bases[rng.integers(0, 5000, size=40)] = PAD  # scattered Ns
    lo, hi = 7, 5000 - seed_len + 1
    pos = np.arange(lo, hi, dtype=np.int64)
    f1, r1, v1 = pack_seeds(bases, pos, seed_len)
    f2, r2, v2 = pack_seeds_range(bases, lo, hi, seed_len)
    assert np.array_equal(v1, v2)
    assert np.array_equal(f1[v1], f2[v2])
    assert np.array_equal(r1[v1], r2[v2])


def _mk_genome(n=200_000, seed=3):
    rng = np.random.default_rng(seed)
    codes = rng.integers(0, 4, size=n).astype(np.uint8)
    bases = np.full(n + 2000, PAD, dtype=np.uint8)
    bases[1000 : 1000 + n] = codes
    return Genome(
        bases=bases, contigs=[Contig(name="chr1", start=1000, length=n)]
    ), codes


def _lookup_map(arrays, queries):
    hx = HostIndex(arrays, arrays["seed_len"], arrays["max_probe"])
    found, start, n0, n1 = hx.probe(queries)
    out = []
    for i in range(len(queries)):
        if not found[i]:
            out.append(None)
            continue
        s = int(start[i])
        out.append(
            (
                sorted(hx.hits[s : s + int(n0[i])].tolist()),
                sorted(
                    hx.hits[
                        s + int(n0[i]) : s + int(n0[i]) + int(n1[i])
                    ].tolist()
                ),
            )
        )
    return out


def test_chunked_matches_in_memory(tmp_path):
    genome, codes = _mk_genome()
    mem = build_index(genome, seed_len=20)
    # ~0.0002 GB budget => forces many banks on a 200kb genome
    chunked = build_index_chunked(
        genome, seed_len=20, memory_budget_gb=0.0002,
        tmpdir=str(tmp_path),
    )
    assert chunked["table"].shape[0] > 1  # actually banked

    bases = np.asarray(genome.bases)
    rng = np.random.default_rng(0)
    pos = rng.integers(1000, 1000 + len(codes) - 20, size=300).astype(
        np.int64
    )
    fwd, rc, valid = pack_seeds(bases, pos, 20)
    q = np.minimum(fwd, rc)[valid]
    assert _lookup_map(mem, q) == _lookup_map(chunked, q)


def test_chunked_save_load_align(tmp_path):
    genome, codes = _mk_genome(n=60_000, seed=9)
    arrays = build_index_chunked(
        genome, seed_len=20, memory_budget_gb=0.0001,
        tmpdir=str(tmp_path / "work"),
    )
    outdir = tmp_path / "idx"
    save_index(arrays, genome, str(outdir))
    # chunked save moves raw .npy files (no npz)
    assert (outdir / "hits.npy").exists()
    loaded = load_index_arrays(str(outdir))
    assert loaded["table"].shape == arrays["table"].shape

    from snap_tpu.align.pipeline import AlignParams
    from snap_tpu.align.single import SingleEndAligner
    from snap_tpu.index.index import GenomeIndex
    from snap_tpu.io.fastq import ReadBatch

    idx = GenomeIndex.load(str(outdir))
    L = 100
    starts = [5000, 21000, 40000]
    bases = np.full((3, 128), 4, dtype=np.uint8)
    quals = np.zeros((3, 128), dtype=np.uint8)
    for i, s in enumerate(starts):
        bases[i, :L] = codes[s : s + L]
        quals[i, :L] = ord("I")
    batch = ReadBatch(
        ids=[b"a", b"b", b"c"], bases=bases, quals=quals,
        lengths=np.full(3, L, np.int32),
    )
    aligner = SingleEndAligner(
        idx, AlignParams(seed_len=20, max_probe=idx.max_probe),
        batch_size=4, max_read_len=128,
    )
    res = aligner.align_batch(batch)
    for i, s in enumerate(starts):
        assert res[i]["status"] == "single"
        assert int(res[i]["start_loc"]) == 1000 + s
