"""Paired-end extras: -fs forceSpacing, -ins adaptive insert size,
-pfc comment preservation.

Behavioral reference: PairedAligner.cpp:826-834 (forceSpacing),
PairedAligner.cpp:424-456 + 906-925 (computeSpacingDist / -ins),
preserveFASTQComments (AlignerOptions.cpp, SAM record assembly).
"""

import numpy as np

from snap_tpu.align.paired import PairEndResult, finalize_pair


def _cand(locs, dists, dirs, ag=None):
    n = len(locs)
    return {
        "dist": np.asarray(dists, dtype=np.int64),
        "log_prob": np.full(n, -1.0, dtype=np.float64),
        "ag_score": np.asarray(
            ag if ag is not None else [90] * n, dtype=np.int64
        ),
        "end_loc": np.asarray(locs, dtype=np.int64) + 100,
        "cand_loc": np.asarray(locs, dtype=np.int64),
        "direction": np.asarray(dirs, dtype=np.int64),
        "valid": np.ones(n, dtype=bool),
        "escalated": np.zeros(n, dtype=bool),
    }


def test_force_spacing_kills_unpaired():
    # two ends aligning far apart (no valid pair spacing)
    c0 = _cand([1000], [0], [0])
    c1 = _cand([900000], [0], [1])
    r0, r1, _, _ = finalize_pair(c0, c1, 0, 0, 0, 1000)
    # default: chimeric single fallback keeps both ends
    assert r0.status in ("single", "multi") and not r0.aligned_as_pair
    r0, r1, _, _ = finalize_pair(c0, c1, 0, 0, 0, 1000, force_spacing=True)
    assert r0.status == "notfound" and r1.status == "notfound"


def test_force_spacing_keeps_real_pairs():
    c0 = _cand([1000], [0], [0])
    c1 = _cand([1300], [0], [1])
    r0, r1, _, _ = finalize_pair(c0, c1, 0, 0, 0, 1000, force_spacing=True)
    assert r0.aligned_as_pair and r1.aligned_as_pair


def test_pair_secondaries_om():
    # two competing pair locations: primary at 1000/1300 (dist 0+0),
    # secondary at 5000/5300 (dist 1+1), a far-off pair at 9000/9300
    # with dist 5+5 beyond the -om window
    c0 = _cand([1000, 5000, 9000], [0, 1, 5], [0, 0, 0],
               ag=[100, 95, 60])
    c1 = _cand([1300, 5300, 9300], [0, 1, 5], [1, 1, 1],
               ag=[100, 95, 60])
    r0, r1, _, secs = finalize_pair(
        c0, c1, 0, 0, 0, 1000, max_secondary_edit=3
    )
    assert r0.aligned_as_pair and r0.cand_index == 0
    assert len(secs) == 1
    s0, s1 = secs[0]
    assert s0.cand_index == 1 and s1.cand_index == 1
    assert s0.mapq == 0 and s0.aligned_as_pair
    # -omax truncation
    _, _, _, secs0 = finalize_pair(
        c0, c1, 0, 0, 0, 1000, max_secondary_edit=30, max_secondary=1
    )
    assert len(secs0) == 1
    # om off -> no secondaries
    _, _, _, secs_off = finalize_pair(c0, c1, 0, 0, 0, 1000)
    assert secs_off == []


def test_fallback_single_end_secondaries_om():
    # no valid pair spacing -> chimeric fallback; end 0 has a second
    # candidate within om of its best
    c0 = _cand([1000, 4000], [0, 1], [0, 0], ag=[100, 95])
    c1 = _cand([900000], [0], [1])
    r0, r1, _, secs = finalize_pair(
        c0, c1, 0, 0, 0, 1000, max_secondary_edit=2
    )
    assert not r0.aligned_as_pair
    assert len(secs) == 1
    s0, s1 = secs[0]
    assert s1 is None and s0.cand_index == 1 and s0.mapq == 0


def test_update_spacing_quartiles():
    from snap_tpu.align.paired_driver import PairedEndAligner

    class Dummy(PairedEndAligner):
        def __post_init__(self):  # skip index-dependent setup
            self._spacing_samples = []

    d = Dummy.__new__(Dummy)
    d._spacing_samples = []
    d.infer_spacing_batch = 1000
    d.min_spacing, d.max_spacing = 0, 1000

    rng = np.random.default_rng(3)
    samples = rng.normal(400, 30, size=1000).astype(int).tolist()
    d._update_spacing(samples)
    # quartile-based bounds around the true distribution
    assert 1 <= d.min_spacing < 300
    assert 500 < d.max_spacing < 1200
    # stddev expansion: min(avg - 4*sd, s25 - 3*iqr) etc.
    assert d.min_spacing <= 400 - 3 * 40
    assert d.max_spacing >= 400 + 3 * 40


def test_preserve_fastq_comments(tmp_path):
    import io

    from snap_tpu.genome import Contig, Genome
    from snap_tpu.io.output import OutputWriter

    g = Genome(
        bases=np.zeros(100, dtype=np.uint8),
        contigs=[Contig(name="c", start=0, length=100)],
    )
    buf = io.BytesIO()
    w = OutputWriter(out=buf, genome=g, preserve_fastq_comments=True)
    w.write_header()
    w.write_record(
        b"r1 BC:Z:ACGT extra", 0, "c", 1, 60, "4M", b"ACGT", b"IIII", nm=0
    )
    line = [
        ln for ln in buf.getvalue().decode().splitlines()
        if not ln.startswith("@")
    ][0]
    assert line.startswith("r1\t")
    assert line.endswith("\tBC:Z:ACGT extra")

    buf2 = io.BytesIO()
    w2 = OutputWriter(out=buf2, genome=g)
    w2.write_header()
    w2.write_record(
        b"r1 BC:Z:ACGT extra", 0, "c", 1, 60, "4M", b"ACGT", b"IIII", nm=0
    )
    line2 = [
        ln for ln in buf2.getvalue().decode().splitlines()
        if not ln.startswith("@")
    ][0]
    assert "BC:Z" not in line2


def test_fallback_maxk_half_cap():
    # chimeric fallback realigns with maxKSingleEnd = maxK/2
    # (ChimericPairedEndAligner.cpp:75): dist 5 with max_k 8 -> notfound
    c0 = _cand([1000], [5], [0])
    c1 = _cand([900000], [0], [1])
    r0, r1, _, _ = finalize_pair(c0, c1, 0, 0, 0, 1000, max_k=8)
    assert r0.status == "notfound"
    assert r1.status in ("single", "multi")
    # a fit within maxK/2 survives
    r0b, _, _, _ = finalize_pair(c0, c1, 0, 0, 0, 1000, max_k=12)
    assert r0b.status in ("single", "multi")


def test_hamming_rescue_clips_bad_tail():
    from snap_tpu.align.paired import hamming_rescue

    rng = np.random.default_rng(7)
    G = 4000
    genome = rng.integers(0, 4, size=G).astype(np.uint8)
    L, seed = 100, 24
    loc = 1200
    read = genome[loc : loc + L].copy()
    # trash the last 30 bases so LV/AG cannot fit them under maxK/2,
    # but the gapless scorer can soft-clip them away
    read[70:] = (read[70:] + 1 + rng.integers(0, 3, 30).astype(np.uint8)) % 4
    quals = np.full(L, ord("I"), dtype=np.uint8)
    res = hamming_rescue(
        genome, read, quals, L, seed,
        cand_loc=np.array([loc], dtype=np.int64),
        seed_off=np.array([0], dtype=np.int32),
        direction=np.array([0], dtype=np.int32),
        cand_ok=np.array([True]),
        score_limit=13, popular=0,
    )
    assert res is not None
    assert res["start_loc"] == loc
    assert res["clip_before"] == 0
    # clips roughly the trashed tail (boundary depends on chance matches)
    assert 25 <= res["clip_after"] <= 31
    assert res["nm"] <= 2
    assert res["mapq"] > 0


def test_hamming_rescue_rejects_garbage():
    from snap_tpu.align.paired import hamming_rescue

    rng = np.random.default_rng(8)
    G = 4000
    genome = rng.integers(0, 4, size=G).astype(np.uint8)
    read = rng.integers(0, 4, size=100).astype(np.uint8)
    quals = np.full(100, ord("I"), dtype=np.uint8)
    res = hamming_rescue(
        genome, read, quals, 100, 24,
        cand_loc=np.array([1200], dtype=np.int64),
        seed_off=np.array([0], dtype=np.int32),
        direction=np.array([0], dtype=np.int32),
        cand_ok=np.array([True]),
        score_limit=13, popular=0,
    )
    # unrelated sequence: too many mismatches inside any kept extent
    assert res is None or res["nm"] > 13 or res is None
    assert res is None
