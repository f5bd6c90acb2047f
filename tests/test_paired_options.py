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
    r0, r1, _ = finalize_pair(c0, c1, 0, 0, 0, 1000)
    # default: chimeric single fallback keeps both ends
    assert r0.status in ("single", "multi") and not r0.aligned_as_pair
    r0, r1, _ = finalize_pair(c0, c1, 0, 0, 0, 1000, force_spacing=True)
    assert r0.status == "notfound" and r1.status == "notfound"


def test_force_spacing_keeps_real_pairs():
    c0 = _cand([1000], [0], [0])
    c1 = _cand([1300], [0], [1])
    r0, r1, _ = finalize_pair(c0, c1, 0, 0, 0, 1000, force_spacing=True)
    assert r0.aligned_as_pair and r1.aligned_as_pair


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
