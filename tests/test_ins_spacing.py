"""-ins insert-size inference vs the reference's computeSpacingDist
(PairedAligner.cpp:424-459, BWA-MEM-style): quartiles + OUTLIER_BOUND=2
inlier window, then min/max from MAPPING_BOUND=3 quartile bounds
widened by avg +/- MAX_STDDEV=4 stddev, floor 1.
"""

import math

import numpy as np

from snap_tpu.align.paired_driver import PairedEndAligner


def _reference_compute(spacing_sorted):
    """Direct transliteration of computeSpacingDist for the test's
    expected values (independent of the driver's numpy version)."""
    n = len(spacing_sorted)
    s25 = spacing_sorted[int(0.25 * n)]
    s75 = spacing_sorted[int(0.75 * n)]
    min0 = max(s25 - 2 * (s75 - s25), 1)
    max0 = s75 + 2 * (s75 - s25)
    inliers = [x for x in spacing_sorted if min0 <= x <= max0]
    avg = sum(inliers) / len(inliers)
    stddev = math.sqrt(
        sum((x - avg) ** 2 for x in inliers) / len(inliers)
    )
    mn = int(s25 - 3 * (s75 - s25))
    mx = int(s75 + 3 * (s75 - s25))
    mn = min(int(avg - 4 * stddev), mn)
    mx = max(int(avg + 4 * stddev), mx)
    return max(mn, 1), mx


def _driver(batch):
    a = PairedEndAligner.__new__(PairedEndAligner)
    a.infer_spacing_batch = batch
    a._spacing_samples = []
    a.min_spacing = 50
    a.max_spacing = 1000
    return a


def test_matches_reference_math():
    rng = np.random.default_rng(9)
    n = 1024
    samples = np.concatenate([
        rng.normal(320, 40, size=n - 32).astype(np.int64),
        rng.integers(1, 5000, size=32),  # outliers
    ]).tolist()
    a = _driver(n)
    a._update_spacing(samples[: n + 5])
    exp_min, exp_max = _reference_compute(sorted(samples[:n]))
    assert (a.min_spacing, a.max_spacing) == (exp_min, exp_max)


def test_no_update_below_batch():
    a = _driver(256)
    a._update_spacing([300] * 100)
    assert (a.min_spacing, a.max_spacing) == (50, 1000)


def test_floor_at_one():
    a = _driver(64)
    a._update_spacing([1] * 32 + [9] * 32)  # s25-3*iqr goes negative
    assert a.min_spacing == 1
