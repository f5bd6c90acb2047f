"""finalize_batch (vectorized) must agree with finalize_read per row."""

import numpy as np
import pytest

from snap_tpu.align.post import finalize_batch, finalize_read


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
@pytest.mark.parametrize("alt_awareness", [True, False])
def test_batch_matches_per_read(seed, alt_awareness):
    rng = np.random.default_rng(seed)
    B, K = 40, 16
    # clustered candidate locations: some duplicates, some nearby, some far
    base = rng.integers(1000, 1_000_000, size=(B, K)).astype(np.int64)
    dup = rng.random((B, K)) < 0.3
    base = np.where(dup, np.roll(base, 1, axis=1), base)
    near = rng.random((B, K)) < 0.2
    base = np.where(near, np.roll(base, 2, axis=1) + rng.integers(1, 60, (B, K)), base)
    dist = rng.integers(0, 12, size=(B, K)).astype(np.int32)
    logp = -rng.random((B, K)).astype(np.float32) * 10
    ag = (100 - 5 * dist + rng.integers(0, 3, (B, K))).astype(np.int32)
    end = base + 100
    dirs = rng.integers(0, 2, size=(B, K)).astype(np.int32)
    valid = rng.random((B, K)) < 0.8
    valid[:, 0] = True
    valid[3] = False  # a notfound row
    popular = rng.integers(0, 15, size=B).astype(np.int32)
    is_alt = base > 800_000

    got = finalize_batch(
        dist, logp, ag, end, base, dirs, valid, popular,
        is_alt=is_alt, alt_awareness=alt_awareness,
    )
    assert len(got) == B
    for i in range(B):
        want, _ = finalize_read(
            dist[i], logp[i], ag[i], end[i], base[i], dirs[i], valid[i],
            int(popular[i]), is_alt=is_alt[i], alt_awareness=alt_awareness,
        )
        g = got[i][0]
        assert g.status == want.status, i
        if want.status == "notfound":
            continue
        assert g.mapq == want.mapq, (i, g, want)
        assert g.dist == want.dist, i
        assert g.end_loc == want.end_loc, i
        assert g.direction == want.direction, i
        assert g.match_prob == pytest.approx(want.match_prob), i
        assert g.prob_all == pytest.approx(want.prob_all), i
