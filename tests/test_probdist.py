"""ProbabilityDistance scorer vs a direct scalar port of the reference
DP (ProbabilityDistance.cpp:56-135)."""

import math

import numpy as np
import pytest

from snap_tpu.ops.probdist import (
    NO_PROB,
    match_mismatch_log_tables,
    probability_distance,
)


def scalar_probability_distance(
    reference, read, quality, read_len, max_start_shift, max_shift,
    gap_open_prob=0.001, gap_extension_prob=0.5, snp_prob=0.001,
):
    """Direct port of ProbabilityDistance::compute (scalar, one read)."""
    go = math.log(gap_open_prob)
    ge = math.log(gap_extension_prob)
    mlp, xlp = match_mismatch_log_tables(snp_prob)
    S = 2 * max_shift + 1
    NO, RD, RF = 0, 1, 2
    d = np.full((read_len + 1, S + 2, 3), NO_PROB)

    def D(r, s):  # shift-indexed view with sentinels
        return d[r][s + max_shift + 1]

    for s in range(-max_shift, max_shift + 1):
        if -max_start_shift <= s <= max_start_shift:
            D(0, s)[NO] = 0.0
    for r in range(1, read_len + 1):
        for s in range(-max_shift, max_shift + 1):
            col = r - 1 + s
            match = (
                0 <= col < len(reference)
                and read[r - 1] == reference[col]
                and read[r - 1] < 4
            )
            blp = (
                mlp[quality[r - 1]] if match else xlp[quality[r - 1]]
            )
            D(r, s)[NO] = max(
                D(r - 1, s)[NO], D(r - 1, s)[RF], D(r - 1, s)[RD]
            ) + blp
            D(r, s)[RD] = max(
                D(r - 1, s + 1)[NO] + go,
                D(r - 1, s + 1)[RF] + go,
                D(r - 1, s + 1)[RD] + ge,
            )
            D(r, s)[RF] = max(
                D(r, s - 1)[NO] + go,
                D(r, s - 1)[RF] + ge,
                D(r, s - 1)[RD] + go,
            )
    best = NO_PROB
    for s in range(-max_shift, max_shift + 1):
        best = max(best, *D(read_len, s))
    return best


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_probability_distance_matches_scalar(seed):
    rng = np.random.default_rng(seed)
    N, L, shift = 6, 30, 4
    W = L + shift + 2
    ref = rng.integers(0, 4, size=(N, W)).astype(np.uint8)
    # reads derived from the reference with mutations and an indel
    read = np.zeros((N, L), dtype=np.uint8)
    for i in range(N):
        r = list(ref[i, :L])
        if i % 3 == 1:  # deletion in the read
            del r[10]
            r.append(int(rng.integers(0, 4)))
        if i % 3 == 2:  # insertion in the read
            r.insert(15, int(rng.integers(0, 4)))
            r = r[:L]
        for _ in range(2):
            p = int(rng.integers(0, L))
            r[p] = int(rng.integers(0, 4))
        read[i] = r
    qual = rng.integers(ord("#"), ord("J"), size=(N, L)).astype(np.uint8)
    lens = np.full(N, L, dtype=np.int32)

    import jax.numpy as jnp

    got = np.asarray(
        probability_distance(
            jnp.asarray(ref), jnp.asarray(read), jnp.asarray(qual),
            jnp.asarray(lens), max_start_shift=2, max_shift=shift,
        )
    )
    for i in range(N):
        want = scalar_probability_distance(
            ref[i], read[i], qual[i], L, 2, shift
        )
        assert got[i] == pytest.approx(want, rel=1e-4), i
        assert got[i] > NO_PROB / 2  # a real alignment was found
