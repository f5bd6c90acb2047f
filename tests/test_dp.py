"""Scoring-kernel correctness vs brute-force references.

Plays the role of the reference's tests/LandauVishkinTest.cpp: edit
distances on constructed strings, plus the match-probability model
(mismatch phred products, indel-run probabilities, perfect-match prior
— LandauVishkin.cpp:727-760 semantics).
"""

import math

import numpy as np
import pytest

import snap_tpu  # noqa: F401  (enables x64)
import jax.numpy as jnp

from snap_tpu.constants import (
    BASE_ENCODE,
    GAP_EXTEND_PROB,
    GAP_OPEN_PROB,
    SNP_PROB,
    phred_to_probability_table,
)
from snap_tpu.ops.dp import fitting_edit_distance, log_phred_error_table

LOGQ_TABLE = log_phred_error_table()


def enc(s: str) -> np.ndarray:
    return BASE_ENCODE[np.frombuffer(s.encode(), dtype=np.uint8)]


def brute_fitting_distance(pattern: np.ndarray, text: np.ndarray) -> int:
    """Plain O(L*W) fitting edit distance (free text start/end)."""
    L, W = len(pattern), len(text)
    prev = np.zeros(W + 1, dtype=np.int32)
    for i in range(1, L + 1):
        cur = np.empty(W + 1, dtype=np.int32)
        cur[0] = i
        for j in range(1, W + 1):
            sub = prev[j - 1] + (pattern[i - 1] != text[j - 1])
            cur[j] = min(sub, prev[j] + 1, cur[j - 1] + 1)
        prev = cur
    return int(prev.min())


def run_kernel(pattern_s: str, text_s: str, quals: bytes | None = None):
    p = enc(pattern_s)
    t = enc(text_s)
    L, W = len(p), len(t)
    if quals is None:
        quals = b"I" * L  # phred 40
    pat = jnp.asarray(p[None, :])
    logq = jnp.asarray(LOGQ_TABLE[np.frombuffer(quals, dtype=np.uint8)][None, :])
    plen = jnp.asarray([L], dtype=jnp.int32)
    text = jnp.asarray(t[None, :])
    r = fitting_edit_distance(pat, logq, plen, text)
    return (
        int(r.dist[0]),
        float(r.log_prob[0]),
        int(r.end_col[0]),
        int(r.indels[0]),
    )


def expected_logprob(plen, n_mismatch_quals, indel_runs, dist):
    lp = 0.0
    for q in n_mismatch_quals:
        lp += math.log(phred_to_probability_table()[q])
    for r in indel_runs:
        lp += math.log(GAP_OPEN_PROB) + (r - 1) * math.log(GAP_EXTEND_PROB)
    lp += (plen - dist) * math.log(1 - SNP_PROB)
    return lp


def test_exact_match():
    d, lp, end, ind = run_kernel("ACGTACGTACGT", "ACGTACGTACGT")
    assert d == 0 and ind == 0
    assert end == 12
    assert lp == pytest.approx(12 * math.log(1 - SNP_PROB), rel=1e-5)


def test_exact_match_in_window():
    text = "TTTTT" + "ACGTACGTACGT" + "GGGGG"
    d, lp, end, ind = run_kernel("ACGTACGTACGT", text)
    assert d == 0
    assert end == 17  # 5 skipped + 12 consumed


def test_single_mismatch():
    d, lp, end, ind = run_kernel(
        "ACGTACGTACGT", "ACGTACCTACGT", quals=b"IIIIIIJIIIII"
    )
    assert d == 1 and ind == 0
    assert lp == pytest.approx(
        expected_logprob(12, [ord("J")], [], 1), rel=1e-5
    )


def test_single_insertion():
    # pattern has an extra base vs text
    d, lp, end, ind = run_kernel("ACGTAACGT", "TTACGTACGTTT")
    assert d == 1 and ind == 1
    assert lp == pytest.approx(expected_logprob(9, [], [1], 1), rel=1e-5)


def test_deletion_run():
    # text has 2 extra bases inside the pattern span
    d, lp, end, ind = run_kernel("ACGTACGT", "CCACGTGGACGTCC")
    assert d == 2 and ind == 2
    assert lp == pytest.approx(expected_logprob(8, [], [2], 2), rel=1e-5)


def test_n_matches_n():
    # read N vs genome N is a match (codes equal); pad (code 5) never matches
    d, _, _, _ = run_kernel("ACGNACGT", "ACGNACGT")
    assert d == 0
    d2, _, _, _ = run_kernel("ACGNACGT", "ACGnACGT")  # 'n' = pad
    assert d2 == 1


def test_random_vs_brute_force():
    rng = np.random.default_rng(42)
    N, L, W = 12, 40, 64
    pats = rng.integers(0, 4, size=(N, L)).astype(np.uint8)
    texts = rng.integers(0, 4, size=(N, W)).astype(np.uint8)
    # make half of them near-copies with edits
    for i in range(0, N, 2):
        start = rng.integers(0, W - L - 3)
        texts[i, start : start + L] = pats[i]
        for _ in range(int(rng.integers(0, 4))):
            texts[i, rng.integers(start, start + L)] = rng.integers(0, 4)
    logq = np.broadcast_to(LOGQ_TABLE[ord("I")], (N, L)).astype(np.float32)
    r = fitting_edit_distance(
        jnp.asarray(pats),
        jnp.asarray(logq),
        jnp.full((N,), L, dtype=jnp.int32),
        jnp.asarray(texts),
    )
    for i in range(N):
        expect = brute_fitting_distance(pats[i], texts[i])
        assert int(r.dist[i]) == expect, f"case {i}"


def test_variable_plen():
    # two candidates in one batch with different effective lengths
    p = np.zeros((2, 10), dtype=np.uint8)
    p[0, :10] = enc("ACGTACGTAC")
    p[1, :6] = enc("ACGTAC")
    p[1, 6:] = 4
    t = np.zeros((2, 16), dtype=np.uint8)
    t[0, :10] = enc("ACGTACGTAC")
    t[1, :6] = enc("ACGTAC")
    t[:, 10:] = 5
    t[1, 6:] = 5
    logq = np.full((2, 10), LOGQ_TABLE[ord("I")], dtype=np.float32)
    r = fitting_edit_distance(
        jnp.asarray(p), jnp.asarray(logq),
        jnp.asarray([10, 6], dtype=jnp.int32), jnp.asarray(t),
    )
    assert int(r.dist[0]) == 0 and int(r.dist[1]) == 0
    assert int(r.end_col[0]) == 10 and int(r.end_col[1]) == 6
