"""Affine-gap extension kernel vs a literal numpy reference.

The numpy reference reproduces SNAP's AffineGapVectorized::computeScore
recurrences cell-by-cell (same floors, same tie rules), so the batched
kernel can be checked on random cases; plays the role of
tests/AffineGapVectorizedTest.cpp.
"""

import math

import numpy as np
import pytest

import snap_tpu  # noqa: F401
import jax.numpy as jnp

from snap_tpu.constants import BASE_ENCODE
from snap_tpu.ops.affine import EXT, OPEN, affine_extend
from snap_tpu.ops.dp import log_phred_error_table

LOGQ = log_phred_error_table()
AG_MATCH, AG_SUB = 1, 4


def ref_extend(pattern, text, score_init, end_bonus):
    """Scalar reference: returns (score, pattern_clip, text_used, valid)."""
    L, T = len(pattern), len(text)
    NEG = -(1 << 29)
    h_prev = np.array(
        [max(0, score_init - OPEN - j * EXT) for j in range(L)], dtype=np.int64
    )
    e = np.zeros(L, dtype=np.int64)
    best_g, best_g_row = -1, 0
    best_l, best_l_row, best_l_col = -1, 0, 0
    for i in range(T):
        hdiag = np.concatenate(
            [[score_init if i == 0 else max(0, score_init - OPEN - (i - 1) * EXT)],
             h_prev[:-1]]
        )
        s = np.where(
            (pattern >= 4) | (text[i] >= 4),
            -1,
            np.where(pattern == text[i], AG_MATCH, -AG_SUB),
        )
        m = np.where(hdiag > 0, hdiag + s, 0)
        # F within row
        f = np.full(L, NEG, dtype=np.int64)
        for j in range(1, L):
            f[j] = max(f[j - 1] - EXT, max(m[j - 1] - OPEN, 0))
        h = np.maximum(np.maximum(m, e), f)
        g = h[L - 1]
        if g >= best_g:
            best_g, best_g_row = g, i
        rowmax = h.max()
        if rowmax > best_l:
            best_l = rowmax
            best_l_row = i
            best_l_col = int(np.max(np.where(h == rowmax)[0]))
        e = np.maximum(np.maximum(e - EXT, m - OPEN), 0)
        h_prev = h
    if best_l != best_g and best_l >= best_g + end_bonus:
        return best_l, L - 1 - best_l_col, best_l_row + 1, best_l > score_init
    return best_g, 0, best_g_row + 1, best_g > score_init


def enc(s):
    return BASE_ENCODE[np.frombuffer(s.encode(), dtype=np.uint8)]


def run_kernel(patterns, texts, score_init, end_bonus, qual_byte="I"):
    N = len(patterns)
    L = max(len(p) for p in patterns)
    T = max(len(t) for t in texts)
    pat = np.full((N, L), 4, np.uint8)
    txt = np.full((N, T), 5, np.uint8)
    plen = np.zeros(N, np.int32)
    tlen = np.zeros(N, np.int32)
    for i, (p, t) in enumerate(zip(patterns, texts)):
        pat[i, : len(p)] = p
        txt[i, : len(t)] = t
        plen[i] = len(p)
        tlen[i] = len(t)
    logq = np.full((N, L), LOGQ[ord(qual_byte)], np.float32)
    return affine_extend(
        jnp.asarray(pat),
        jnp.asarray(logq),
        jnp.asarray(plen),
        jnp.asarray(txt),
        jnp.asarray(tlen),
        jnp.full((N,), score_init, jnp.int32),
        jnp.full((N,), end_bonus, jnp.int32),
    )


def test_perfect_tail():
    p = enc("ACGTACGTGG")
    t = enc("ACGTACGTGGTTTT")
    r = run_kernel([p], [t], score_init=100, end_bonus=7)
    assert int(r.score[0]) == 110
    assert int(r.edits[0]) == 0
    assert int(r.pattern_clip[0]) == 0
    assert bool(r.valid[0])
    assert float(r.log_prob[0]) == pytest.approx(10 * math.log(1 - 0.001), rel=1e-5)


def test_mismatch_vs_clip():
    # 3 mismatches at the very end: clipping 3 bases loses 3 matches,
    # keeping them costs 3*4. local = 100+7, global = 100+10-12=98;
    # score-wise clip iff 107 >= 98 + endBonus(7)=105 -> clip. BUT the
    # reference refuses to soft-clip high-quality bases
    # (AffineGapVectorized.h:692-720): with phred-40 ('I') tails the
    # global alignment stands; with junk-quality ('#') tails the clip
    # is taken.
    p = enc("ACGTACGTAC")
    t = enc("ACGTACGTGGTTTT")
    t[7:] = (t[7:] + 1) % 4  # break the last 3
    r = run_kernel([p], [t], score_init=100, end_bonus=7)
    assert int(r.pattern_clip[0]) == 0
    assert int(r.edits[0]) == 3
    r = run_kernel([p], [t], score_init=100, end_bonus=7, qual_byte="#")
    assert int(r.pattern_clip[0]) == 3
    assert int(r.edits[0]) == 0


def test_deletion_run():
    # pattern = text with 2 bases deleted (text has 2 extra)
    t = enc("ACGTACGTACGTACGTACGT")
    p = np.concatenate([t[:8], t[10:18]])
    r = run_kernel([p], [t], score_init=100, end_bonus=7)
    assert int(r.edits[0]) == 2
    # 16 matches - (7 + 1) gap = +8
    assert int(r.score[0]) == 108
    lp = float(r.log_prob[0])
    expect = math.log(0.001) + math.log(0.5) + 16 * math.log(0.999)
    assert lp == pytest.approx(expect, rel=1e-5)


def test_random_vs_reference():
    rng = np.random.default_rng(11)
    pats, txts = [], []
    for i in range(24):
        L = int(rng.integers(5, 40))
        t = rng.integers(0, 4, size=L + 20).astype(np.uint8)
        if i % 3 == 0:
            p = t[:L].copy()
            nmut = int(rng.integers(0, 4))
            for _ in range(nmut):
                p[rng.integers(0, L)] = rng.integers(0, 4)
        else:
            p = rng.integers(0, 4, size=L).astype(np.uint8)
        pats.append(p)
        txts.append(t)
    # junk-quality patterns keep the clip rule permissive so the scalar
    # model (which mirrors the DP recurrences, not the high-quality
    # no-clip refinement) stays an exact reference
    r = run_kernel(pats, txts, score_init=60, end_bonus=7, qual_byte="#")
    for i, (p, t) in enumerate(zip(pats, txts)):
        score, clip, used, valid = ref_extend(p, t, 60, 7)
        assert int(r.score[i]) == score, f"case {i}"
        assert int(r.pattern_clip[i]) == clip, f"case {i} clip"
        assert int(r.text_used[i]) == used, f"case {i} used"
        assert bool(r.valid[i]) == valid, f"case {i} valid"


def test_empty_pattern():
    # an empty extension (seed at the very end of the read) alongside a
    # real one — plen=0 rows must come back neutral
    r = run_kernel(
        [np.zeros(0, np.uint8), enc("ACGT")],
        [enc("ACGT"), enc("ACGTTT")],
        100,
        7,
    )
    assert bool(r.valid[0])
    assert int(r.edits[0]) == 0
    assert int(r.score[0]) == 100
    assert int(r.pattern_clip[0]) == 0
    assert int(r.score[1]) == 104
