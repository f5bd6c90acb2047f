"""-gm/-gs/-go/-ge penalty plumbing through the affine kernels."""

import numpy as np

import snap_tpu  # noqa: F401


def _case():
    rng = np.random.default_rng(5)
    N, L, T = 8, 60, 80
    text = rng.integers(0, 4, size=(N, T)).astype(np.uint8)
    pattern = text[:, :L].copy()
    for i in range(N):
        for _ in range(3):
            pattern[i, rng.integers(0, L)] = rng.integers(0, 4)
    logq = np.full((N, L), -4.0, np.float32)
    plen = np.full(N, L, np.int32)
    tlen = np.full(N, T, np.int32)
    si = plen.astype(np.int32)
    eb = np.full(N, 7, np.int32)
    return pattern, logq, plen, text, tlen, si, eb


def test_affine_extend_penalties_change_scores():
    import jax.numpy as jnp

    from snap_tpu.ops.affine import affine_extend

    args = tuple(jnp.asarray(a) for a in _case())
    base = affine_extend(*args)
    harsher = affine_extend(*args, sub=8)
    a, b = np.asarray(base.score), np.asarray(harsher.score)
    assert (b <= a).all() and (b < a).any()


def test_affine_pallas_matches_jnp_with_custom_penalties():
    import jax.numpy as jnp

    from snap_tpu.ops.affine import affine_extend
    from snap_tpu.ops.affine_pallas import affine_extend_pallas

    args = tuple(jnp.asarray(a) for a in _case())
    kw = dict(match=2, sub=6, gap_open=5, gap_extend=2)
    a = affine_extend(*args, **kw)
    b = affine_extend_pallas(*args, interpret=True, **kw)
    for f in ("score", "edits", "pattern_clip", "text_used"):
        assert np.array_equal(
            np.asarray(getattr(a, f)), np.asarray(getattr(b, f))
        ), f


def test_max_k_same_derived_from_penalties():
    from snap_tpu.align.pipeline import AlignParams

    assert AlignParams().max_k_same == 2  # 6 // (4 - 1)
    assert AlignParams(ag_open=12, ag_sub=5, ag_extend=1).max_k_same == 3
