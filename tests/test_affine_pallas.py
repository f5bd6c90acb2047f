"""Pallas affine-extension kernel vs the jnp reference implementation."""

import numpy as np
import pytest

from snap_tpu.ops.affine import affine_extend
from snap_tpu.ops.affine_pallas import affine_extend_pallas


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_affine_pallas_matches_jnp(seed):
    import jax.numpy as jnp

    rng = np.random.default_rng(seed)
    N, L, T = 48, 100, 128
    text = rng.integers(0, 4, size=(N, T)).astype(np.uint8)
    pattern = np.zeros((N, L), dtype=np.uint8)
    plen = np.zeros(N, dtype=np.int32)
    for i in range(N):
        pl_ = int(rng.integers(L // 2, L + 1))
        frag = list(text[i, : pl_ + 4])
        for _ in range(int(rng.integers(0, 5))):
            p = int(rng.integers(0, pl_))
            frag[p] = int(rng.integers(0, 4))
        if rng.random() < 0.4 and pl_ > 10:
            del frag[5]
        if rng.random() < 0.4 and pl_ > 10:
            frag.insert(9, int(rng.integers(0, 4)))
        pattern[i, :pl_] = frag[:pl_]
        plen[i] = pl_
    plen[3] = 0  # empty row
    text[5, 60:] = 4  # N-heavy text
    logq = np.where(rng.random((N, L)) < 0.5, -4.0, -2.0).astype(np.float32)
    tlen = np.minimum(plen + 20, T).astype(np.int32)
    score_init = plen.astype(np.int32)
    end_bonus = np.where(rng.random(N) < 0.5, 5, 10).astype(np.int32)

    args = (
        jnp.asarray(pattern), jnp.asarray(logq), jnp.asarray(plen),
        jnp.asarray(text), jnp.asarray(tlen), jnp.asarray(score_init),
        jnp.asarray(end_bonus),
    )
    a = affine_extend(*args)
    b = affine_extend_pallas(*args, interpret=True)
    live = plen > 0
    for field in ("score", "valid", "edits", "pattern_clip", "text_used"):
        va, vb = np.asarray(getattr(a, field)), np.asarray(getattr(b, field))
        assert np.array_equal(va[live], vb[live]), (field, va[live], vb[live])
    np.testing.assert_allclose(
        np.asarray(a.log_prob)[live], np.asarray(b.log_prob)[live],
        rtol=1e-5,
    )
