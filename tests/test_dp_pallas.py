"""Pallas fitting-DP kernel vs the jnp reference implementation."""

import numpy as np
import pytest

from snap_tpu.ops.dp import fitting_edit_distance
from snap_tpu.ops.dp_pallas import fitting_edit_distance_pallas


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_pallas_matches_jnp(seed):
    import jax.numpy as jnp

    rng = np.random.default_rng(seed)
    N, L, W = 40, 64, 160
    text = rng.integers(0, 4, size=(N, W)).astype(np.uint8)
    margin = (W - L) // 2
    pattern = np.zeros((N, L), dtype=np.uint8)
    plen = np.zeros(N, dtype=np.int32)
    for i in range(N):
        pl_ = int(rng.integers(L // 2, L + 1))
        start = margin + int(rng.integers(-3, 4))
        frag = list(text[i, start : start + pl_ + 4])
        # mutations incl. indels
        for _ in range(int(rng.integers(0, 4))):
            p = int(rng.integers(0, pl_))
            frag[p] = int(rng.integers(0, 4))
        if rng.random() < 0.4 and pl_ > 10:  # deletion in the read
            del frag[5]
        if rng.random() < 0.4 and pl_ > 10:  # insertion in the read
            frag.insert(9, int(rng.integers(0, 4)))
        pattern[i, :pl_] = frag[:pl_]
        plen[i] = pl_
    plen[3] = 0  # empty-pattern row
    logq = np.where(
        rng.random((N, L)) < 0.5, -4.0, -2.0
    ).astype(np.float32)

    a = fitting_edit_distance(
        jnp.asarray(pattern), jnp.asarray(logq), jnp.asarray(plen),
        jnp.asarray(text),
    )
    b = fitting_edit_distance_pallas(
        jnp.asarray(pattern), jnp.asarray(logq), jnp.asarray(plen),
        jnp.asarray(text), interpret=True,
    )
    da, db = np.asarray(a.dist), np.asarray(b.dist)
    live = plen > 0
    assert np.array_equal(da[live], db[live]), (da[live], db[live])
    assert np.array_equal(
        np.asarray(a.indels)[live], np.asarray(b.indels)[live]
    )
    assert np.array_equal(
        np.asarray(a.end_col)[live], np.asarray(b.end_col)[live]
    )
    np.testing.assert_allclose(
        np.asarray(a.log_prob)[live], np.asarray(b.log_prob)[live],
        rtol=1e-5,
    )
