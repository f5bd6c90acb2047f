"""Fused gapless-prescreen kernel vs the unfused jnp computation."""

import numpy as np
import pytest

from snap_tpu.ops.gapless_pallas import gapless_prescreen_pallas


@pytest.mark.parametrize("seed", [0, 1])
def test_gapless_kernel_matches_reference(seed):
    import jax.numpy as jnp

    rng = np.random.default_rng(seed)
    B, K, L = 16, 16, 100
    PW = (L + 15) // 16

    bases = rng.integers(0, 4, size=(B, L)).astype(np.uint8)
    bases[0, 10] = 4  # read N
    plen = rng.integers(L // 2, L + 1, size=B).astype(np.int32)
    rc = np.zeros_like(bases)
    for i in range(B):
        pl_ = plen[i]
        rc[i, :pl_] = (3 - bases[i, :pl_][::-1]) % 4
        rc[i, :pl_][bases[i, :pl_][::-1] >= 4] = 4
    logq_f = -rng.random((B, L)).astype(np.float32) * 4
    logq_r = -rng.random((B, L)).astype(np.float32) * 4
    dirs = rng.integers(0, 2, size=(B, K)).astype(np.int32)

    # random text words + bad bits
    text = rng.integers(0, 4, size=(B, K, PW * 16)).astype(np.uint8)
    tbad = (rng.random((B, K, PW * 16)) < 0.02)

    def pack16(mat3):
        w = np.zeros(mat3.shape[:-1] + (PW,), np.uint32)
        for i in range(16):
            for p in range(PW):
                w[..., p] |= mat3[..., p * 16 + i].astype(np.uint32) << (
                    2 * i
                )
        return w

    tw = pack16(text)
    bw = np.zeros_like(tw)
    for i in range(16):
        for p in range(PW):
            bw[..., p] |= tbad[..., p * 16 + i].astype(np.uint32) << (
                2 * i + 0
            )

    def pack_pat(mat):
        m = np.full((B, PW * 16), 4, np.uint8)
        m[:, :L] = mat
        w = np.zeros((B, PW), np.uint32)
        nb = np.zeros((B, PW), np.uint32)
        for i in range(16):
            for p in range(PW):
                c = m[:, p * 16 + i].astype(np.uint32)
                w[:, p] |= np.where(c < 4, c, 0) << (2 * i)
                nb[:, p] |= (c >= 4).astype(np.uint32) << (2 * i)
        return w, nb

    fw, fb = pack_pat(bases)
    rw, rb = pack_pat(rc)

    dist, logp = gapless_prescreen_pallas(
        jnp.asarray(tw.reshape(B, K * PW)),
        jnp.asarray(bw.reshape(B, K * PW)),
        jnp.asarray(fw), jnp.asarray(rw), jnp.asarray(fb),
        jnp.asarray(rb), jnp.asarray(logq_f), jnp.asarray(logq_r),
        jnp.asarray(dirs), jnp.asarray(plen), K, PW, interpret=True,
    )
    dist = np.asarray(dist)
    logp = np.asarray(logp)

    # reference: byte-level recompute
    for b in range(B):
        for k in range(min(K, 4)):
            pat = rc[b] if dirs[b, k] else bases[b]
            lq = logq_r[b] if dirs[b, k] else logq_f[b]
            pl_ = plen[b]
            mism = (
                (text[b, k, :pl_] != pat[:pl_])
                | tbad[b, k, :pl_]
                | (pat[:pl_] >= 4)
            )
            assert dist[b, k] == mism.sum(), (b, k)
            np.testing.assert_allclose(
                logp[b, k], lq[:pl_][mism].sum(), rtol=1e-5
            )
