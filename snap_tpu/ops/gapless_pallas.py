"""Fused Pallas kernel for the tier-1 gapless prescreen.

Computes, for every (read, candidate) pair, the gapless mismatch count
and log match probability from 2-bit-packed text/pattern words — the
TPU form of SNAP's 64-bit XOR scan (LandauVishkin.h:377-407).

Layout: one grid row block covers R reads; each read's K candidates
live side by side on the lane axis as K groups of PW packed words
(K*PW <= 128 lanes). The per-read pattern words, phred log-error rows,
and plen are loaded once per block and broadcast across the K
candidates in VMEM, so the whole prescreen is a single pass over the
gathered text words instead of the ~10 [B*K, L]-shaped XLA passes the
unfused version needs.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

EVEN = np.uint32(0x55555555)


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _kernel(tw_ref, bw_ref, fw_ref, rw_ref, fb_ref, rb_ref,
            lqf_ref, lqr_ref, dir_ref, plen_ref,
            dist_ref, logp_ref, K: int, PW: int, L: int):
    R = tw_ref.shape[0]
    tw = tw_ref[:]          # [R, K*PW pad] text words
    bw = bw_ref[:]          # [R, K*PW pad] text bad bits (even positions)
    fw = fw_ref[:]          # [R, PWpad] forward pattern words
    rw = rw_ref[:]
    fb = fb_ref[:]          # [R, PWpad] pattern N bits
    rb = rb_ref[:]
    # phred log-error rows permuted word-major: lane i*PW+p = position
    # p*16+i, so the mismatch-bit dot product is 16 static PW-lane
    # slice-multiplies (Mosaic cannot shape-cast an unpacked
    # [R, PW, 16] plane back to 2D)
    lqf = lqf_ref[:]        # [R, 16*PW pad] f32
    lqr = lqr_ref[:]
    dirs = dir_ref[:]       # [R, Kpad] int32
    plen = plen_ref[:, 0:1]

    # in-read lane mask per word (even bit positions)
    wbase = 16 * jnp.arange(PW, dtype=jnp.int32)[None, :]
    r16 = jnp.clip(
        plen - wbase, jnp.int32(0), jnp.int32(16)
    ).astype(jnp.uint32)
    partial = (
        (jnp.uint32(1) << (np.uint32(2) * r16)) - np.uint32(1)
    ) & EVEN
    lane_mask = jnp.where(r16 >= np.uint32(16), EVEN, partial)

    dist_out = jnp.zeros((R, dist_ref.shape[1]), jnp.int32)
    logp_out = jnp.zeros((R, logp_ref.shape[1]), jnp.float32)

    for k in range(K):
        t = tw[:, k * PW : (k + 1) * PW]
        b = bw[:, k * PW : (k + 1) * PW]
        dk = dirs[:, k : k + 1] == jnp.int32(1)
        pw = jnp.where(dk, rw[:, :PW], fw[:, :PW])
        pb = jnp.where(dk, rb[:, :PW], fb[:, :PW])
        x = t ^ pw
        mism = (
            (((x | (x >> np.uint32(1))) & EVEN) | b | pb) & lane_mask
        )
        d_k = jnp.sum(
            jax.lax.population_count(mism), axis=1, keepdims=True,
            dtype=jnp.int32,
        )
        lq = jnp.where(dk, lqr, lqf)
        acc = jnp.zeros((R, PW), jnp.float32)
        for i in range(16):
            bit = (
                (mism >> np.uint32(2 * i)) & np.uint32(1)
            ).astype(jnp.int32).astype(jnp.float32)
            acc = acc + bit * lq[:, i * PW : (i + 1) * PW]
        lp_k = jnp.sum(acc, axis=1, keepdims=True)
        onehot = (
            jnp.arange(dist_ref.shape[1], dtype=jnp.int32)[None, :]
            == jnp.int32(k)
        )
        dist_out = jnp.where(onehot, d_k, dist_out)
        logp_out = jnp.where(onehot, lp_k, logp_out)

    dist_ref[:] = dist_out
    logp_ref[:] = logp_out


def gapless_prescreen_pallas(
    text_words: jax.Array,   # [B, K*PW] uint32 funnel-aligned text
    bad_words: jax.Array,    # [B, K*PW] uint32 text invalid bits
    fwd_words: jax.Array,    # [B, PW] uint32 packed forward pattern
    rc_words: jax.Array,     # [B, PW] uint32 packed RC pattern
    fwd_bad: jax.Array,      # [B, PW] uint32 pattern N bits
    rc_bad: jax.Array,       # [B, PW] uint32
    logq_f: jax.Array,       # [B, L] f32
    logq_r: jax.Array,       # [B, L] f32
    dirs: jax.Array,         # [B, K] int32
    plen: jax.Array,         # [B] int32
    K: int,
    PW: int,
    interpret: bool | None = None,
) -> tuple[jax.Array, jax.Array]:
    """Returns (dist [B, K] int32, logp_err [B, K] f32) where logp_err
    is the sum of ln P(error) over mismatching in-read positions."""
    B = text_words.shape[0]
    L = logq_f.shape[1]
    if interpret is None:
        interpret = jax.default_backend() == "cpu"

    R = 8
    BP = _round_up(max(B, R), R)
    KWP = _round_up(K * PW, 128)
    PWP = _round_up(PW, 128)
    WQ = _round_up(16 * PW, 128)
    KP = _round_up(K, 128)

    def pad(a, rows, cols, fill):
        out = jnp.full((rows, cols), fill, a.dtype)
        return out.at[: a.shape[0], : a.shape[1]].set(a)

    def word_major(lq):
        # lane i*PW+p <- position p*16+i, zero beyond L
        padded = jnp.zeros((B, PW * 16), jnp.float32)
        padded = padded.at[:, :L].set(lq.astype(jnp.float32))
        return padded.reshape(B, PW, 16).transpose(0, 2, 1).reshape(
            B, 16 * PW
        )

    tw = pad(text_words, BP, KWP, np.uint32(0))
    bw = pad(bad_words, BP, KWP, np.uint32(0))
    fw = pad(fwd_words, BP, PWP, np.uint32(0))
    rw = pad(rc_words, BP, PWP, np.uint32(0))
    fb = pad(fwd_bad, BP, PWP, np.uint32(0))
    rb = pad(rc_bad, BP, PWP, np.uint32(0))
    lqf = pad(word_major(logq_f), BP, WQ, 0.0)
    lqr = pad(word_major(logq_r), BP, WQ, 0.0)
    dr = pad(dirs.astype(jnp.int32), BP, KP, 0)
    pl_ = pad(plen.astype(jnp.int32)[:, None], BP, 1, 0)

    def _rowi(i):
        return i, jnp.zeros_like(i)

    dist, logp = pl.pallas_call(
        functools.partial(_kernel, K=K, PW=PW, L=L),
        grid=(BP // R,),
        in_specs=[
            pl.BlockSpec((R, KWP), _rowi, memory_space=pltpu.VMEM),
            pl.BlockSpec((R, KWP), _rowi, memory_space=pltpu.VMEM),
            pl.BlockSpec((R, PWP), _rowi, memory_space=pltpu.VMEM),
            pl.BlockSpec((R, PWP), _rowi, memory_space=pltpu.VMEM),
            pl.BlockSpec((R, PWP), _rowi, memory_space=pltpu.VMEM),
            pl.BlockSpec((R, PWP), _rowi, memory_space=pltpu.VMEM),
            pl.BlockSpec((R, WQ), _rowi, memory_space=pltpu.VMEM),
            pl.BlockSpec((R, WQ), _rowi, memory_space=pltpu.VMEM),
            pl.BlockSpec((R, KP), _rowi, memory_space=pltpu.VMEM),
            pl.BlockSpec((R, 1), _rowi, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((R, KP), _rowi, memory_space=pltpu.VMEM),
            pl.BlockSpec((R, KP), _rowi, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((BP, KP), jnp.int32),
            jax.ShapeDtypeStruct((BP, KP), jnp.float32),
        ],
        interpret=interpret,
    )(tw, bw, fw, rw, fb, rb, lqf, lqr, dr, pl_)

    return dist[:B, :K], logp[:B, :K]
