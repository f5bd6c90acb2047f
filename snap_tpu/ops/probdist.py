"""ProbabilityDistance: phred-aware alignment probability scorer.

Behavioral reference: SNAPLib/ProbabilityDistance.{h,cpp} — a 3-state
(NO_GAP / READ_GAP / REF_GAP) dynamic program over
[readPos][shift in -maxShift..+maxShift], where shift is the net indel
displacement between read and reference. Transition model
(ProbabilityDistance.cpp:92-110):

- NO_GAP from any state at the same shift, paying the match/mismatch
  log probability of the current base (match prob =
  (1-errorProb)*(1-snpProb), ctor at :31-45);
- READ_GAP (deletion in the read) from shift+1, gap open from
  NO_GAP/REF_GAP, extension from READ_GAP;
- REF_GAP (insertion in the read) from shift-1 within the same row.

compute() returns the max log probability over all shifts and states at
the final row (ProbabilityDistance.cpp:126-134). Here it is batched:
[N] (reference window, read, quality) triples score in one wavefront of
elementwise VPU ops with a lax.fori_loop over read positions.

Wiring parity: the reference allocates a ProbabilityDistance in every
BaseAligner (BaseAligner.cpp:134) but never calls compute() on the
production path (the only other mention is a stale comment at
BaseAligner.cpp:1093); alignment probabilities come from the
LandauVishkin matchProbability path instead. This port keeps the scorer
implemented and tested, and — like the reference — unwired.

Wiring parity: the reference constructs a ProbabilityDistance in every
BaseAligner (BaseAligner.cpp:134) but never calls compute() anywhere in
the codebase — it is a retained alternative scorer, not part of the
production align path. This port keeps the same status: implemented and
unit-tested (tests/test_probdist.py), available for callers, wired into
no default pipeline — matching the reference exactly.
"""

from __future__ import annotations

import numpy as np

from ..constants import SNP_PROB

MAX_SHIFT = 20     # ProbabilityDistance.h:16
NO_PROB = -1.0e6   # ProbabilityDistance.h NO_PROB


def match_mismatch_log_tables(
    snp_prob: float = SNP_PROB,
) -> tuple[np.ndarray, np.ndarray]:
    """log P(match) / log P(mismatch) indexed by raw phred+33 byte."""
    q = np.arange(256, dtype=np.float64)
    error = np.power(10.0, -(q - 33) / 10.0)
    match = (1.0 - error) * (1.0 - snp_prob)
    with np.errstate(divide="ignore", invalid="ignore"):
        mlp = np.where(q < 33, NO_PROB, np.log(match))
        xlp = np.where(q < 33, NO_PROB, np.log(1.0 - match))
    return mlp.astype(np.float32), xlp.astype(np.float32)


def probability_distance(
    reference,  # [N, W] uint8 codes, W >= read_len + max_shift
    read,       # [N, L] uint8 codes
    quality,    # [N, L] uint8 raw phred+33
    read_len,   # [N] int32 effective lengths
    max_start_shift: int = 2,
    max_shift: int = 5,
    gap_open_prob: float = 0.001,
    gap_extension_prob: float = 0.5,
    snp_prob: float = SNP_PROB,
):
    """Batched ProbabilityDistance::compute. Returns [N] float32 natural
    log of the best alignment probability (NO_PROB when none)."""
    import jax
    import jax.numpy as jnp

    assert max_start_shift <= max_shift < MAX_SHIFT
    N, L = read.shape
    S = 2 * max_shift + 1
    go = np.float32(np.log(gap_open_prob))
    ge = np.float32(np.log(gap_extension_prob))
    mlp_t, xlp_t = match_mismatch_log_tables(snp_prob)
    mlp_t, xlp_t = jnp.asarray(mlp_t), jnp.asarray(xlp_t)
    NOP = np.float32(NO_PROB)

    shifts = np.arange(-max_shift, max_shift + 1, dtype=np.int64)  # [S]
    start_ok = np.abs(shifts) <= max_start_shift

    no_gap0 = jnp.where(
        jnp.asarray(start_ok)[None, :], np.float32(0.0), NOP
    ) * jnp.ones((N, 1), jnp.float32)
    read_gap0 = jnp.full((N, S), NOP, jnp.float32)
    ref_gap0 = jnp.full((N, S), NOP, jnp.float32)

    ans = jnp.full((N,), NOP, jnp.float32)
    W = reference.shape[1]
    shifts_j = jnp.asarray(shifts)[None, :]  # [1, S]

    def shift_left(x):  # value at s+1, NO_PROB past the band edge
        return jnp.concatenate([x[:, 1:], jnp.full((N, 1), NOP)], axis=1)

    def row(r, state):
        no_gap, read_gap, ref_gap, ans = state
        # reference base at column r + shift (0-based read pos r)
        col = jnp.clip(r + shifts_j, 0, W - 1)
        ref_b = jnp.take_along_axis(
            reference, jnp.broadcast_to(col, (N, S)).astype(jnp.int64),
            axis=1,
        )
        in_ref = (r + shifts_j >= 0) & (r + shifts_j < W)
        rd = jax.lax.dynamic_slice_in_dim(read, r, 1, axis=1)       # [N,1]
        qv = jax.lax.dynamic_slice_in_dim(quality, r, 1, axis=1)
        is_match = (ref_b == rd) & in_ref & (rd < 4)
        base_lp = jnp.where(
            is_match, mlp_t[qv.astype(jnp.int64)], xlp_t[qv.astype(jnp.int64)]
        )

        best_prev = jnp.maximum(jnp.maximum(no_gap, read_gap), ref_gap)
        no_gap_n = best_prev + base_lp
        read_gap_n = jnp.maximum(
            jnp.maximum(shift_left(no_gap), shift_left(ref_gap)) + go,
            shift_left(read_gap) + ge,
        )
        # REF_GAP is an in-row recurrence from shift-1:
        #   ref[s] = max(src[s-1], ref[s-1] + ge)   (open vs extend)
        # which expands to ref[s] = max_{l<s} src[l] + (s-1-l)*ge — a
        # max-plus prefix scan along the shift axis.
        src = jnp.maximum(no_gap_n, read_gap_n) + go
        steps = jnp.arange(S, dtype=jnp.float32)[None, :] * ge
        prefix = jax.lax.associative_scan(jnp.maximum, src - steps, axis=1)
        ref_gap_n = jnp.concatenate(
            [
                jnp.full((N, 1), NOP, jnp.float32),
                prefix[:, :-1] + steps[:, :-1],
            ],
            axis=1,
        )

        is_last = (r + 1) == read_len
        fin = jnp.max(
            jnp.maximum(jnp.maximum(no_gap_n, read_gap_n), ref_gap_n), axis=1
        )
        ans = jnp.where(is_last, fin, ans)
        return no_gap_n, read_gap_n, ref_gap_n, ans

    state = (no_gap0, read_gap0, ref_gap0, ans)
    state = jax.lax.fori_loop(0, L, row, state)
    return state[3]
