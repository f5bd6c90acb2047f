"""Packed-winner transfer format and the DP-tier overflow fallback."""

import numpy as np

import snap_tpu  # noqa: F401  (x64 + platform config)


def _mini_setup(batch=64, read_len=60, glen=20000, mut=0.02, seed=3):
    import jax.numpy as jnp

    from snap_tpu.align.pipeline import AlignParams
    from snap_tpu.constants import PAD
    from snap_tpu.genome import Contig, Genome
    from snap_tpu.index.build import build_index
    from snap_tpu.index.index import make_device_index

    rng = np.random.default_rng(seed)
    codes = rng.integers(0, 4, size=glen).astype(np.uint8)
    bases = np.full(glen + 2000, PAD, dtype=np.uint8)
    bases[1000 : 1000 + glen] = codes
    genome = Genome(
        bases=bases, contigs=[Contig(name="chr1", start=1000, length=glen)]
    )
    idx = build_index(genome, seed_len=20)
    didx = make_device_index(idx, bases)
    params = AlignParams(
        seed_len=20, max_probe=idx["max_probe"], num_seeds=8,
        hit_cap=8, max_cand=8,
    )
    starts = rng.integers(0, glen - read_len - 1, size=batch)
    reads = codes[starts[:, None] + np.arange(read_len)[None, :]]
    m = rng.random(reads.shape) < mut
    reads = np.where(m, rng.integers(0, 4, reads.shape), reads).astype(
        np.uint8
    )
    quals = np.full((batch, read_len), ord("I"), dtype=np.uint8)
    lens = np.full(batch, read_len, dtype=np.int32)
    return (
        didx, params, jnp.asarray(reads), jnp.asarray(quals),
        jnp.asarray(lens), jnp.int64(bases.shape[0]), starts,
    )


def test_packed_winners_roundtrip_and_fields():
    import jax

    from snap_tpu.align.pipeline import (
        HostWinners, WINNER_COLS, align_winners_device,
    )

    didx, params, b, q, l, fas, starts = _mini_setup()
    win_packed, _out = align_winners_device(didx, b, q, l, fas, params)
    w = HostWinners(jax.device_get(win_packed))
    assert not w.dp_overflow
    assert len(WINNER_COLS) == 17
    found = np.asarray(w.found)
    assert found.sum() >= len(starts) * 0.9
    # winners land where the reads were sampled from (padding offset 1000)
    body = np.asarray(w.end_loc) - np.asarray(w.len_eff)
    good = np.abs(body[found] - (starts[found] + 1000)) <= 2
    assert good.mean() > 0.9
    assert np.asarray(w.mapq).max() <= 70


def test_dp_overflow_flag_set_when_tier_too_small():
    import jax

    from snap_tpu.align.pipeline import HostWinners, align_winners_device

    # heavy mutation incl. indel-like noise so many candidates need the
    # DP tier; dp_rows=... minimum is clamped at 1024 internally, so
    # force a tiny tier explicitly
    didx, params, b, q, l, fas, starts = _mini_setup(mut=0.08)
    win_packed, _ = align_winners_device(
        didx, b, q, l, fas, params, dp_rows=1
    )
    w = HostWinners(jax.device_get(win_packed))
    # with a 1-row DP tier on mutated reads the overflow flag must trip
    assert w.dp_overflow


def test_pack_unpack_bit_exact():
    """Synthetic WinnerOut -> pack_winners -> HostWinners roundtrip.

    Randomized in-range values for every field; unpacked columns must
    equal the originals exactly (after the documented 16-bit
    truncation, which is the identity for in-range values)."""
    import jax
    import jax.numpy as jnp

    from snap_tpu.align.pipeline import (
        HostWinners, PACK_WORDS, WinnerOut, pack_winners,
    )

    rng = np.random.default_rng(7)
    B = 257
    vals = dict(
        found=rng.integers(0, 2, B).astype(bool),
        fallback=rng.integers(0, 2, B).astype(bool),
        cand_k=rng.integers(0, 512, B).astype(np.int32),
        direction=rng.integers(0, 2, B).astype(np.uint8),
        dist=rng.integers(-1, 300, B).astype(np.int16),
        mapq=rng.integers(0, 71, B).astype(np.uint8),
        end_loc=rng.integers(0, 1 << 32, B).astype(np.uint32),
        body_loc=rng.integers(0, 1 << 32, B).astype(np.uint32),
        clip_before=rng.integers(0, 30000, B).astype(np.int16),
        clip_after=rng.integers(0, 30000, B).astype(np.int16),
        escalated=rng.integers(0, 2, B).astype(bool),
        indels=np.where(
            rng.integers(0, 4, B) == 0, 1 << 20,
            rng.integers(0, 128, B),
        ).astype(np.int32),
        len_eff=rng.integers(0, 30000, B).astype(np.int16),
        popular=rng.integers(0, 64, B).astype(np.int16),
        valid_count=rng.integers(0, 1024, B).astype(np.int16),
        esc_count=rng.integers(0, 1024, B).astype(np.int16),
        truncated=rng.integers(0, 2, B).astype(bool),
    )
    for overflow in (False, True):
        win = WinnerOut(
            **{k: jnp.asarray(v) for k, v in vals.items()},
            dp_overflow=jnp.asarray(overflow),
        )
        packed = np.asarray(jax.device_get(jax.jit(pack_winners)(win)))
        assert packed.shape == (B + 1, PACK_WORDS)
        assert packed.dtype == np.int32
        w = HostWinners(packed)
        assert w.dp_overflow == overflow
        for k, v in vals.items():
            got = getattr(w, k)
            if k in ("end_loc", "body_loc"):
                v = v.astype(np.int64)
            elif k == "indels":
                v = np.minimum(v, 0x7FFF)  # documented saturation
            np.testing.assert_array_equal(
                np.asarray(got).astype(np.int64),
                v.astype(np.int64), err_msg=k,
            )
