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
    assert len(WINNER_COLS) == 19
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
    equal the originals exactly after the documented compressions:
    16-bit truncation for dist/clips/len_eff, 8-bit saturation for the
    count columns, and zero/nonzero for indels."""
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
        edge_indel=rng.integers(0, 2, B).astype(bool),
        ag_flip=rng.integers(0, 2, B).astype(bool),
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
                v = (v != 0).astype(np.int64)  # zero/nonzero only
            elif k in ("cand_k", "popular", "valid_count", "esc_count"):
                v = np.minimum(v, 255)  # documented 8-bit saturation
            np.testing.assert_array_equal(
                np.asarray(got).astype(np.int64),
                v.astype(np.int64), err_msg=k,
            )


def test_winner_flags_match_host_screens():
    """pipeline.winner_flags (device) must equal the host screens it
    replaces (single.one_indel_improves / ag_restructure_possible) on
    forward and RC rows, including planted positives."""
    import jax.numpy as jnp

    from snap_tpu.align.pipeline import AlignParams, winner_flags
    from snap_tpu.align.single import (
        ag_restructure_possible, one_indel_improves,
    )
    from snap_tpu.constants import PAD
    from snap_tpu.genome import Contig, Genome
    from snap_tpu.index.build import build_index
    from snap_tpu.index.index import make_device_index

    rng = np.random.default_rng(5)
    glen = 20000
    codes = rng.integers(0, 4, size=glen).astype(np.uint8)
    gbases = np.full(glen + 2000, PAD, dtype=np.uint8)
    gbases[1000 : 1000 + glen] = codes
    genome = Genome(
        bases=gbases, contigs=[Contig(name="chr1", start=1000, length=glen)]
    )
    idx = build_index(genome, seed_len=20)
    didx = make_device_index(idx, gbases)
    params = AlignParams(seed_len=20, max_probe=idx["max_probe"])

    B, L = 48, 100
    starts = rng.integers(0, glen - L - 10, size=B)
    reads = codes[starts[:, None] + np.arange(L)[None, :]].copy()
    for i in range(B):
        kind = i % 4
        if kind == 0:      # two substitutions (screen negatives)
            for p in (20, 60):
                reads[i, p] = (reads[i, p] + 1) % 4
        elif kind == 1:    # 1bp deletion near the tail (edge-indel)
            s = starts[i]
            reads[i, L - 3 :] = codes[s + L - 2 : s + L + 1]
        elif kind == 2:    # 3bp deletion mid-tail (ag restructure)
            s = starts[i]
            reads[i, 90:] = codes[s + 93 : s + 103]
        # kind == 3: clean
    dirs = (np.arange(B) % 2).astype(np.int32)
    DEC_RC = np.array([3, 2, 1, 0, 4, 5], dtype=np.uint8)
    oriented = reads.copy()
    rc_rows = np.flatnonzero(dirs == 1)
    # device/host convention: `bases` rows hold the READ; for dir=1 the
    # oriented pattern is its RC. Make the stored read the RC of the
    # genome-matching sequence so the oriented pattern matches.
    oriented[rc_rows] = DEC_RC[reads[rc_rows, ::-1]]
    plens = np.full(B, L, np.int64)
    start_locs = starts.astype(np.int64) + 1000
    end_locs = start_locs + plens
    dists = np.full(B, 2, np.int64)
    fes = np.zeros(B, np.int64)
    rows = np.arange(B)

    edge_dev, ag_dev = winner_flags(
        didx, jnp.asarray(oriented), jnp.asarray(plens.astype(np.int32)),
        jnp.asarray(dirs), jnp.asarray(end_locs), jnp.asarray(dists),
        params,
    )
    edge_host = one_indel_improves(
        gbases, oriented, rows, dirs, start_locs, plens, fes
    )
    ag_host = ag_restructure_possible(
        gbases, oriented, rows, dirs, start_locs, plens, fes, dists,
        match=params.ag_match, sub=params.ag_sub,
        gap_open=params.ag_open, gap_extend=params.ag_extend,
    )
    np.testing.assert_array_equal(
        np.asarray(edge_dev), edge_host, err_msg="edge_indel"
    )
    np.testing.assert_array_equal(
        np.asarray(ag_dev), ag_host, err_msg="ag_flip"
    )
    # the planted cases actually fire both screens
    assert edge_host[1::4].all(), "planted 1bp deletions must flag"
    assert ag_host[2::4].all(), "planted 3bp deletions must flag"
