"""finalize_batch (vectorized) must agree with finalize_read per row."""

import numpy as np
import pytest

from snap_tpu.align.post import finalize_batch, finalize_read


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
@pytest.mark.parametrize("alt_awareness", [True, False])
def test_batch_matches_per_read(seed, alt_awareness):
    rng = np.random.default_rng(seed)
    B, K = 40, 16
    # clustered candidate locations: some duplicates, some nearby, some far
    base = rng.integers(1000, 1_000_000, size=(B, K)).astype(np.int64)
    dup = rng.random((B, K)) < 0.3
    base = np.where(dup, np.roll(base, 1, axis=1), base)
    near = rng.random((B, K)) < 0.2
    base = np.where(near, np.roll(base, 2, axis=1) + rng.integers(1, 60, (B, K)), base)
    dist = rng.integers(0, 12, size=(B, K)).astype(np.int32)
    logp = -rng.random((B, K)).astype(np.float32) * 10
    ag = (100 - 5 * dist + rng.integers(0, 3, (B, K))).astype(np.int32)
    end = base + 100
    dirs = rng.integers(0, 2, size=(B, K)).astype(np.int32)
    valid = rng.random((B, K)) < 0.8
    valid[:, 0] = True
    valid[3] = False  # a notfound row
    popular = rng.integers(0, 15, size=B).astype(np.int32)
    is_alt = base > 800_000

    got = finalize_batch(
        dist, logp, ag, end, base, dirs, valid, popular,
        is_alt=is_alt, alt_awareness=alt_awareness,
    )
    assert len(got) == B
    for i in range(B):
        want, _ = finalize_read(
            dist[i], logp[i], ag[i], end[i], base[i], dirs[i], valid[i],
            int(popular[i]), is_alt=is_alt[i], alt_awareness=alt_awareness,
        )
        g = got[i][0]
        assert g.status == want.status, i
        if want.status == "notfound":
            continue
        assert g.mapq == want.mapq, (i, g, want)
        assert g.dist == want.dist, i
        assert g.end_loc == want.end_loc, i
        assert g.direction == want.direction, i
        assert g.match_prob == pytest.approx(want.match_prob), i
        assert g.prob_all == pytest.approx(want.prob_all), i


def test_emission_ag_restructure_3bp_deletion(tmp_path):
    """PARITY.md p89 class: a read with a 3-base deletion whose tail
    happens to nearly match unshifted (2 mismatches). The gapless/LV
    score keeps the substitutions (dist 2 <= maxKForSameAlignment), but
    the reference recomputes every score>0 CIGAR with affine gap at
    emission (ReadWriter.cpp:231, SAM.cpp:1653) and the single 3D gap
    (penalty open 6 + 3*ext = 9) beats 2 substitutions (2*(sub+match) =
    10), so the emitted record must be 96M3D4M / NM:3, not 100M / NM:2."""
    import numpy as np

    from snap_tpu.align.pipeline import AlignParams
    from snap_tpu.align.single import (
        SingleEndAligner, ag_restructure_possible,
    )
    from snap_tpu.constants import PAD
    from snap_tpu.genome import Contig, Genome
    from snap_tpu.index.index import GenomeIndex
    from snap_tpu.io.sam import SamWriter

    rng = np.random.default_rng(89)
    g = 30000
    codes = rng.integers(0, 4, size=g).astype(np.uint8)
    s = 12000
    # engineer: the 4 post-deletion read bases match the unshifted
    # genome at the first 2 positions only -> gapless dist 2
    codes[s + 96] = codes[s + 99]
    codes[s + 97] = codes[s + 100]
    codes[s + 98] = (codes[s + 101] + 1) % 4
    # read = G[s:s+96] + G[s+99:s+103] (3-base deletion at 96)
    read = np.concatenate([codes[s : s + 96], codes[s + 99 : s + 103]])
    if codes[s + 99] == read[99]:
        codes[s + 99] = (read[99] + 1) % 4  # ensure a 2nd tail mismatch
        read = np.concatenate([codes[s : s + 96], codes[s + 99 : s + 103]])

    bases = np.full(g + 4000, PAD, dtype=np.uint8)
    bases[2000 : 2000 + g] = codes
    genome = Genome(
        bases=bases, contigs=[Contig(name="c1", start=2000, length=g)]
    )

    # unit level: the screen flags the row
    flagged = ag_restructure_possible(
        bases, read[None, :], [0], [0], [2000 + s], [100], [0], [2],
    )
    assert bool(flagged[0])

    index = GenomeIndex.build(genome, 20)
    params = AlignParams(seed_len=20, max_probe=index.max_probe)
    aligner = SingleEndAligner(index, params, batch_size=4, max_read_len=100)
    DEC = np.frombuffer(b"ACGT", np.uint8)
    fq = tmp_path / "r.fq"
    fq.write_bytes(
        b"@d3\n" + DEC[read].tobytes() + b"\n+\n" + b"I" * 100 + b"\n"
    )
    out = tmp_path / "out.sam"
    with open(out, "wb") as f:
        w = SamWriter(out=f, genome=genome, command_line="t")
        aligner.align_file(str(fq), w)
    body = [
        ln for ln in out.read_text().splitlines() if not ln.startswith("@")
    ]
    assert len(body) == 1
    t = body[0].split("\t")
    assert t[3] == str(s + 1) and t[5] == "96M3D4M", t[:6]
    assert any(f == "NM:i:3" for f in t), t
