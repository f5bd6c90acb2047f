"""Output filters (-F/-E), secondary alignments (-om family), CIGAR
styles (-=/-M), stop-on-first-hit (-f).

Behavioral reference: AlignerOptions::passFilter (AlignerOptions.cpp),
BaseAligner::finalizeSecondaryResults (BaseAligner.cpp:2423-2553),
useM CIGAR styles (SAM.cpp:2639-2661), stopOnFirstHit
(BaseAligner.cpp:1490-1505).
"""

import io

import numpy as np
import pytest

from snap_tpu.options import (
    FILTER_PRESETS,
    FILTER_SINGLE_HIT,
    FILTER_TOO_SHORT,
    FILTER_UNALIGNED,
    pass_filter,
)
from snap_tpu.align.post import collect_secondary_results
from snap_tpu.align.cigar import OP_D, OP_I, OP_M, ops_to_cigar


def test_pass_filter_semantics():
    # no flags: everything passes
    assert pass_filter(0, "notfound")
    # -F a: aligned only (+ too short pass per FilterTooShort)
    fa = FILTER_PRESETS["a"]
    assert pass_filter(fa, "single")
    assert pass_filter(fa, "multi")
    assert not pass_filter(fa, "notfound")
    assert pass_filter(fa, "filtered")  # FilterTooShort included
    # -F s: single hits only
    fs = FILTER_PRESETS["s"]
    assert pass_filter(fs, "single")
    assert not pass_filter(fs, "multi")
    # ... but secondary alignments always survive a single filter
    assert pass_filter(fs, "multi", secondary=True)
    # -F u: unaligned only
    fu = FILTER_PRESETS["u"]
    assert not pass_filter(fu, "single")
    assert pass_filter(fu, "notfound")
    # -E composition
    assert pass_filter(FILTER_UNALIGNED | FILTER_SINGLE_HIT, "single")
    assert not pass_filter(FILTER_TOO_SHORT, "single")
    assert pass_filter(FILTER_TOO_SHORT, "filtered")


def test_collect_secondary_results():
    # three candidate locations far apart; best dist 1; om=1 keeps dist<=2
    dist = np.array([1, 2, 5, 3], dtype=np.int32)
    logp = np.array([-1.0, -2.0, -9.0, -3.0], dtype=np.float32)
    ag = np.array([90, 85, 40, 80], dtype=np.int32)
    end = np.array([1000, 5000, 9000, 13000], dtype=np.int64)
    cl = end - 100
    dr = np.zeros(4, dtype=np.int32)
    valid = np.ones(4, dtype=bool)

    secs = collect_secondary_results(
        dist, logp, ag, end, cl, dr, valid,
        primary_cand_index=0, best_dist=1, max_k=27,
        max_edit_distance_for_secondary=1,
    )
    assert [s.dist for s in secs] == [2]
    assert all(s.mapq == 0 for s in secs)

    # om=3 keeps dist 2 and 3 (<= 1+3), sorted by score; omax=1 truncates
    secs = collect_secondary_results(
        dist, logp, ag, end, cl, dr, valid, 0, 1, 27, 3,
    )
    assert [s.dist for s in secs] == [2, 3]
    secs = collect_secondary_results(
        dist, logp, ag, end, cl, dr, valid, 0, 1, 27, 3, max_secondary=1,
    )
    assert len(secs) == 1

    # ALT secondaries are flagged supplementary under ALT awareness
    is_alt = np.array([False, True, False, False])
    secs = collect_secondary_results(
        dist, logp, ag, end, cl, dr, valid, 0, 1, 27, 3, is_alt=is_alt,
    )
    assert secs[0].supplementary and not secs[1].supplementary


def test_eq_x_cigar_style():
    pattern = np.array([0, 1, 2, 3, 0, 1], dtype=np.uint8)
    text = np.array([0, 1, 3, 3, 0, 1], dtype=np.uint8)  # mismatch at col 2
    ops = np.array([OP_M] * 6, dtype=np.int8)
    assert ops_to_cigar(ops, use_m=True) == "6M"
    assert (
        ops_to_cigar(ops, use_m=False, pattern=pattern, text=text)
        == "2=1X3="
    )
    ops2 = np.array([OP_M, OP_M, OP_I, OP_M, OP_M, OP_M], dtype=np.int8)
    # with an insertion the text cursor stays put for the I column
    text2 = np.array([0, 1, 3, 0, 1], dtype=np.uint8)
    assert (
        ops_to_cigar(ops2, use_m=False, pattern=pattern, text=text2)
        == "2=1I3="
    )
    assert ops_to_cigar(ops2, front_clip=2, back_clip=1) == "2S2M1I3M1S"


def test_cli_single_with_filters_and_secondaries(tmp_path):
    """End-to-end: -F a drops unaligned records; -om 2 emits secondaries
    on a genome with a duplicated segment; -= emits =/X CIGARs."""
    from snap_tpu.cli import main

    rng = np.random.default_rng(11)
    seg = "".join("ACGT"[c] for c in rng.integers(0, 4, size=400))
    chr1 = (
        "".join("ACGT"[c] for c in rng.integers(0, 4, size=1200))
        + seg
        + "".join("ACGT"[c] for c in rng.integers(0, 4, size=1200))
        + seg
        + "".join("ACGT"[c] for c in rng.integers(0, 4, size=1200))
    )
    fa = tmp_path / "dup.fa"
    fa.write_text(f">chr1\n{chr1}\n")
    # a read from the duplicated segment + a junk read
    read = seg[100:200]
    junk = "".join("ACGT"[c] for c in rng.integers(0, 4, size=100))
    fq = tmp_path / "r.fq"
    fq.write_text(
        f"@r1\n{read}\n+\n{'I' * 100}\n@junk\n{junk}\n+\n{'I' * 100}\n"
    )
    idxdir = tmp_path / "idx"
    assert main(["index", str(fa), str(idxdir), "-s", "20"]) == 0

    out1 = tmp_path / "o1.sam"
    assert main([
        "single", str(idxdir), str(fq), "-o", str(out1),
        "-F", "a", "-om", "2", "-omax", "10",
    ]) == 0
    lines = [
        ln for ln in out1.read_text().splitlines() if not ln.startswith("@")
    ]
    names = [ln.split("\t")[0] for ln in lines]
    assert "junk" not in names  # -F a filtered the unaligned read
    r1 = [ln.split("\t") for ln in lines if ln.split("\t")[0] == "r1"]
    assert len(r1) == 2  # primary + one secondary (duplicate segment)
    flags = sorted(int(f[1]) for f in r1)
    assert flags[0] & 0x100 == 0 and flags[1] & 0x100

    out2 = tmp_path / "o2.sam"
    assert main([
        "single", str(idxdir), str(fq), "-o", str(out2), "-=",
    ]) == 0
    recs = [
        ln.split("\t") for ln in out2.read_text().splitlines()
        if ln.startswith("r1")
    ]
    assert recs[0][5] == "100="
