"""AlignmentAdjuster equivalent: contig-edge soft clipping.

Behavioral reference: SNAPLib/AlignmentAdjuster.{h,cpp} — alignments
whose reference span crosses a contig boundary are re-clipped to the
contig with NM recomputed; fully-off-contig alignments are demoted to
unmapped (SAM.cpp:1659-1712 contig-crossing demotion).
"""

import numpy as np

from snap_tpu.align.adjust import adjust_to_contig, parse_cigar, render_cigar
from snap_tpu.constants import PAD


def _genome():
    g = np.full(200, PAD, dtype=np.uint8)
    rng = np.random.default_rng(2)
    g[50:150] = rng.integers(0, 4, size=100)
    return g


def test_inside_contig_unchanged():
    g = _genome()
    body = g[60:90].copy()
    res = adjust_to_contig(60, "30M", body, g, 50, 150)
    assert res == (60, "30M", 0)


def test_trailing_overhang_clipped():
    g = _genome()
    # alignment starts at 130, 30M spans to 160 — 10 bases past the end
    body = np.concatenate([g[130:150], np.zeros(10, np.uint8)])
    res = adjust_to_contig(130, "30M", body, g, 50, 150)
    assert res is not None
    start, cigar, nm = res
    assert start == 130 and cigar == "20M10S" and nm == 0


def test_leading_overhang_clipped_and_pos_shifts():
    g = _genome()
    body = np.concatenate([np.zeros(10, np.uint8), g[50:70]])
    res = adjust_to_contig(40, "30M", body, g, 50, 150)
    assert res is not None
    start, cigar, nm = res
    assert start == 50 and cigar == "10S20M" and nm == 0


def test_existing_soft_clips_compose():
    g = _genome()
    body = np.concatenate([g[140:150], np.zeros(5, np.uint8)])
    res = adjust_to_contig(140, "3S15M2S", body, g, 50, 150)
    assert res is not None
    start, cigar, nm = res
    assert start == 140 and cigar == "3S10M7S" and nm == 0


def test_deletion_at_boundary_dropped():
    g = _genome()
    # 10M 5D 10M starting at 138: first 10M reaches 148, D spans 148-153
    # crossing the boundary at 150 -> trailing part clipped, D dropped
    body = np.concatenate([g[138:148], g[153:163]])
    res = adjust_to_contig(138, "10M5D10M", body, g, 50, 150)
    assert res is not None
    start, cigar, nm = res
    assert start == 138
    assert cigar == "10M10S"
    assert nm == 0


def test_fully_off_contig_is_none():
    g = _genome()
    body = np.zeros(30, np.uint8)
    assert adjust_to_contig(160, "30M", body, g, 50, 150) is None


def test_nm_recomputed_on_clip():
    g = _genome()
    body = np.concatenate([g[130:150], np.zeros(10, np.uint8)])
    body[5] = (body[5] + 1) % 4   # one mismatch inside the kept region
    body[25] = (body[25] + 1) % 4  # mismatch inside the clipped region
    res = adjust_to_contig(130, "30M", body, g, 50, 150)
    start, cigar, nm = res
    assert cigar == "20M10S" and nm == 1


def test_eq_x_style_preserved():
    g = _genome()
    body = np.concatenate([g[130:150], np.zeros(10, np.uint8)])
    body[5] = (body[5] + 1) % 4
    res = adjust_to_contig(130, "30M", body, g, 50, 150, use_m=False)
    start, cigar, nm = res
    assert cigar == "5=1X14=10S" and nm == 1


def test_cigar_roundtrip_helpers():
    assert render_cigar(parse_cigar("3S10M2I5M1S")) == "3S10M2I5M1S"
    assert render_cigar([[2, "M"], [3, "M"], [0, "I"]]) == "5M"
