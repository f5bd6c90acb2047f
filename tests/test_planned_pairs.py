"""Batched native paired-SAM emission must be byte-identical to the
per-pair Python path.

The paired fast path (PairedEndAligner._plan_pairs) vectorizes the
whole finalize_pair decision — combo enumeration, merge anchors, pair
MAPQ, chimeric-compare triage, TLEN — and emits both records of every
fast pair through one native call (snapio_format_sam_paired). Any pair
outside the covered shape must fall to finalize_pair/_emit_pair, and
the interleaved output must equal the all-Python run byte for byte.
"""

import sys

import numpy as np
import pytest

from snap_tpu.io import native as native_io

sys.path.insert(0, "tools")


@pytest.mark.skipif(
    not native_io.has_paired_formatter(),
    reason="native paired formatter absent",
)
def test_planned_pairs_vs_per_pair_byte_parity(tmp_path):
    from golden_harness import gen_genome, gen_pairs, write_fasta, write_fastq

    from snap_tpu.align.paired_driver import PairedEndAligner
    from snap_tpu.cli import main

    rng = np.random.default_rng(21)
    contigs = gen_genome(rng, 120_000, n_contigs=2, repeat_frac=0.15)
    fa = tmp_path / "g.fa"
    write_fasta(contigs, str(fa))
    idx = tmp_path / "idx"
    assert main(["index", str(fa), str(idx), "-s", "20"]) == 0

    # mixed shapes: clean pairs, indel pairs (complex rows), junk ends
    r1, r2 = gen_pairs(rng, contigs, 180, 100, 0.015, 0.004)
    junk = lambda: "".join("ACGT"[c] for c in rng.integers(0, 4, 100))
    for k in range(6):
        # unmapped-one-end pairs exercise the slow path + mate fields
        nm = f"junkpair{k}"
        r1.append((nm, junk(), "I" * 100))
        r2.append((nm, r2[k][1], "I" * 100))
    fq1, fq2 = tmp_path / "r1.fq", tmp_path / "r2.fq"
    write_fastq(r1, str(fq1))
    write_fastq(r2, str(fq2))

    o1, o2 = tmp_path / "a.sam", tmp_path / "b.sam"
    assert main(
        ["paired", str(idx), str(fq1), str(fq2), "-o", str(o1)]
    ) == 0
    orig = PairedEndAligner._plan_ok
    PairedEndAligner._plan_ok = lambda self, w: False
    try:
        assert main(
            ["paired", str(idx), str(fq1), str(fq2), "-o", str(o2)]
        ) == 0
    finally:
        PairedEndAligner._plan_ok = orig

    def body(p):  # @PG embeds the output path in CL
        return [
            l for l in p.read_bytes().split(b"\n")
            if not l.startswith(b"@PG")
        ]

    b1, b2 = body(o1), body(o2)
    assert len(b1) == len(b2)
    for x, y in zip(b1, b2):
        assert x == y, (x, y)
