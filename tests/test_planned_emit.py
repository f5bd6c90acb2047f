"""Batched native SAM emission (the planned fast path) must be
byte-identical to the per-read Python emission path.

The reference formats SAM text in C++ per record (SAM.cpp:1740-1900,
SAMFormat::writeRead); our equivalent batches every "simple" record of
a batch into one native call (native/snapio.cpp snapio_format_sam_simple)
and interleaves the blob with the per-read path for complex rows so the
output order stays exactly the input read order.
"""

import numpy as np
import pytest

from snap_tpu.io import native as native_io


@pytest.mark.skipif(
    not native_io.has_sam_formatter(), reason="native SAM formatter absent"
)
def test_planned_vs_per_read_byte_parity(tmp_path):
    from snap_tpu.align.single import SingleEndAligner
    from snap_tpu.cli import main

    rng = np.random.default_rng(11)
    seq = "".join("ACGT"[c] for c in rng.integers(0, 4, size=12000))
    fa = tmp_path / "g.fa"
    fa.write_text(f">c1\n{seq[:6000]}\n>c2\n{seq[6000:]}\n")
    idx = tmp_path / "idx"
    assert main(["index", str(fa), str(idx), "-s", "20"]) == 0

    def rc(s):
        return s[::-1].translate(str.maketrans("ACGT", "TGCA"))

    reads = []
    for i in range(96):
        p = int(rng.integers(0, 11800))
        r = seq[p : p + 100]
        kind = i % 6
        if kind == 1:
            r = rc(r)
        elif kind == 2:  # substitutions
            rl = list(r)
            for _ in range(3):
                j = int(rng.integers(0, 100))
                rl[j] = "ACGT"[int(rng.integers(0, 4))]
            r = "".join(rl)
        elif kind == 3:  # deletion → non-gapless CIGAR (complex row)
            r = seq[p : p + 50] + seq[p + 53 : p + 103]
        elif kind == 4:  # insertion
            r = seq[p : p + 50] + "AC" + seq[p + 50 : p + 98]
        elif kind == 5 and i % 12 == 5:  # junk → unmapped (complex row)
            r = "".join("ACGT"[c] for c in rng.integers(0, 4, size=100))
        reads.append((f"rd{i} comment", r))
    fq = tmp_path / "r.fq"
    fq.write_text(
        "".join(f"@{n}\n{r}\n+\n{'I' * len(r)}\n" for n, r in reads)
    )

    o1, o2 = tmp_path / "a.sam", tmp_path / "b.sam"
    assert main(["single", str(idx), str(fq), "-o", str(o1)]) == 0
    orig = SingleEndAligner._plan_ok
    SingleEndAligner._plan_ok = lambda self, w: False
    try:
        assert main(["single", str(idx), str(fq), "-o", str(o2)]) == 0
    finally:
        SingleEndAligner._plan_ok = orig

    def body(p):  # @PG embeds the output path in CL
        return [
            l for l in p.read_bytes().split(b"\n")
            if not l.startswith(b"@PG")
        ]

    assert body(o1) == body(o2)


@pytest.mark.skipif(
    not native_io.has_sam_formatter(), reason="native SAM formatter absent"
)
def test_bare_samwriter_planned_vs_per_read(tmp_path):
    """A bare SamWriter (no OutputWriter wrapper, the bench.py path)
    streams planned native records interleaved with write_record rows
    in one stream; any format drift between snapio_format_sam_simple
    and SamWriter.write_record would silently mix formats (ADVICE r2)."""
    import io

    from snap_tpu.align.pipeline import AlignParams
    from snap_tpu.align.single import SingleEndAligner
    from snap_tpu.genome import load_fasta
    from snap_tpu.index.index import GenomeIndex
    from snap_tpu.io.sam import SamWriter

    rng = np.random.default_rng(7)
    seq = "".join("ACGT"[c] for c in rng.integers(0, 4, size=9000))
    fa = tmp_path / "g.fa"
    fa.write_text(f">c1\n{seq}\n")
    genome = load_fasta(str(fa))
    index = GenomeIndex.build(genome, 20)
    params = AlignParams(seed_len=20, max_probe=index.max_probe)

    def rc(s):
        return s[::-1].translate(str.maketrans("ACGT", "TGCA"))

    reads = []
    for i in range(64):
        p = int(rng.integers(0, 8800))
        r = seq[p : p + 100]
        kind = i % 5
        if kind == 1:
            r = rc(r)
        elif kind == 2:
            rl = list(r)
            rl[int(rng.integers(0, 100))] = "ACGT"[int(rng.integers(0, 4))]
            r = "".join(rl)
        elif kind == 3:  # deletion -> complex row via write_record
            r = seq[p : p + 50] + seq[p + 53 : p + 103]
        elif kind == 4 and i % 10 == 4:  # junk -> unmapped
            r = "".join("ACGT"[c] for c in rng.integers(0, 4, size=100))
        reads.append((f"rd{i}", r))
    fq = tmp_path / "r.fq"
    fq.write_text(
        "".join(f"@{n}\n{r}\n+\n{'I' * len(r)}\n" for n, r in reads)
    )

    def run(allow_plan):
        aligner = SingleEndAligner(
            index, params, batch_size=32, max_read_len=128
        )
        if not allow_plan:
            aligner._plan_ok = lambda w: False
        sink = io.BytesIO()
        w = SamWriter(out=sink, genome=genome, command_line="t")
        aligner.align_file(str(fq), w)
        return sink.getvalue()

    assert run(True) == run(False)
