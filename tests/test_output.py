"""Output pipeline: BGZF, BAM encode/decode, sort order, dup marking."""

import io

import numpy as np

from snap_tpu.genome import Genome, Contig
from snap_tpu.constants import PAD
from snap_tpu.io.bgzf import BgzfWriter, compress_block, decompress_all
from snap_tpu.io.bam import encode_record, encode_tags, read_bam, reg2bin
from snap_tpu.io.output import OutputWriter, unclipped_5prime, OutRecord


def make_genome():
    bases = np.full(3000, PAD, dtype=np.uint8)
    return Genome(
        bases=bases,
        contigs=[
            Contig(name="c1", start=100, length=1000, original_index=0),
            Contig(name="c2", start=1200, length=1000, original_index=1),
        ],
    )


def test_bgzf_roundtrip():
    buf = io.BytesIO()
    w = BgzfWriter(buf)
    data = bytes(range(256)) * 1000
    w.write(data)
    w.close()
    assert decompress_all(buf.getvalue()) == data


def test_bgzf_eof_marker():
    buf = io.BytesIO()
    BgzfWriter(buf).close()
    assert buf.getvalue().endswith(
        bytes.fromhex("1f8b08040000000000ff0600424302001b0003000000000000000000")
    )


def test_reg2bin():
    assert reg2bin(0, 1) == 4681
    assert reg2bin(0, 1 << 14) == 4681
    assert reg2bin(0, (1 << 14) + 1) == 585
    assert reg2bin(-1, 0) == 4680


def write_and_read(records, genome, sort=False, mark=False):
    buf = io.BytesIO()
    w = OutputWriter(
        buf, genome, bam=True, sort=sort, mark_duplicates=mark,
        build_bai=False,
    )
    for r in records:
        w.write_record(*r)
    w.close()
    import tempfile, os

    with tempfile.NamedTemporaryFile(suffix=".bam", delete=False) as f:
        f.write(buf.getvalue())
        path = f.name
    try:
        return read_bam(path)
    finally:
        os.unlink(path)


def test_bam_roundtrip_and_sort():
    g = make_genome()
    recs = [
        (b"r1", 0, "c2", 50, 60, "10M", b"ACGTACGTAC", b"IIIIIIIIII", 0),
        (b"r2", 16, "c1", 200, 60, "8M2S", b"ACGTACGTAC", b"IIIIIIIIII", 1),
        (b"r3", 4, "*", 0, 0, "*", b"ACGTACGTAC", b"IIIIIIIIII", None),
        (b"r4", 0, "c1", 10, 60, "10M", b"ACGTACGTAC", b"IIIIIIIIII", 0),
    ]
    _, refs, out = write_and_read(recs, g, sort=True)
    assert refs == ["c1", "c2"]
    # sorted: c1:10, c1:200, c2:50, unmapped last
    assert [r.qname for r in out] == [b"r4", b"r2", b"r1", b"r3"]
    assert out[0].pos0 == 9
    # RC record seq is reverse-complemented in output orientation
    assert out[1].seq == b"GTACGTACGT"
    assert out[3].ref_id == -1 and out[3].pos0 == -1


def test_dup_marking():
    g = make_genome()
    # three exact duplicates (same 5' start, fwd), different qual sums
    recs = [
        (b"d0", 0, "c1", 100, 60, "10M", b"ACGTACGTAC", b"I" * 10, 0),
        (b"d1", 0, "c1", 100, 60, "10M", b"ACGTACGTAC", b"J" * 10, 0),  # best
        (b"d2", 0, "c1", 100, 60, "10M", b"ACGTACGTAC", b"5" * 10, 0),
        # soft-clipped read whose unclipped start is also 100
        (b"d3", 0, "c1", 102, 60, "2S8M", b"ACGTACGTAC", b"A" * 10, 0),
        (b"x", 0, "c1", 500, 60, "10M", b"ACGTACGTAC", b"I" * 10, 0),
    ]
    _, _, out = write_and_read(recs, g, sort=True, mark=True)
    flags = {r.qname: r.flag for r in out}
    assert flags[b"d1"] & 0x400 == 0
    assert flags[b"d0"] & 0x400
    assert flags[b"d2"] & 0x400
    assert flags[b"d3"] & 0x400
    assert flags[b"x"] & 0x400 == 0


def test_unclipped_5prime_rc():
    rec = OutRecord(
        qname=b"r", flag=16, rname="c1", pos=100, mapq=60,
        cigar="2S8M3S", rnext="*", pnext=0, tlen=0, seq=b"A" * 13,
        qual=b"I" * 13, nm=0,
    )
    # RC: 5' end = pos + refspan - 1 + back clip = 100 + 8 - 1 + 3
    assert unclipped_5prime(rec) == 110


def test_streaming_unsorted_bam(tmp_path):
    """Unsorted BAM streams through the writer (no buffering until
    close) and reads back identically via the streaming reader."""
    g = make_genome()
    path = tmp_path / "u.bam"
    with open(path, "wb") as out:
        w = OutputWriter(out=out, genome=g, bam=True, sort=False)
        w.write_header()
        assert w._bw is not None  # streaming: writer exists up front
        recs = [
            (b"r1", 0, "c2", 50, 60, "10M", b"ACGTACGTAC", b"IIIIIIIIII", 0),
            (b"r2", 0, "c1", 10, 60, "10M", b"ACGTACGTAC", b"IIIIIIIIII", 0),
        ]
        for r in recs:
            w.write_record(*r)
            assert not w._records  # nothing buffered
        w.close()
    from snap_tpu.io.bam import open_bam_stream, read_bam as _rb

    _, refs, it = open_bam_stream(str(path))
    stream_recs = list(it)
    # write order preserved (GO:query), not position-sorted
    assert [r.qname for r in stream_recs] == [b"r1", b"r2"]
    _, _, whole = _rb(str(path))
    assert [(r.qname, r.pos0) for r in whole] == [
        (r.qname, r.pos0) for r in stream_recs
    ]


def test_paired_matcher_quick_drop_and_ku(tmp_path):
    """Default: paired SAM records without RNEXT/PNEXT are quickly
    dropped; -ku keeps them for QNAME matching
    (PairedReadMatcher.cpp:247-258)."""
    from snap_tpu.io.readers import paired_batches

    sam = tmp_path / "in.sam"
    # p1: proper mate info on both ends; p2: RNEXT/PNEXT empty
    lines = [
        "@HD\tVN:1.6",
        "@SQ\tSN:c1\tLN:1000",
        "p1\t65\tc1\t10\t60\t5M\t=\t50\t45\tACGTA\tIIIII",
        "p1\t129\tc1\t50\t60\t5M\t=\t10\t-45\tTTGCA\tIIIII",
        "p2\t65\tc1\t99\t60\t5M\t*\t0\t0\tCCCCC\tIIIII",
        "p2\t129\tc1\t120\t60\t5M\t*\t0\t0\tGGGGG\tIIIII",
    ]
    sam.write_text("\n".join(lines) + "\n")

    got = list(paired_batches(str(sam), None, batch_size=8, max_len=16))
    ids = [i for b0, _ in got for i in b0.ids]
    assert ids == [b"p1"]  # p2 quickly dropped

    got_ku = list(
        paired_batches(
            str(sam), None, batch_size=8, max_len=16, keep_unpaired=True
        )
    )
    ids_ku = sorted(i for b0, _ in got_ku for i in b0.ids)
    assert ids_ku == [b"p1", b"p2"]


def test_sam_input_aux_passthrough(tmp_path):
    """Input SAM aux fields ride through to the output record ahead of
    our own tags (SAM.cpp:1854-1875); BAM aux is not translated."""
    import numpy as np

    from snap_tpu.align.pipeline import AlignParams
    from snap_tpu.align.single import SingleEndAligner
    from snap_tpu.index.index import GenomeIndex
    from snap_tpu.io.sam import SamWriter

    rng = np.random.default_rng(11)
    g = 6000
    codes = rng.integers(0, 4, size=g).astype(np.uint8)
    DEC = np.frombuffer(b"ACGT", np.uint8)
    seq = DEC[codes].tobytes().decode()
    from snap_tpu.constants import PAD
    from snap_tpu.genome import Contig, Genome

    bases = np.full(g + 4000, PAD, dtype=np.uint8)
    bases[2000 : 2000 + g] = codes
    genome = Genome(
        bases=bases, contigs=[Contig(name="c1", start=2000, length=g)]
    )
    index = GenomeIndex.build(genome, 20)

    read = seq[1000:1100]
    sam_in = tmp_path / "in.sam"
    sam_in.write_text(
        "@HD\tVN:1.6\n@SQ\tSN:c1\tLN:6000\n"
        f"r1\t0\tc1\t1001\t60\t100M\t*\t0\t0\t{read}\t{'I' * 100}\t"
        "XA:Z:keepme\tBC:Z:ACGT\n"
    )
    params = AlignParams(seed_len=20, max_probe=index.max_probe)
    aligner = SingleEndAligner(index, params, batch_size=4, max_read_len=100)
    out = tmp_path / "out.sam"
    with open(out, "wb") as f:
        w = SamWriter(out=f, genome=genome, command_line="t")
        aligner.align_file(str(sam_in), w)
    body = [
        ln for ln in out.read_text().splitlines() if not ln.startswith("@")
    ]
    assert len(body) == 1
    fields = body[0].split("\t")
    # aux fields come first after QUAL, in input order
    assert fields[11] == "XA:Z:keepme" and fields[12] == "BC:Z:ACGT"
    assert any(f.startswith("PG:Z:") for f in fields[13:])
