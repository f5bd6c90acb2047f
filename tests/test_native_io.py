"""Native host-I/O runtime (native/snapio.cpp via ctypes).

Behavioral reference: the reference's C++ I/O stack — FASTQReader
(FASTQ.cpp), BGZF writer with parallel compression (GzipDataWriter.cpp:
233-340). The pure-Python fallbacks must agree with the native paths.
"""

import gzip

import numpy as np
import pytest

from snap_tpu.io import native

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library unavailable"
)


def test_parse_fastq_buffer_matches_python():
    buf = (
        b"@r1 with comment\nACGTNACGT\n+\nIIIIIIIII\n"
        b"@r2\nacgtn\n+anything\nJJJJJ\n"
        b"@r3_incomplete\nACGT\n+\nII"  # truncated quality (len < seq)
    )
    n, bases, quals, lens, ids, consumed = native.parse_fastq_buffer(
        buf, 10, 12
    )
    assert n == 2
    assert ids == [b"r1 with comment", b"r2"]
    assert lens.tolist() == [9, 5]
    assert bases[0, :9].tolist() == [0, 1, 2, 3, 4, 0, 1, 2, 3]
    # lowercase n maps to pad code 5 like the FASTA loader
    assert bases[1, :5].tolist() == [0, 1, 2, 3, 5]
    assert quals[1, :5].tolist() == [ord("J")] * 5
    # padding beyond length
    assert bases[0, 9:].tolist() == [4, 4, 4]
    assert quals[0, 9:].tolist() == [0, 0, 0]
    # consumed stops before the incomplete record
    assert buf[consumed:].startswith(b"@r3_incomplete")


def test_parse_fastq_max_len_clamp():
    buf = b"@r\n" + b"A" * 300 + b"\n+\n" + b"I" * 300 + b"\n"
    n, bases, quals, lens, ids, consumed = native.parse_fastq_buffer(
        buf, 4, 100
    )
    assert n == 1 and lens[0] == 100
    assert consumed == len(buf)


def test_parse_fastq_malformed():
    with pytest.raises(ValueError):
        native.parse_fastq_buffer(b"not a fastq\nACGT\n+\nIIII\n", 4, 10)


def test_bgzf_compress_roundtrip():
    data = (b"SNAP-class BAM payload " * 50000)[: 3 * 65280 + 1234]
    comp = native.bgzf_compress(data, level=6, n_threads=3, add_eof=True)
    assert gzip.decompress(comp) == data
    # every member must be a valid BGZF block with the BC extra field
    off, blocks = 0, 0
    while off < len(comp):
        assert comp[off : off + 4] == b"\x1f\x8b\x08\x04"
        assert comp[off + 12 : off + 14] == b"BC"
        bsize = int.from_bytes(comp[off + 16 : off + 18], "little") + 1
        assert bsize <= 65536
        off += bsize
        blocks += 1
    assert off == len(comp)
    assert blocks == 5  # 4 data blocks + EOF marker


def test_bgzf_empty_with_eof():
    comp = native.bgzf_compress(b"", add_eof=True)
    assert len(comp) == 28
    assert gzip.decompress(comp) == b""
