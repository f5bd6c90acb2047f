"""GenericFile family (ref: GenericFile.cpp:108 factory,
GenericFile_stdio/_Blob/_map, GenericFile_HDFS behind -DSNAP_HDFS)."""

import gzip
import os

import numpy as np
import pytest

from snap_tpu.io.genericfile import (
    BlobFile,
    exists_generic,
    open_generic,
    open_mapped,
    register_scheme,
    _SCHEMES,
)


def test_plain_and_gzip(tmp_path):
    p = tmp_path / "a.txt"
    p.write_bytes(b"hello\nworld\n")
    with open_generic(str(p)) as f:
        assert f.read() == b"hello\nworld\n"
    gz = tmp_path / "a.txt.gz"
    with gzip.open(gz, "wb") as f:
        f.write(b"zipped")
    with open_generic(str(gz)) as f:
        assert f.read() == b"zipped"
    # explicit override: read the raw gzip bytes
    with open_generic(str(gz), gzipped=False) as f:
        assert f.read(2) == b"\x1f\x8b"


def test_file_scheme(tmp_path):
    p = tmp_path / "b.txt"
    p.write_bytes(b"via-url")
    with open_generic("file://" + str(p)) as f:
        assert f.read() == b"via-url"
    assert exists_generic("file://" + str(p))
    assert not exists_generic("file://" + str(p) + ".nope")


def test_blob_and_mmap(tmp_path):
    b = BlobFile(b"in-memory image")
    assert b.read(9) == b"in-memory"
    p = tmp_path / "m.bin"
    p.write_bytes(bytes(range(64)))
    m = open_mapped(str(p))
    assert bytes(m[:4]) == b"\x00\x01\x02\x03"
    assert np.frombuffer(m, np.uint8)[63] == 63
    m.close()


def test_unregistered_scheme_is_instructive():
    with pytest.raises(IOError, match="register_scheme"):
        open_generic("hdfs://nn/part0.fa")
    assert not exists_generic("hdfs://nn/part0.fa")


def test_registered_scheme(tmp_path):
    p = tmp_path / "remote.bin"
    p.write_bytes(b"remote payload")

    def fake_opener(url, mode):
        assert url.startswith("fake://")
        return open(str(p), mode)

    register_scheme("fake", fake_opener)
    try:
        with open_generic("fake://bucket/remote.bin") as f:
            assert f.read() == b"remote payload"
        assert exists_generic("fake://anything")
    finally:
        _SCHEMES.pop("fake", None)


def test_fasta_loader_goes_through_factory(tmp_path):
    from snap_tpu.genome import load_fasta

    p = tmp_path / "g.fa.gz"
    with gzip.open(p, "wb") as f:
        f.write(b">c1 desc\nACGTACGT\n")
    g = load_fasta("file://" + str(p))
    assert g.contigs[0].name == "c1" and g.contigs[0].length == 8


def _loopback_server(root):
    """Serve `root` over HTTP on an ephemeral loopback port."""
    import functools
    import http.server
    import threading

    handler = functools.partial(
        http.server.SimpleHTTPRequestHandler, directory=str(root)
    )
    httpd = http.server.ThreadingHTTPServer(("127.0.0.1", 0), handler)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    return httpd, f"http://127.0.0.1:{httpd.server_address[1]}"


def test_http_scheme_ships_by_default(tmp_path):
    """The GenericFile_HDFS analogue: http(s):// reads work out of the
    box (GenericFile_HDFS.cpp:160-238 is likewise a sequential-read
    remote handler), including transparent .gz decompression."""
    (tmp_path / "r.fq").write_bytes(b"@r1\nACGT\n+\nIIII\n")
    with gzip.open(tmp_path / "r.fq.gz", "wb") as f:
        f.write(b"@r2\nTTTT\n+\nIIII\n")
    httpd, base = _loopback_server(tmp_path)
    try:
        with open_generic(f"{base}/r.fq") as f:
            assert f.read() == b"@r1\nACGT\n+\nIIII\n"
        with open_generic(f"{base}/r.fq.gz") as f:
            assert f.read() == b"@r2\nTTTT\n+\nIIII\n"
        with pytest.raises(IOError, match="read-only"):
            open_generic(f"{base}/out.sam", "wb")
    finally:
        httpd.shutdown()


def test_http_fastq_input_end_to_end(tmp_path):
    """A FASTQ served over HTTP flows through the production batch
    reader (io/fastq.single_batches -> native scanner on the stream)."""
    from snap_tpu.io.fastq import read_batches

    recs = b"".join(
        b"@q%d\nACGTACGTAC\n+\nIIIIIIIIII\n" % i for i in range(7)
    )
    (tmp_path / "in.fq").write_bytes(recs)
    httpd, base = _loopback_server(tmp_path)
    try:
        batches = list(read_batches(f"{base}/in.fq", 4, 16))
        ids = [i for b in batches for i in b.ids]
        assert len(ids) == 7 and ids[0] == b"q0" and ids[-1] == b"q6"
    finally:
        httpd.shutdown()
