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
