"""BufferedAsync analogue (ref: BufferedAsync.h:1-66 double-buffered
reader/writer on AsyncFile)."""

import io
import threading

import pytest

from snap_tpu.io.bufferedasync import BufferedAsyncReader, BufferedAsyncWriter


def test_writer_roundtrip(tmp_path):
    p = tmp_path / "o.bin"
    payload = bytes(range(256)) * 5000  # > one 4MB buffer? no: 1.28MB
    with open(p, "wb") as raw:
        w = BufferedAsyncWriter(raw, buffer_size=4096, depth=3)
        mv = memoryview(payload)
        for i in range(0, len(payload), 1000):
            w.write(mv[i : i + 1000])
        w.close()
    assert p.read_bytes() == payload


def test_writer_flush_midstream(tmp_path):
    p = tmp_path / "f.bin"
    raw = open(p, "wb")
    w = BufferedAsyncWriter(raw, buffer_size=1 << 20)
    w.write(b"abc")
    w.flush()
    assert p.read_bytes() == b"abc"
    w.write(b"def")
    w.close()
    raw.close()
    assert p.read_bytes() == b"abcdef"


def test_writer_propagates_errors():
    class Boom(io.RawIOBase):
        def write(self, b):
            raise OSError("disk full")

    w = BufferedAsyncWriter(Boom(), buffer_size=1)
    with pytest.raises(OSError, match="disk full"):
        # the failure surfaces on a subsequent write or at close
        for _ in range(100):
            w.write(b"x")
        w.close()


def test_writer_backpressure_bounded():
    """At most `depth` buffers are ever in flight (double buffering)."""
    gate = threading.Event()
    seen = []

    class Slow(io.RawIOBase):
        def write(self, b):
            gate.wait(5)
            seen.append(len(b))

    w = BufferedAsyncWriter(Slow(), buffer_size=10, depth=2)
    t = threading.Thread(
        target=lambda: [w.write(b"0123456789") for _ in range(5)]
    )
    t.start()
    t.join(0.5)
    # writer thread is stalled on the first buffer; producer must be
    # blocked after filling the queue (depth-1) + its own buffer
    assert t.is_alive()
    gate.set()
    t.join(5)
    assert not t.is_alive()
    w.close()
    assert sum(seen) == 50


def test_reader_chunks_and_read(tmp_path):
    p = tmp_path / "r.bin"
    data = b"0123456789abcdef" * 1000
    p.write_bytes(data)
    with open(p, "rb") as f:
        r = BufferedAsyncReader(f, chunk_size=100, depth=4)
        assert r.read(5) == b"01234"
        assert r.read(11) == b"56789abcdef"
        rest = r.read()
        assert b"01234" + b"56789abcdef" + rest == data
    with open(p, "rb") as f:
        r = BufferedAsyncReader(f, chunk_size=333)
        assert b"".join(r.chunks()) == data


def test_cli_output_identical_to_sync(tmp_path):
    """The async-wrapped CLI output byte-matches direct writer output."""
    import subprocess
    import sys

    fa = tmp_path / "g.fa"
    fa.write_text(">c1\n" + "ACGTTGCAAGGCTTAGCCGATT" * 40 + "\n")
    fq = tmp_path / "r.fq"
    seq = "ACGTTGCAAGGCTTAGCCGATT" * 4
    fq.write_text(f"@q1\n{seq}\n+\n{'I' * len(seq)}\n")
    env = {"JAX_PLATFORMS": "cpu", "PYTHONPATH": "/root/repo", "PATH": "/usr/bin:/bin:/usr/local/bin"}
    subprocess.run(
        [sys.executable, "-m", "snap_tpu.cli", "index", str(fa),
         str(tmp_path / "idx"), "-s", "16"],
        check=True, env=env, capture_output=True,
    )
    r1 = subprocess.run(
        [sys.executable, "-m", "snap_tpu.cli", "single",
         str(tmp_path / "idx"), str(fq), "-o", str(tmp_path / "o.sam")],
        check=True, env=env, capture_output=True,
    )
    r2 = subprocess.run(
        [sys.executable, "-m", "snap_tpu.cli", "single",
         str(tmp_path / "idx"), str(fq), "-o", "-"],
        check=True, env=env, capture_output=True,
    )
    # strip @PG (embeds the differing command line), like the reference's
    # golden diff does (tests/datatest.py:93-103)
    def body(b):
        return [l for l in b.splitlines() if not l.startswith(b"@PG")]

    assert body((tmp_path / "o.sam").read_bytes()) == body(r2.stdout)
