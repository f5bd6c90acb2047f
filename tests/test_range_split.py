"""RangeSplitter parallel FASTQ input (io/range_split.py).

Behavioral reference: RangeSplitter.h:38 byte-range work division +
FASTQ.cpp record-boundary snapping ('@' disambiguated by the '+' line
two below). Parallel parse must reproduce the single-reader stream
exactly, in order, including records that straddle range boundaries
and quality strings that start with '@'.
"""

import numpy as np
import pytest

from snap_tpu.io import native as native_io
from snap_tpu.io.fastq import read_batches
from snap_tpu.io.range_split import (
    parallel_read_batches,
    split_fastq_ranges,
)


def _write_fastq(path, n, rng):
    with open(path, "wb") as f:
        for i in range(n):
            ln = int(rng.integers(40, 120))
            seq = np.frombuffer(b"ACGT", np.uint8)[
                rng.integers(0, 4, ln)
            ].tobytes()
            # qualities deliberately include '@' and '+' first chars
            q = bytes(int(x) for x in rng.integers(33, 74, ln))
            if i % 3 == 0:
                q = b"@" + q[1:]
            elif i % 3 == 1:
                q = b"+" + q[1:]
            f.write(b"@read%d some comment\n%s\n+\n%s\n" % (i, seq, q))


def _drain(it):
    ids, seqs = [], []
    for b in it:
        for j in range(len(b)):
            ids.append(bytes(b.ids[j]))
            L = int(b.lengths[j])
            seqs.append(b.bases[j, :L].tobytes() + b.quals[j, :L].tobytes())
    return ids, seqs


@pytest.mark.skipif(not native_io.available(), reason="native runtime absent")
@pytest.mark.parametrize("threads", [2, 3, 5])
def test_parallel_matches_serial(tmp_path, threads):
    rng = np.random.default_rng(threads)
    fq = tmp_path / "r.fq"
    _write_fastq(str(fq), 257, rng)
    ranges = split_fastq_ranges(str(fq), threads)
    assert ranges[0][0] == 0
    assert ranges[-1][1] == fq.stat().st_size
    for (a0, a1), (b0, b1) in zip(ranges, ranges[1:]):
        assert a1 == b0
    want = _drain(read_batches(str(fq), batch_size=64, max_len=128))
    got = _drain(
        parallel_read_batches(
            str(fq), batch_size=64, max_len=128, threads=threads
        )
    )
    assert got == want


@pytest.mark.skipif(not native_io.available(), reason="native runtime absent")
def test_boundary_snapping_on_at_quality(tmp_path):
    """A range cut landing inside a record whose quality line starts
    with '@' must not create a phantom record start."""
    rng = np.random.default_rng(0)
    fq = tmp_path / "r.fq"
    _write_fastq(str(fq), 40, rng)
    size = fq.stat().st_size
    for n in range(2, 9):
        ranges = split_fastq_ranges(str(fq), n)
        total = sum(
            len(
                _drain(
                    parallel_read_batches(
                        str(fq), batch_size=7, max_len=128, threads=n
                    )
                )[0]
            )
            for _ in (0,)
        )
        assert total == 40, (n, ranges, size)
