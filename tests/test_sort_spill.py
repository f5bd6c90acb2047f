"""External sort spill (-sm): spilled output must equal in-memory output.

Behavioral reference: SNAP's SortedDataWriter temp-file blocks + merge
(SortedDataWriter.cpp:98-196,942-1235) with the -sm GB budget
(AlignerOptions.h:119), including duplicate marking across blocks.
"""

import io

import numpy as np
import pytest

from snap_tpu.genome import Contig, Genome
from snap_tpu.io.output import OutputWriter


def _genome():
    return Genome(
        bases=np.zeros(5000, dtype=np.uint8),
        contigs=[
            Contig(name="chr1", start=0, length=2000, original_index=0),
            Contig(name="chr2", start=2500, length=2000, original_index=1),
        ],
    )


def _write_records(w, rng, n=500):
    for i in range(n):
        contig = "chr1" if rng.random() < 0.5 else "chr2"
        pos = int(rng.integers(1, 1900))
        # a fixed pool of positions so duplicates occur
        if i % 7 == 0:
            pos = 100
            contig = "chr1"
        seq = "".join(
            "ACGT"[c] for c in rng.integers(0, 4, size=20)
        ).encode()
        qual = bytes(int(q) for q in rng.integers(40, 70, size=20))
        w.write_record(
            b"r%d" % i, 0, contig, pos, 60, "20M", seq, qual, nm=0
        )


def _sam_lines(buf):
    return [
        ln for ln in buf.getvalue().decode().splitlines()
        if not ln.startswith("@")
    ]


@pytest.mark.parametrize("mark_dups", [False, True])
def test_spill_matches_in_memory(mark_dups):
    g = _genome()

    buf_mem = io.BytesIO()
    w_mem = OutputWriter(
        out=buf_mem, genome=g, sort=True, mark_duplicates=mark_dups,
    )
    rng = np.random.default_rng(42)
    _write_records(w_mem, rng)
    w_mem.close()

    buf_sp = io.BytesIO()
    w_sp = OutputWriter(
        out=buf_sp, genome=g, sort=True, mark_duplicates=mark_dups,
        sort_memory_mb=0,  # spill after every record batch (~immediately)
    )
    rng = np.random.default_rng(42)
    _write_records(w_sp, rng)
    assert len(w_sp._spill_files) > 1  # it actually spilled
    w_sp.close()

    mem = _sam_lines(buf_mem)
    sp = _sam_lines(buf_sp)
    assert len(mem) == len(sp) == 500

    def keyed(lines):
        # (rname, pos) must be non-decreasing in contig order
        out = []
        for ln in lines:
            t = ln.split("\t")
            out.append((t[2], int(t[3]), t[0], int(t[1])))
        return out

    km, ks = keyed(mem), keyed(sp)
    assert [(r, p) for r, p, _, _ in km] == [(r, p) for r, p, _, _ in ks]
    # duplicate flags agree per read name
    fm = {q: f for _, _, q, f in km}
    fs = {q: f for _, _, q, f in ks}
    assert fm == fs
    if mark_dups:
        ndups = sum(1 for f in fm.values() if f & 0x400)
        assert ndups >= 60  # the i%7 pileup at chr1:100 got marked


def test_spill_bam_with_index(tmp_path):
    g = _genome()
    out_path = tmp_path / "x.bam"
    with open(out_path, "wb") as fh:
        w = OutputWriter(
            out=fh, genome=g, bam=True, sort=True, mark_duplicates=True,
            build_bai=True, bai_path=str(out_path) + ".bai",
            sort_memory_mb=0,
        )
        rng = np.random.default_rng(7)
        _write_records(w, rng, n=200)
        w.close()
    from snap_tpu.io.bam import read_bam

    _, refs, records = read_bam(str(out_path))
    assert len(records) == 200
    poss = [(r.ref_id, r.pos0) for r in records]
    assert poss == sorted(poss)
    assert (tmp_path / "x.bam.bai").exists()
