"""Companion apps + driver features: tofastq, roc, daemon/command,
multi-run comma syntax, read groups (-rg/-R).

Behavioral reference: apps/ToFASTQ, apps/ComputeROC (ComputeROC.cpp),
daemon mode + SNAPCommand (CommandProcessor.cpp:104-174), multi-run
comma syntax (CommandProcessor.cpp:69-85), read group options
(AlignerOptions rgLineContents / defaultReadGroup).
"""

import os
import socket
import subprocess
import sys
import threading
import time

import numpy as np
import pytest

from snap_tpu.apps import parse_wgsim_id


def test_parse_wgsim_id():
    assert parse_wgsim_id(b"chr1_100_250_0:0:0_0:0:0_1/1") == (
        b"chr1", 100, 250,
    )
    # chromosome names may contain underscores
    assert parse_wgsim_id(b"chr6_alt_HLA_77_99_x") == (b"chr6_alt_HLA", 77, 99)
    assert parse_wgsim_id(b"read1") is None


def test_roc(tmp_path, capsys):
    from snap_tpu.apps import cmd_roc

    sam = tmp_path / "sim.sam"
    lines = [
        "@HD\tVN:1.6",
        "@SQ\tSN:chr1\tLN:10000",
        # correct: pos within 50 of offset A
        "chr1_100_250_a\t0\tchr1\t120\t70\t100M\t*\t0\t0\tACGT\tIIII",
        # correct via offset B
        "chr1_100_250_b\t16\tchr1\t240\t70\t100M\t*\t0\t0\tACGT\tIIII",
        # wrong position
        "chr1_100_250_c\t0\tchr1\t5000\t60\t100M\t*\t0\t0\tACGT\tIIII",
        # wrong chromosome
        "chr2_100_250_d\t0\tchr1\t100\t70\t100M\t*\t0\t0\tACGT\tIIII",
        # unaligned
        "chr1_100_250_e\t4\t*\t0\t0\t*\t*\t0\t0\tACGT\tIIII",
    ]
    sam.write_text("\n".join(lines) + "\n")
    assert cmd_roc([str(sam)]) == 0
    out = capsys.readouterr().out
    rows = {
        int(ln.split("\t")[0]): ln.split("\t")
        for ln in out.splitlines()
        if ln and ln[0].isdigit()
    }
    assert rows[70][1] == "3" and rows[70][2] == "1"  # 3 reads, 1 wrong @70
    assert rows[60][1] == "1" and rows[60][2] == "1"


def test_tofastq(tmp_path):
    from snap_tpu.apps import cmd_tofastq

    sam = tmp_path / "in.sam"
    sam.write_text(
        "@SQ\tSN:chr1\tLN:100\n"
        "r1\t0\tchr1\t1\t70\t4M\t*\t0\t0\tACGT\tIIJJ\n"
        "r2\t16\tchr1\t5\t70\t4M\t*\t0\t0\tACGT\tIIJJ\n"   # RC restored
        "r3\t256\tchr1\t9\t0\t4M\t*\t0\t0\tACGT\tIIJJ\n"   # secondary skip
    )
    out = tmp_path / "out.fq"
    assert cmd_tofastq([str(sam), str(out)]) == 0
    recs = out.read_text().splitlines()
    assert recs[0] == "@r1" and recs[1] == "ACGT" and recs[3] == "IIJJ"
    assert recs[4] == "@r2" and recs[5] == "ACGT"[::-1].translate(
        str.maketrans("ACGT", "TGCA")
    )
    assert recs[7] == "JJII"
    assert len(recs) == 8  # r3 skipped


@pytest.fixture(scope="module")
def small_index(tmp_path_factory):
    from snap_tpu.cli import main

    rng = np.random.default_rng(5)
    seq = "".join("ACGT"[c] for c in rng.integers(0, 4, size=4000))
    tmp = tmp_path_factory.mktemp("appidx")
    fa = tmp / "g.fa"
    fa.write_text(f">chr1\n{seq}\n")
    idx = tmp / "idx"
    assert main(["index", str(fa), str(idx), "-s", "20"]) == 0
    fq = tmp / "r.fq"
    read = seq[1000:1100]
    fq.write_text(f"@r1\n{read}\n+\n{'I' * 100}\n")
    return idx, fq, tmp


def test_read_group_options(small_index, tmp_path):
    from snap_tpu.cli import main

    idx, fq, _ = small_index
    out = tmp_path / "rg.sam"
    assert main([
        "single", str(idx), str(fq), "-o", str(out),
        "-R", "@RG\\tID:mylib\\tSM:sample7\\tPL:torrent",
    ]) == 0
    text = out.read_text()
    assert "@RG\tID:mylib\tSM:sample7\tPL:torrent" in text
    body = [ln for ln in text.splitlines() if not ln.startswith("@")][0]
    assert "RG:Z:mylib" in body and "SM:Z:sample7" in body

    out2 = tmp_path / "rg2.sam"
    assert main([
        "single", str(idx), str(fq), "-o", str(out2), "-rg", "grp1",
    ]) == 0
    assert "@RG\tID:grp1\tPL:Illumina" in out2.read_text()


def test_multi_run_comma(small_index, tmp_path):
    from snap_tpu.cli import main

    idx, fq, _ = small_index
    o1, o2 = tmp_path / "m1.sam", tmp_path / "m2.sam"
    assert main([
        "single", str(idx), str(fq), "-o", str(o1),
        ",",
        "single", str(idx), str(fq), "-o", str(o2),
    ]) == 0
    b1 = [ln for ln in o1.read_text().splitlines() if not ln.startswith("@")]
    b2 = [ln for ln in o2.read_text().splitlines() if not ln.startswith("@")]
    # identical alignments, and the @PG CL differs per run
    assert [ln.split("\t")[3] for ln in b1] == [
        ln.split("\t")[3] for ln in b2
    ]


def test_daemon_roundtrip(small_index, tmp_path):
    """Daemon executes commands sent by the client and stays alive."""
    from snap_tpu import apps

    idx, fq, _ = small_index
    sock = str(tmp_path / "d.sock")
    srv = threading.Thread(
        target=apps.cmd_daemon, args=([sock],), daemon=True
    )
    srv.start()
    for _ in range(100):
        if os.path.exists(sock):
            break
        time.sleep(0.05)
    assert os.path.exists(sock)

    out = tmp_path / "daemon_out.sam"
    rc = apps.cmd_command([
        sock, "single", str(idx), str(fq), "-o", str(out),
    ])
    assert rc == 0
    assert out.exists()
    body = [
        ln for ln in out.read_text().splitlines() if not ln.startswith("@")
    ]
    assert len(body) == 1 and body[0].split("\t")[2] == "chr1"
    # shut down
    assert apps.cmd_command([sock, "exit"]) == 0
    srv.join(timeout=5)
    assert not srv.is_alive()


def test_depth_tool(small_index, tmp_path):
    """HitDepth analogue: per-locus min seed-hit depth histogram.

    On a random unique genome every locus is covered by some unique
    seed, so nearly all loci report depth 1 (SNAPLib/HitDepth.cpp's
    stated intent; the upstream tool never finished the computation)."""
    from snap_tpu.cli import main

    idx, _, _ = small_index
    out = tmp_path / "depth.tsv"
    assert main(["depth", str(idx), str(out)]) == 0
    rows = [
        ln.split("\t")
        for ln in out.read_text().splitlines()[1:]
        if ln.startswith("TOTAL\t")
    ]
    hist = {int(v): int(c) for _, v, c in rows}
    total_loci = sum(hist.values())
    assert total_loci == 4000
    # unique random genome: >99% of loci have a depth-1 seed
    assert hist.get(1, 0) >= 3950
