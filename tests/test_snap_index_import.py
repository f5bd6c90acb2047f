"""Importing reference SNAP on-disk index directories.

Builds a real index with the reference `snap-aligner` binary (compiled
on demand from /root/reference) and checks our importer reproduces the
exact per-seed hit lists of our own builder over the same FASTA.
Skipped when the reference toolchain isn't available.
"""

import os
import shutil
import subprocess

import numpy as np
import pytest

REF = "/root/reference"
BUILD = "/tmp/snapbuild"
DATATEST_FA = f"{REF}/tests/datatest/datatest.fa"


@pytest.fixture(scope="module")
def snap_binary():
    binary = os.path.join(BUILD, "snap-aligner")
    if not os.path.exists(binary):
        if not os.path.exists(REF) or shutil.which("make") is None:
            pytest.skip("reference source or make unavailable")
        if not os.path.exists(BUILD):
            shutil.copytree(REF, BUILD)
        r = subprocess.run(
            ["make", "-C", BUILD, "snap-aligner", "-j2"],
            capture_output=True, timeout=900,
        )
        if r.returncode != 0 or not os.path.exists(binary):
            pytest.skip("reference build failed")
    return binary


@pytest.fixture(scope="module")
def ref_index(snap_binary, tmp_path_factory):
    d = tmp_path_factory.mktemp("refidx")
    r = subprocess.run(
        [snap_binary, "index", DATATEST_FA, str(d), "-s", "16"],
        capture_output=True, timeout=300,
    )
    assert r.returncode == 0, r.stderr.decode()[-500:]
    return str(d)


def _hit_map(arrays):
    m = {}
    t = arrays["table"].reshape(-1, 4)
    h = arrays["hits"]
    occ = ~((t[:, 0] == 0xFFFFFFFF) & (t[:, 1] == 0xFFFFFFFF))
    for i in np.flatnonzero(occ):
        k = int(t[i, 0]) | (int(t[i, 1]) << 32)
        s = int(t[i, 2])
        n0 = int(t[i, 3]) & 0xFFFF
        n1 = int(t[i, 3]) >> 16
        m[k] = (
            h[s : s + n0].tolist(),
            h[s + n0 : s + n0 + n1].tolist(),
        )
    return m


def test_import_matches_native_build(ref_index):
    from snap_tpu.genome import load_fasta
    from snap_tpu.index.build import build_index
    from snap_tpu.index.snap_format import is_snap_index_dir, load_snap_index

    assert is_snap_index_dir(ref_index)
    genome, arrays = load_snap_index(ref_index)
    assert arrays["seed_len"] == 16
    assert [c.name for c in genome.contigs] == ["ref1"]

    ours = build_index(
        load_fasta(DATATEST_FA, chromosome_padding=2000), seed_len=16
    )
    m_imp, m_own = _hit_map(arrays), _hit_map(ours)
    assert set(m_imp) == set(m_own)
    # identical layout (padding before each contig): identical locations
    for k in m_imp:
        assert m_imp[k][0] == m_own[k][0], k
        assert m_imp[k][1] == m_own[k][1], k


def test_align_from_reference_index(ref_index, tmp_path):
    """GenomeIndex.load auto-detects the reference format; alignment
    lands both datatest reads at ref1:1 and ref1:102 like the golden."""
    from snap_tpu.cli import main

    out = tmp_path / "out.sam"
    rc = main([
        "single", ref_index, f"{REF}/tests/datatest/datatest.fq",
        "-o", str(out),
    ])
    assert rc == 0
    body = [
        ln.split("\t") for ln in out.read_text().splitlines()
        if not ln.startswith("@")
    ]
    assert [(r[2], r[3], r[4], r[5]) for r in body] == [
        ("ref1", "1", "70", "101M"),
        ("ref1", "102", "70", "101M"),
    ]
