"""Long-read (snapxl analogue) exercise: max_k beyond the short-read
MAX_K=127 and kbp-scale reads through the full CLI.

Behavioral reference: the snapxl build (Makefile:79-83) raises
MAX_K to 1000 and MAX_READ_LENGTH to 20000 (LandauVishkin.h:8-12,
Read.h:47-49); -dp caps per-read edit distance as a fraction of read
length (SingleAligner.cpp:243-248). Here max_k is a runtime parameter,
so the "rebuild" is just flags: -rl raises the read-length budget and
-d/-i the distance budgets, and shapes that exceed the Pallas kernels'
packed column-bit budgets fall back to the jnp recurrences
(pipeline.py long-read fallback).
"""

import numpy as np
import pytest

import snap_tpu  # noqa: F401  (x64 on)


def test_fitting_dp_beyond_short_read_max_k():
    """Edit distances > 127 (the reference's non-XL MAX_K) are exact."""
    import jax.numpy as jnp

    from snap_tpu.ops.dp import fitting_edit_distance

    rng = np.random.default_rng(0)
    L = 1200
    text_codes = rng.integers(0, 4, size=L + 40).astype(np.uint8)
    pat = text_codes[20 : 20 + L].copy()
    # plant 180 mismatches, spaced so no two merge into one indel-run
    mism = np.arange(5, 5 + 180 * 6, 6)
    pat[mism] = (pat[mism] + 1) % 4
    logq = np.full((1, L), np.log(1e-3), np.float32)
    res = fitting_edit_distance(
        jnp.asarray(pat[None, :]),
        jnp.asarray(logq),
        jnp.asarray(np.array([L], np.int32)),
        jnp.asarray(text_codes[None, :]),
    )
    assert int(res.dist[0]) == 180


@pytest.mark.parametrize("read_len", [1500])
def test_long_read_cli(tmp_path, read_len):
    """kbp-scale reads align end-to-end through the CLI with raised
    budgets: a clean read, a 2%-SNP read, and a 30bp-deletion read all
    place at their true loci."""
    from snap_tpu.cli import main

    rng = np.random.default_rng(7)
    glen = 60000
    codes = rng.integers(0, 4, size=glen).astype(np.uint8)
    DEC = np.frombuffer(b"ACGT", np.uint8)
    seq = DEC[codes].tobytes().decode()

    fa = tmp_path / "g.fa"
    with open(fa, "w") as f:
        f.write(">chr1\n")
        for i in range(0, glen, 70):
            f.write(seq[i : i + 70] + "\n")
    idx = tmp_path / "idx"
    assert main(["index", str(fa), str(idx), "-s", "24"]) == 0

    starts = [5000, 20000, 40000]
    reads = []
    # clean
    reads.append(codes[starts[0] : starts[0] + read_len])
    # 2% SNPs (30 edits at 1500bp — over a fifth of the default -d 27)
    r = codes[starts[1] : starts[1] + read_len].copy()
    snp = rng.choice(read_len, size=read_len // 50, replace=False)
    r[snp] = (r[snp] + 1) % 4
    reads.append(r)
    # 30bp deletion mid-read (read skips 30 genome bases)
    g0 = starts[2]
    half = read_len // 2
    r = np.concatenate(
        [codes[g0 : g0 + half], codes[g0 + half + 30 : g0 + 30 + read_len]]
    )
    reads.append(r)

    fq = tmp_path / "r.fq"
    with open(fq, "w") as f:
        for i, r in enumerate(reads):
            f.write(
                f"@lr{i}\n{DEC[r].tobytes().decode()}\n+\n"
                + "I" * read_len + "\n"
            )

    out = tmp_path / "out.sam"
    assert main([
        "single", str(idx), str(fq), "-o", str(out), "-b", "4",
        "-rl", str(read_len), "-d", "160", "-i", "200",
        "-dp", "0.15", "-mrl", "100",
    ]) == 0

    recs = {}
    for ln in open(out):
        if ln.startswith("@"):
            continue
        t = ln.split("\t")
        recs[t[0]] = (int(t[1]), int(t[3]), t[5])
    assert len(recs) == 3
    for i, s in enumerate(starts):
        flag, pos, cigar = recs[f"lr{i}"]
        assert not flag & 0x4, f"lr{i} unmapped"
        assert abs(pos - (s + 1)) <= 2, (i, pos, s)
    # the deletion read's CIGAR carries the deletion
    assert "D" in recs["lr2"][2], recs["lr2"]


@pytest.mark.slow
def test_snapxl_20kb_max_k_1000(tmp_path):
    """The snapxl class itself: a 20kb read under a ~1000-edit budget
    (reference: Makefile:79-83 -DLONG_READS, LandauVishkin.h:8-12
    MAX_K=1000, Read.h:47-49 MAX_READ_LENGTH=20000). Runtime flags
    stand in for the reference's rebuild: -rl 20000 -d 1000 -i 1100.
    Exercises the jnp DP fallback (fori_loop over pattern rows, so the
    graph size is L-independent); a 2%-SNP read carries ~400 edits —
    far beyond the short-read MAX_K=127 — and a 200bp-deletion read
    must emit the deletion.
    """
    from snap_tpu.cli import main

    rng = np.random.default_rng(11)
    glen = 120_000
    read_len = 20_000
    codes = rng.integers(0, 4, size=glen).astype(np.uint8)
    DEC = np.frombuffer(b"ACGT", np.uint8)
    seq = DEC[codes].tobytes().decode()

    fa = tmp_path / "g.fa"
    with open(fa, "w") as f:
        f.write(">chr1\n")
        for i in range(0, glen, 70):
            f.write(seq[i : i + 70] + "\n")
    idx = tmp_path / "idx"
    assert main(["index", str(fa), str(idx), "-s", "24"]) == 0

    starts = [10_000, 60_000]
    reads = []
    # 2% SNPs: ~400 edits on 20kb
    r = codes[starts[0] : starts[0] + read_len].copy()
    snp = rng.choice(read_len, size=read_len // 50, replace=False)
    r[snp] = (r[snp] + 1) % 4
    reads.append(r)
    # 200bp deletion at the midpoint
    g0, half = starts[1], read_len // 2
    reads.append(np.concatenate([
        codes[g0 : g0 + half],
        codes[g0 + half + 200 : g0 + 200 + read_len],
    ]))

    fq = tmp_path / "r.fq"
    with open(fq, "w") as f:
        for i, r in enumerate(reads):
            f.write(
                f"@xl{i}\n{DEC[r].tobytes().decode()}\n+\n"
                + "I" * read_len + "\n"
            )

    out = tmp_path / "out.sam"
    assert main([
        "single", str(idx), str(fq), "-o", str(out), "-b", "2",
        "-rl", str(read_len), "-d", "1000", "-i", "1100",
        "-dp", "0.15", "-mrl", "100",
    ]) == 0

    recs = {}
    for ln in open(out):
        if ln.startswith("@"):
            continue
        t = ln.split("\t")
        recs[t[0]] = (int(t[1]), int(t[3]), t[5])
    assert len(recs) == 2
    for i, s in enumerate(starts):
        flag, pos, _cig = recs[f"xl{i}"]
        assert not flag & 0x4, f"xl{i} unmapped"
        assert abs(pos - (s + 1)) <= 2, (i, pos, s)
    assert "D" in recs["xl1"][2], recs["xl1"]
