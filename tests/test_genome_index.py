"""Genome loading and index build/lookup correctness.

Mirrors the role of SNAP's index validation: every seed lookup must
return exactly the genome locations whose window matches the seed (or
its reverse complement), in descending order
(ref: GenomeIndex.cpp:878-884, lookupSeed GenomeIndex.cpp:2095-2328).
"""

import numpy as np
import pytest

from snap_tpu.genome import Genome, Contig, load_fasta, reverse_complement_codes
from snap_tpu.constants import BASE_ENCODE, PAD
from snap_tpu.index.build import (
    build_index,
    extract_canonical_seeds,
    pack_seeds,
)


def make_genome(seq: str, padding: int = 16) -> Genome:
    codes = BASE_ENCODE[np.frombuffer(seq.encode(), dtype=np.uint8)]
    bases = np.full(len(seq) + 2 * padding, PAD, dtype=np.uint8)
    bases[padding : padding + len(seq)] = codes
    return Genome(
        bases=bases,
        contigs=[Contig(name="test", start=padding, length=len(seq))],
    )


def test_load_fasta(tmp_path):
    fa = tmp_path / "g.fa"
    fa.write_text(">c1 description\nACGTACGT\nGGGG\n>c2\nTTTT\n")
    g = load_fasta(str(fa), chromosome_padding=10)
    assert [c.name for c in g.contigs] == ["c1", "c2"]
    c1, c2 = g.contigs
    assert c1.length == 12 and c2.length == 4
    assert g.decode(c1.start, 12) == "ACGTACGTGGGG"
    assert g.decode(c2.start, 4) == "TTTT"
    # padding between contigs is lowercase-n-equivalent (PAD code)
    assert np.all(g.bases[c1.start + c1.length : c2.start] == PAD)
    # SNAP layout: first contig at exactly chromosome_padding
    assert c1.start == 10


def test_alt_reordering(tmp_path):
    fa = tmp_path / "g.fa"
    fa.write_text(">chr1_alt\nACGTACGTAC\n>chr1\nTTTTGGGGCC\n")
    g = load_fasta(str(fa), chromosome_padding=4)
    assert [c.name for c in g.contigs] == ["chr1", "chr1_alt"]
    assert g.contigs[0].is_alt is False
    assert g.contigs[1].is_alt is True
    assert g.contigs[0].original_index == 1  # original FASTA order retained


def test_pack_seeds_rc():
    seq = "ACGTTGCANACGT"
    g = make_genome(seq)
    bases = np.asarray(g.bases)
    pos = np.arange(16, 16 + len(seq) - 4 + 1, dtype=np.int64)
    fwd, rc, valid = pack_seeds(bases, pos, 4)
    # seed at 0: ACGT -> 0b00011011 = 0x1B; its RC is also ACGT
    assert fwd[0] == 0x1B and rc[0] == 0x1B
    # seed "CGTT": fwd = C,G,T,T = 01 10 11 11; rc = AACG = 00 00 01 10
    assert fwd[1] == 0b01101111
    assert rc[1] == 0b00000110
    # any window containing the N at offset 8 is invalid
    for p in range(5, 9):
        assert not valid[p]
    assert valid[0] and valid[9]


def brute_force_hits(bases: np.ndarray, seed_codes: np.ndarray):
    """All locations where seed matches forward / reverse-complement."""
    s = len(seed_codes)
    rc = reverse_complement_codes(seed_codes)
    fwd_locs, rc_locs = [], []
    for p in range(len(bases) - s + 1):
        w = bases[p : p + s]
        if np.any(w >= 4):
            continue
        if np.array_equal(w, seed_codes):
            fwd_locs.append(p)
        if np.array_equal(w, rc):
            rc_locs.append(p)
    return sorted(fwd_locs, reverse=True), sorted(rc_locs, reverse=True)


def test_index_lookup_matches_brute_force():
    rng = np.random.default_rng(0)
    seq = "".join("ACGT"[i] for i in rng.integers(0, 4, size=3000))
    g = make_genome(seq)
    seed_len = 8  # short seed => plenty of multi-hit lists
    idx = build_index(g, seed_len=seed_len)

    import jax.numpy as jnp

    from snap_tpu.index.index import DeviceIndex, probe, gather_hits

    dev = DeviceIndex(
        table=jnp.asarray(idx["table"]),
        hits=jnp.asarray(idx["hits"]),
        genome=jnp.asarray(np.asarray(g.bases)),
    )  # no packed genome: exercises the full-DP fallback path

    bases = np.asarray(g.bases)
    test_positions = rng.integers(16, 16 + len(seq) - seed_len, size=40)
    for p in test_positions:
        seed_codes = bases[p : p + seed_len]
        fwd_expected, rc_expected = brute_force_hits(bases, seed_codes)

        fwd, rc, valid = pack_seeds(bases, np.array([p]), seed_len)
        assert valid[0]
        canonical = min(fwd[0], rc[0])
        read_is_canonical = fwd[0] <= rc[0]

        found, start, n0, n1 = probe(
            dev, jnp.asarray([canonical]), idx["max_probe"]
        )
        assert bool(found[0])
        # orientation 0 list = genome seeds equal to canonical
        locs0, v0 = gather_hits(dev.hits, start, n0, cap=64)
        locs1, v1 = gather_hits(dev.hits, start + n0.astype(jnp.int64), n1, cap=64)
        l0 = np.asarray(locs0[0])[np.asarray(v0[0])].tolist()
        l1 = np.asarray(locs1[0])[np.asarray(v1[0])].tolist()
        if read_is_canonical:
            got_fwd, got_rc = l0, l1
        else:
            got_fwd, got_rc = l1, l0
        assert got_fwd == fwd_expected, f"fwd mismatch at {p}"
        assert got_rc == rc_expected, f"rc mismatch at {p}"


def test_extract_canonical_counts():
    g = make_genome("ACGTACGTACGT")
    keys, orient, locs = extract_canonical_seeds(g, seed_len=4)
    # 9 valid positions (12 - 4 + 1), all windows ACGT-ish, no Ns
    assert len(keys) == 9
    assert np.all(np.sort(locs) == np.arange(16, 25))
