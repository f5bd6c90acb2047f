"""ALT-contig awareness: dual score sets, -ea supplementary, liftover.

Behavioral reference: SNAP's ALT handling — isGenomeLocationALT
(Genome.h:436-438), dual ScoreSets with maxScoreGapToPreferNonAltAlignment
(BaseAligner.cpp:1028-1056, 1766-1783), .alt liftover parsing
(GenomeIndex.cpp:315-423), getProjLocation
(IntersectingPairedEndAligner.cpp:2907-2920).
"""

import numpy as np
import pytest

from snap_tpu.constants import BASE_DECODE, PAD
from snap_tpu.genome import Contig, Genome, load_fasta, parse_alt_file
from snap_tpu.index.index import GenomeIndex
from snap_tpu.align.pipeline import AlignParams, align_single_device
from snap_tpu.align.post import finalize_read


def _write_fasta(tmp_path, contigs: dict[str, str]) -> str:
    p = tmp_path / "g.fa"
    with open(p, "w") as f:
        for name, seq in contigs.items():
            f.write(f">{name}\n{seq}\n")
    return str(p)


def _random_seq(rng, n: int) -> str:
    return "".join("ACGT"[c] for c in rng.integers(0, 4, size=n))


@pytest.fixture(scope="module")
def alt_genome_index(tmp_path_factory):
    """chr1 plus an ALT contig that duplicates a window of chr1."""
    rng = np.random.default_rng(7)
    chr1 = _random_seq(rng, 6000)
    alt = chr1[2000:3500]  # exact duplicate region
    tmp = tmp_path_factory.mktemp("altg")
    fa = _write_fasta(tmp, {"chr1": chr1, "chr1_x_alt": alt})
    genome = load_fasta(fa, chromosome_padding=2000)
    idx = GenomeIndex.build(genome, seed_len=20)
    return genome, idx, chr1


def test_alt_classification_and_reorder(alt_genome_index):
    genome, _, _ = alt_genome_index
    names = [c.name for c in genome.contigs]
    assert names == ["chr1", "chr1_x_alt"]
    assert not genome.contigs[0].is_alt
    assert genome.contigs[1].is_alt
    fas = genome.first_alt_start()
    assert fas == genome.contigs[1].start
    assert genome.is_location_alt(fas)
    assert not genome.is_location_alt(fas - 1)


def _align_one(idx, read_codes):
    import jax.numpy as jnp

    B, L = 8, len(read_codes)
    bases = np.full((B, L), 4, dtype=np.uint8)
    quals = np.full((B, L), ord("I"), dtype=np.uint8)
    lens = np.full(B, L, dtype=np.int32)
    bases[0] = read_codes
    params = AlignParams(
        seed_len=idx.seed_len, max_probe=idx.max_probe,
        num_seeds=14, hit_cap=8, max_cand=16,
    )
    out = align_single_device(
        idx.device, jnp.asarray(bases), jnp.asarray(quals),
        jnp.asarray(lens), params,
    )
    return {f: np.asarray(getattr(out, f))[0] for f in (
        "dist", "log_prob", "ag_score", "end_loc", "cand_loc",
        "direction", "valid",
    )}, int(np.asarray(out.popular)[0])


def test_alt_aware_primary_prefers_non_alt(alt_genome_index):
    genome, idx, chr1 = alt_genome_index
    # read from inside the duplicated window: two perfect hits
    read = np.array(
        [{"A": 0, "C": 1, "G": 2, "T": 3}[c] for c in chr1[2400:2500]],
        dtype=np.uint8,
    )
    cand, popular = _align_one(idx, read)
    fas = genome.first_alt_start()
    is_alt = cand["cand_loc"] >= fas

    # ALT-aware: primary on chr1, MAPQ high (ALT copy doesn't dilute)
    ra, supp = finalize_read(
        cand["dist"], cand["log_prob"], cand["ag_score"], cand["end_loc"],
        cand["cand_loc"], cand["direction"], cand["valid"], popular,
        is_alt=is_alt, alt_awareness=True, emit_alt=False,
    )
    assert ra.end_loc < fas
    assert ra.mapq >= 10
    assert supp is None

    # with -ea the ALT alignment comes out as supplementary
    ra2, supp2 = finalize_read(
        cand["dist"], cand["log_prob"], cand["ag_score"], cand["end_loc"],
        cand["cand_loc"], cand["direction"], cand["valid"], popular,
        is_alt=is_alt, alt_awareness=True, emit_alt=True,
    )
    assert ra2.end_loc == ra.end_loc
    assert supp2 is not None
    assert supp2.supplementary
    assert supp2.end_loc >= fas

    # -A- (no ALT awareness): two equal hits => ambiguous, MAPQ ~0
    ra3, supp3 = finalize_read(
        cand["dist"], cand["log_prob"], cand["ag_score"], cand["end_loc"],
        cand["cand_loc"], cand["direction"], cand["valid"], popular,
        is_alt=is_alt, alt_awareness=False,
    )
    assert supp3 is None
    assert ra3.mapq <= 3


def test_alt_only_read_emits_alt(alt_genome_index):
    """A read matching ONLY the ALT contig must come out at the ALT."""
    genome, idx, chr1 = alt_genome_index
    # mutate the chr1 copy heavily in a window unique to the ALT? The ALT
    # here duplicates chr1 exactly, so instead align a read overlapping the
    # ALT contig only via its boundary: use a read fully inside the ALT
    # and verify that without any non-ALT hit... all hits are dual. So
    # fabricate candidates instead: one ALT-only candidate.
    dist = np.array([3], dtype=np.int64)
    logp = np.array([-1.0], dtype=np.float64)
    ag = np.array([80], dtype=np.int64)
    end = np.array([genome.first_alt_start() + 100], dtype=np.int64)
    cl = end - 100
    dr = np.array([0], dtype=np.int64)
    valid = np.array([True])
    ra, supp = finalize_read(
        dist, logp, ag, end, cl, dr, valid, 0,
        is_alt=cl >= genome.first_alt_start(), alt_awareness=True,
    )
    assert ra.status in ("single", "multi")
    assert ra.end_loc == int(end[0])
    assert supp is None


def test_parse_alt_file_and_projection(tmp_path):
    alt_file = tmp_path / "ref.alt"
    alt_file.write_text(
        "chr1_x_alt\t0\tchr1\t2001\t60\t1500M\t*\t0\t0\t*\t*\n"
        "chr9_rc_alt\t16\tchr9\t501\t60\t100M\t*\t0\t0\t*\t*\n"
        "unmapped_alt\t4\t*\t0\t0\t*\t*\t0\t0\t*\t*\n"
    )
    lift = parse_alt_file(str(alt_file))
    assert lift["chr1_x_alt"] == ("chr1", 2001, False)
    assert lift["chr9_rc_alt"] == ("chr9", 501, True)
    assert "unmapped_alt" not in lift

    # projection arithmetic on a synthetic genome
    bases = np.full(20000, PAD, dtype=np.uint8)
    g = Genome(
        bases=bases,
        contigs=[
            Contig(name="chr1", start=1000, length=8000),
            Contig(
                name="chr1_x_alt", start=11000, length=1500, is_alt=True,
                proj_name="chr1", proj_offset=2001,
            ),
        ],
    )
    # ALT offset 100 -> chr1 position 2001+100 (1-based) = array loc
    loc = g.project_location(11000 + 100)
    assert loc == 1000 + 2000 + 100
    # non-ALT locations project to themselves
    assert g.project_location(1500) == 1500


def test_load_fasta_with_liftover(tmp_path):
    chr1 = "ACGT" * 1000
    fa = _write_fasta(tmp_path, {"chr1": chr1, "weird_name": chr1[:400]})
    lift = {"weird_name": ("chr1", 1, False)}
    g = load_fasta(str(fa), chromosome_padding=100, alt_liftover=lift)
    alt = [c for c in g.contigs if c.name == "weird_name"][0]
    assert alt.is_alt  # liftover membership implies ALT
    assert alt.proj_name == "chr1"
    # non_alt_names overrides everything
    g2 = load_fasta(
        str(fa), chromosome_padding=100, alt_liftover=lift,
        non_alt_names={"weird_name"},
    )
    assert not [c for c in g2.contigs if c.name == "weird_name"][0].is_alt
