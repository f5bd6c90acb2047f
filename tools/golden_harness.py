"""Golden-output harness: snap-tpu vs reference SNAP on synthetic data.

Replicates the reference's own test methodology (tests/datatest.py:93-103
golden SAM diff), but with generated data: a random genome and wgsim-style
mutated reads (SNPs, indels, both strands, junk reads). Reports per-field
agreement (POS/FLAG/RNAME/CIGAR/MAPQ/NM) between the reference binary's
output and ours.

Usage:
  python tools/golden_harness.py [--reads N] [--genome-size G] [--seed S]
      [--indels] [--ref-binary PATH] [--workdir DIR] [--keep]
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys
from collections import Counter

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASES = "ACGT"


def gen_genome(
    rng, size: int, n_contigs: int = 2, repeat_frac: float = 0.0
) -> dict[str, str]:
    """Random genome; with repeat_frac > 0, plant repeated segments
    (a chr21-class workload: SINE/LINE-like 300bp and 6kb units copied
    across the genome, plus tandem microsatellites) so seeds collect
    many hits and MAPQ depends on honest pAll accumulation."""
    contigs = {}
    per = size // n_contigs
    for c in range(n_contigs):
        seq = rng.integers(0, 4, size=per).astype(np.uint8)
        if repeat_frac > 0:
            budget = int(per * repeat_frac)
            # "Alu": ~300bp unit, many copies with 1% divergence
            alu = rng.integers(0, 4, size=300).astype(np.uint8)
            n_alu = budget // 2 // 300
            for _ in range(max(1, n_alu)):
                p = int(rng.integers(0, per - 300))
                unit = alu.copy()
                div = rng.random(300) < 0.01
                unit[div] = rng.integers(0, 4, div.sum())
                seq[p : p + 300] = unit
            # "LINE": 6kb unit, few copies
            line = rng.integers(0, 4, size=6000).astype(np.uint8)
            for _ in range(max(1, budget // 2 // 6000)):
                p = int(rng.integers(0, per - 6000))
                seq[p : p + 6000] = line
            # microsatellite: (ACGT-derived 4-mer)^N tandem runs
            for _ in range(max(1, per // 20000)):
                unit = rng.integers(0, 4, size=4)
                reps = int(rng.integers(20, 60))
                p = int(rng.integers(0, per - 4 * reps))
                seq[p : p + 4 * reps] = np.tile(unit, reps)
        contigs[f"chr{c + 1}"] = "".join(BASES[i] for i in seq)
    return contigs


def mutate(rng, seq: str, snp_rate: float, indel_rate: float) -> str:
    out = []
    i = 0
    while i < len(seq):
        r = rng.random()
        if r < indel_rate / 2:  # deletion of 1-3 bases from the template
            i += int(rng.integers(1, 4))
            continue
        if r < indel_rate:      # insertion of 1-3 random bases
            for _ in range(int(rng.integers(1, 4))):
                out.append(BASES[rng.integers(0, 4)])
        if rng.random() < snp_rate:
            cur = seq[i]
            choices = [b for b in BASES if b != cur]
            out.append(choices[rng.integers(0, 3)])
        else:
            out.append(seq[i])
        i += 1
    return "".join(out)


RC = str.maketrans("ACGT", "TGCA")


def gen_reads(rng, contigs, n_reads, read_len, snp_rate, indel_rate):
    reads = []
    names = list(contigs)
    for r in range(n_reads):
        cname = names[rng.integers(0, len(names))]
        seq = contigs[cname]
        pos = int(rng.integers(0, len(seq) - read_len - 12))
        frag = seq[pos : pos + read_len + 10]
        mut = mutate(rng, frag, snp_rate, indel_rate)[:read_len]
        if len(mut) < read_len:
            mut = mut + "".join(BASES[i] for i in rng.integers(0, 4, read_len - len(mut)))
        strand = int(rng.integers(0, 2))
        if strand:
            mut = mut.translate(RC)[::-1]
        quals = "".join(
            chr(int(q)) for q in rng.integers(53, 74, size=read_len)
        )  # phred 20-40
        reads.append((f"r{r}_{cname}_{pos + 1}_{strand}", mut, quals))
    # a few junk reads that shouldn't align
    for j in range(max(2, n_reads // 50)):
        seq = "".join(BASES[i] for i in rng.integers(0, 4, read_len))
        quals = "I" * read_len
        reads.append((f"junk{j}", seq, quals))
    return reads


def write_fasta(contigs, path):
    with open(path, "w") as f:
        for name, seq in contigs.items():
            f.write(f">{name}\n")
            for i in range(0, len(seq), 80):
                f.write(seq[i : i + 80] + "\n")


def write_fastq(reads, path):
    with open(path, "w") as f:
        for name, seq, quals in reads:
            f.write(f"@{name}\n{seq}\n+\n{quals}\n")


def gen_pairs(rng, contigs, n_pairs, read_len, snp_rate, indel_rate,
              insert_lo=200, insert_hi=500):
    """wgsim-style proper pairs: R1 = fragment start (FWD),
    R2 = RC of fragment end."""
    names = list(contigs)
    r1s, r2s = [], []
    for r in range(n_pairs):
        cname = names[rng.integers(0, len(names))]
        seq = contigs[cname]
        insert = int(rng.integers(insert_lo, insert_hi))
        pos = int(rng.integers(0, len(seq) - insert - 12))
        frag = seq[pos : pos + insert]
        def mk(sub):
            mut = mutate(rng, sub, snp_rate, indel_rate)[:read_len]
            while len(mut) < read_len:
                mut = mut + BASES[rng.integers(0, 4)]
            return mut
        s1 = mk(frag[: read_len + 10])
        s2 = mk(frag[-(read_len + 10):]).translate(RC)[::-1]
        q = lambda: "".join(chr(int(x)) for x in rng.integers(53, 74, read_len))
        name = f"p{r}_{cname}_{pos + 1}"
        r1s.append((name, s1, q()))
        r2s.append((name, s2, q()))
    return r1s, r2s


def parse_sam(path, paired=False):
    recs = {}
    with open(path) as f:
        for line in f:
            if line.startswith("@"):
                continue
            t = line.rstrip("\n").split("\t")
            nm = None
            for tag in t[11:]:
                if tag.startswith("NM:i:"):
                    nm = int(tag[5:])
            flag = int(t[1])
            key = t[0]
            if paired:
                key += "/1" if flag & 0x40 else "/2"
            recs[key] = {
                "flag": flag,
                "rname": t[2],
                "pos": int(t[3]),
                "mapq": int(t[4]),
                "cigar": t[5],
                "nm": nm,
                "rnext": t[6],
                "pnext": int(t[7]),
                "tlen": int(t[8]),
            }
    return recs


def compare(golden, ours, verbose=False, paired=False):
    fields = ["rname", "pos", "flag", "cigar", "mapq", "nm"]
    if paired:
        fields += ["rnext", "pnext", "tlen"]
    agree = Counter()
    total = 0
    mapq_close = 0
    diffs = []
    for qname, g in golden.items():
        o = ours.get(qname)
        if o is None:
            diffs.append((qname, "MISSING", g, None))
            continue
        total += 1
        for f in fields:
            if g[f] == o[f]:
                agree[f] += 1
        if abs(g["mapq"] - o["mapq"]) <= 3:
            mapq_close += 1
        if any(g[f] != o[f] for f in fields):
            diffs.append((qname, "DIFF", g, o))
    exact = sum(
        1
        for q, g in golden.items()
        if q in ours and all(g[f] == ours[q][f] for f in fields)
    )
    print(f"records compared: {total}")
    for f in fields:
        print(f"  {f:6s}: {agree[f]}/{total} ({100.0 * agree[f] / max(1, total):.2f}%)")
    print(f"  mapq±3: {mapq_close}/{total} ({100.0 * mapq_close / max(1, total):.2f}%)")
    print(f"  ALL fields exact: {exact}/{total} ({100.0 * exact / max(1, total):.2f}%)")
    if verbose:
        for qname, kind, g, o in diffs[:25]:
            print(f"  {kind} {qname}:\n    ref : {g}\n    ours: {o}")
    return exact, total, diffs


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reads", type=int, default=200)
    ap.add_argument("--genome-size", type=int, default=100_000)
    ap.add_argument("--repeat-frac", type=float, default=0.0)
    ap.add_argument("--read-len", type=int, default=100)
    ap.add_argument("--seed", type=int, default=1)
    ap.add_argument("--snp-rate", type=float, default=0.01)
    ap.add_argument("--indel-rate", type=float, default=0.0)
    ap.add_argument("--ref-binary", default="/tmp/snapbuild/snap-aligner")
    ap.add_argument("--workdir", default="/tmp/golden_harness")
    ap.add_argument("--seed-len", type=int, default=24)
    ap.add_argument("--verbose", action="store_true")
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--paired", action="store_true")
    # affine-gap penalty overrides, passed to BOTH aligners
    ap.add_argument("--gm", type=int, default=None)
    ap.add_argument("--gs", type=int, default=None)
    ap.add_argument("--go", type=int, default=None)
    ap.add_argument("--ge", type=int, default=None)
    args = ap.parse_args()
    ag_cli = []
    ag_params = {}
    for flag, field in (("gm", "ag_match"), ("gs", "ag_sub"),
                        ("go", "ag_open"), ("ge", "ag_extend")):
        v = getattr(args, flag)
        if v is not None:
            ag_cli += [f"-{flag}", str(v)]
            ag_params[field] = v

    os.makedirs(args.workdir, exist_ok=True)
    rng = np.random.default_rng(args.seed)
    contigs = gen_genome(rng, args.genome_size, repeat_frac=args.repeat_frac)
    fa = os.path.join(args.workdir, "genome.fa")
    write_fasta(contigs, fa)

    refidx = os.path.join(args.workdir, "refidx")
    golden_sam = os.path.join(args.workdir, "golden.sam")
    subprocess.run(
        [args.ref_binary, "index", fa, refidx, "-s", str(args.seed_len)],
        check=True, capture_output=True,
    )

    if args.paired:
        r1s, r2s = gen_pairs(
            rng, contigs, args.reads, args.read_len, args.snp_rate,
            args.indel_rate,
        )
        fq1 = os.path.join(args.workdir, "reads_1.fq")
        fq2 = os.path.join(args.workdir, "reads_2.fq")
        write_fastq(r1s, fq1)
        write_fastq(r2s, fq2)
        subprocess.run(
            [args.ref_binary, "paired", refidx, fq1, fq2, "-t", "1",
             "-o", golden_sam] + ag_cli,
            check=True, capture_output=True,
        )
    else:
        reads = gen_reads(
            rng, contigs, args.reads, args.read_len, args.snp_rate,
            args.indel_rate,
        )
        fq = os.path.join(args.workdir, "reads.fq")
        write_fastq(reads, fq)
        subprocess.run(
            [args.ref_binary, "single", refidx, fq, "-t", "1",
             "-o", golden_sam] + ag_cli,
            check=True, capture_output=True,
        )

    # ours, in process
    import snap_tpu  # noqa: F401
    from snap_tpu.align.pipeline import AlignParams
    from snap_tpu.genome import load_fasta
    from snap_tpu.index.index import GenomeIndex
    from snap_tpu.io.sam import SamWriter

    genome = load_fasta(fa)
    index = GenomeIndex.build(genome, args.seed_len)
    L = max(args.read_len, 101)
    ours_sam = os.path.join(args.workdir, "ours.sam")
    if args.paired:
        from snap_tpu.align.paired_driver import PairedEndAligner
        from snap_tpu.constants import DEFAULT_NUM_SEEDS_PAIRED

        params = AlignParams(
            seed_len=args.seed_len, max_probe=index.max_probe,
            **ag_params,
        )
        aligner = PairedEndAligner(
            index, params, batch_size=args.batch, max_read_len=L
        )
        with open(ours_sam, "wb") as f:
            writer = SamWriter(out=f, genome=genome, command_line="harness")
            aligner.align_files(fq1, fq2, writer)
    else:
        from snap_tpu.align.single import SingleEndAligner

        params = AlignParams(
            seed_len=args.seed_len, max_probe=index.max_probe,
            **ag_params,
        )
        aligner = SingleEndAligner(
            index, params, batch_size=args.batch, max_read_len=L
        )
        with open(ours_sam, "wb") as f:
            writer = SamWriter(out=f, genome=genome, command_line="harness")
            aligner.align_file(fq, writer)

    golden = parse_sam(golden_sam, paired=args.paired)
    ours = parse_sam(ours_sam, paired=args.paired)
    exact, total, diffs = compare(golden, ours, args.verbose, args.paired)
    return 0 if exact == total else 2


if __name__ == "__main__":
    sys.exit(main())
