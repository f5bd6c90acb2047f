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


def gen_genome(rng, size: int, n_contigs: int = 2) -> dict[str, str]:
    contigs = {}
    per = size // n_contigs
    for c in range(n_contigs):
        seq = "".join(BASES[i] for i in rng.integers(0, 4, size=per))
        contigs[f"chr{c + 1}"] = seq
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


def parse_sam(path):
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
            recs[t[0]] = {
                "flag": int(t[1]),
                "rname": t[2],
                "pos": int(t[3]),
                "mapq": int(t[4]),
                "cigar": t[5],
                "nm": nm,
            }
    return recs


def compare(golden, ours, verbose=False):
    fields = ["rname", "pos", "flag", "cigar", "mapq", "nm"]
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
    ap.add_argument("--read-len", type=int, default=100)
    ap.add_argument("--seed", type=int, default=1)
    ap.add_argument("--snp-rate", type=float, default=0.01)
    ap.add_argument("--indel-rate", type=float, default=0.0)
    ap.add_argument("--ref-binary", default="/tmp/snapbuild/snap-aligner")
    ap.add_argument("--workdir", default="/tmp/golden_harness")
    ap.add_argument("--seed-len", type=int, default=24)
    ap.add_argument("--verbose", action="store_true")
    ap.add_argument("--batch", type=int, default=256)
    args = ap.parse_args()

    os.makedirs(args.workdir, exist_ok=True)
    rng = np.random.default_rng(args.seed)
    contigs = gen_genome(rng, args.genome_size)
    reads = gen_reads(
        rng, contigs, args.reads, args.read_len, args.snp_rate, args.indel_rate
    )
    fa = os.path.join(args.workdir, "genome.fa")
    fq = os.path.join(args.workdir, "reads.fq")
    write_fasta(contigs, fa)
    write_fastq(reads, fq)

    refidx = os.path.join(args.workdir, "refidx")
    golden_sam = os.path.join(args.workdir, "golden.sam")
    subprocess.run(
        [args.ref_binary, "index", fa, refidx, "-s", str(args.seed_len)],
        check=True, capture_output=True,
    )
    subprocess.run(
        [args.ref_binary, "single", refidx, fq, "-t", "1", "-o", golden_sam],
        check=True, capture_output=True,
    )

    # ours, in process
    import snap_tpu  # noqa: F401
    from snap_tpu.align.pipeline import AlignParams
    from snap_tpu.align.single import SingleEndAligner
    from snap_tpu.genome import load_fasta
    from snap_tpu.index.index import GenomeIndex
    from snap_tpu.io.sam import SamWriter

    genome = load_fasta(fa)
    index = GenomeIndex.build(genome, args.seed_len)
    params = AlignParams(
        seed_len=args.seed_len, max_probe=max(32, index.max_probe + 1)
    )
    L = max(args.read_len, 101)
    aligner = SingleEndAligner(
        index, params, batch_size=args.batch, max_read_len=L
    )
    ours_sam = os.path.join(args.workdir, "ours.sam")
    with open(ours_sam, "wb") as f:
        writer = SamWriter(out=f, genome=genome, command_line="harness")
        aligner.align_file(fq, writer)

    golden = parse_sam(golden_sam)
    ours = parse_sam(ours_sam)
    exact, total, diffs = compare(golden, ours, args.verbose)
    return 0 if exact == total else 2


if __name__ == "__main__":
    sys.exit(main())
