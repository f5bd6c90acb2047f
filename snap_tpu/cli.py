"""Command-line interface.

Behavioral reference: SNAP's CLI surface (CommandProcessor.cpp:41-57,
AlignerOptions.cpp usage). Same top-level verbs and flag names where
they exist (`index`, `single`; `paired` and `daemon` arrive with those
subsystems). SNAP-style manual flag parsing — SNAP uses `-h` for
maxHits, so argparse's default help is not an option.
"""

from __future__ import annotations

import sys
import time

from .align.pipeline import AlignParams
from .align.single import SingleEndAligner
from .constants import DEFAULT_SEED_LEN
from .genome import load_fasta
from .index.index import GenomeIndex
from .io.sam import SamWriter


def cmd_index(args: list[str]) -> int:
    if len(args) < 2:
        print("usage: snap-tpu index <input.fa> <output-dir> [-s seedLen]",
              file=sys.stderr)
        return 1
    fa, outdir = args[0], args[1]
    seed_len = DEFAULT_SEED_LEN
    i = 2
    while i < len(args):
        if args[i] == "-s" and i + 1 < len(args):
            seed_len = int(args[i + 1])
            i += 2
        else:
            print(f"ignoring unknown index option {args[i]}", file=sys.stderr)
            i += 1
    t0 = time.time()
    print(f"Loading FASTA {fa}...", file=sys.stderr)
    genome = load_fasta(fa)
    print(f"Building index (seed {seed_len})...", file=sys.stderr)
    idx = GenomeIndex.build(genome, seed_len)
    idx.save(outdir)
    n = genome.num_bases
    dt = time.time() - t0
    print(
        f"Index build and save took {dt:.0f}s ({n / max(dt, 1e-9):,.0f} bases/s)",
        file=sys.stderr,
    )
    return 0


def cmd_single(args: list[str]) -> int:
    if len(args) < 2:
        print(
            "usage: snap-tpu single <index-dir> <input.fq> [-o out.sam] "
            "[-d maxDist] [-n numSeeds] [-h maxHits] [-mrl minReadLen] "
            "[-b batchSize] [-rl maxReadLen]",
            file=sys.stderr,
        )
        return 1
    index_dir, fastq = args[0], args[1]
    out_path = "-"
    overrides: dict = {}
    batch_size, max_read_len, mrl = 1024, 128, 50
    i = 2
    while i < len(args):
        a = args[i]
        if a == "-o":
            out_path = args[i + 1]; i += 2
        elif a == "-d":
            overrides["max_k"] = int(args[i + 1]); i += 2
        elif a == "-n":
            overrides["num_seeds"] = int(args[i + 1]); i += 2
        elif a == "-h":
            overrides["max_hits"] = int(args[i + 1]); i += 2
        elif a == "-mrl":
            mrl = int(args[i + 1]); i += 2
        elif a == "-b":
            batch_size = int(args[i + 1]); i += 2
        elif a == "-rl":
            max_read_len = int(args[i + 1]); i += 2
        elif a == "-t":
            i += 2  # thread count: parallelism is the device mesh
        else:
            print(f"ignoring unknown option {a}", file=sys.stderr)
            i += 1

    print(f"Loading index from directory... {index_dir}", file=sys.stderr)
    index = GenomeIndex.load(index_dir)
    params = AlignParams(
        seed_len=index.seed_len,
        max_probe=max(32, index.max_probe + 1),
        **overrides,
    )
    aligner = SingleEndAligner(
        index, params, batch_size=batch_size, max_read_len=max_read_len,
        min_read_length=mrl,
    )
    out = sys.stdout.buffer if out_path == "-" else open(out_path, "wb")
    try:
        writer = SamWriter(
            out=out,
            genome=index.genome_meta,
            command_line="single " + " ".join(args),
        )
        print("Aligning.", file=sys.stderr)
        stats = aligner.align_file(fastq, writer)
        stats.print_table()
    finally:
        if out_path != "-":
            out.close()
    return 0


def cmd_paired(args: list[str]) -> int:
    if len(args) < 2:
        print(
            "usage: snap-tpu paired <index-dir> <in1.fq> [in2.fq] [-o out.sam]"
            " [-s min max] [-d maxDist] [-n numSeeds] [-b batchSize]",
            file=sys.stderr,
        )
        return 1
    index_dir, fq1 = args[0], args[1]
    fq2 = None
    i = 2
    if i < len(args) and not args[i].startswith("-"):
        fq2 = args[i]
        i += 1
    out_path = "-"
    overrides: dict = {}
    batch_size, max_read_len, mrl = 512, 128, 50
    min_sp, max_sp = 0, 1000
    while i < len(args):
        a = args[i]
        if a == "-o":
            out_path = args[i + 1]; i += 2
        elif a == "-s":
            min_sp, max_sp = int(args[i + 1]), int(args[i + 2]); i += 3
        elif a == "-d":
            overrides["max_k"] = int(args[i + 1]); i += 2
        elif a == "-n":
            overrides["num_seeds"] = int(args[i + 1]); i += 2
        elif a == "-h":
            overrides["max_hits"] = int(args[i + 1]); i += 2
        elif a == "-b":
            batch_size = int(args[i + 1]); i += 2
        elif a == "-rl":
            max_read_len = int(args[i + 1]); i += 2
        elif a == "-mrl":
            mrl = int(args[i + 1]); i += 2
        elif a == "-t":
            i += 2
        else:
            print(f"ignoring unknown option {a}", file=sys.stderr)
            i += 1

    from .align.paired_driver import PairedEndAligner

    print(f"Loading index from directory... {index_dir}", file=sys.stderr)
    index = GenomeIndex.load(index_dir)
    params = AlignParams(
        seed_len=index.seed_len,
        max_probe=max(32, index.max_probe + 1),
        **overrides,
    )
    aligner = PairedEndAligner(
        index, params, batch_size=batch_size, max_read_len=max_read_len,
        min_read_length=mrl, min_spacing=min_sp, max_spacing=max_sp,
    )
    out = sys.stdout.buffer if out_path == "-" else open(out_path, "wb")
    try:
        writer = SamWriter(
            out=out,
            genome=index.genome_meta,
            command_line="paired " + " ".join(args),
        )
        print("Aligning.", file=sys.stderr)
        stats = aligner.align_files(fq1, fq2, writer)
        stats.print_table()
    finally:
        if out_path != "-":
            out.close()
    return 0


def main(argv: list[str] | None = None) -> int:
    argv = argv if argv is not None else sys.argv[1:]
    print("Welcome to snap-tpu, a TPU-native SNAP-capability aligner.",
          file=sys.stderr)
    if not argv:
        print("usage: snap-tpu {index,single} ...", file=sys.stderr)
        return 1
    cmd, rest = argv[0], argv[1:]
    if cmd == "index":
        return cmd_index(rest)
    if cmd == "single":
        return cmd_single(rest)
    if cmd == "paired":
        return cmd_paired(rest)
    print(f"unknown command {cmd}", file=sys.stderr)
    return 1


if __name__ == "__main__":
    sys.exit(main())
