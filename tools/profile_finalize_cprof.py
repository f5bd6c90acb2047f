"""cProfile breakdown of the single-end host finalize (dev aid).

Same setup as profile_host_emit.py, but runs _finalize under cProfile
and prints the top functions by cumulative time so host-side work
targets actual hotspots.

Usage: python tools/profile_finalize_cprof.py [--batch 16384]
"""

import argparse
import cProfile
import io
import os
import pstats
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16384)
    ap.add_argument("--read-len", type=int, default=100)
    ap.add_argument("--genome", type=int, default=1_000_000)
    ap.add_argument("--err", type=float, default=0.01)
    ap.add_argument("--top", type=int, default=35)
    args = ap.parse_args()

    import snap_tpu  # noqa: F401

    from snap_tpu.align.pipeline import AlignParams
    from snap_tpu.align.single import SingleEndAligner
    from snap_tpu.constants import PAD
    from snap_tpu.genome import Contig, Genome
    from snap_tpu.index.index import GenomeIndex
    from snap_tpu.io.fastq import ReadBatch
    from snap_tpu.io.output import OutputWriter

    rng = np.random.default_rng(0)
    glen = args.genome
    codes = rng.integers(0, 4, size=glen).astype(np.uint8)
    gb = np.full(glen + 2000, PAD, dtype=np.uint8)
    gb[1000 : 1000 + glen] = codes
    genome = Genome(
        bases=gb, contigs=[Contig(name="chr1", start=1000, length=glen)]
    )
    print("building index...", flush=True)
    index = GenomeIndex.build(genome, seed_len=24)

    B, L = args.batch, args.read_len
    starts = rng.integers(0, glen - L - 1, size=B)
    reads = codes[starts[:, None] + np.arange(L)[None, :]]
    mut = rng.random(reads.shape) < args.err
    reads = np.where(mut, rng.integers(0, 4, reads.shape), reads).astype(
        np.uint8
    )
    ML = 128
    bases = np.full((B, ML), 4, np.uint8)
    bases[:, :L] = reads
    quals = np.full((B, ML), 0, np.uint8)
    quals[:, :L] = ord("I")
    batch = ReadBatch(
        ids=[b"r%07d" % i for i in range(B)],
        bases=bases, quals=quals,
        lengths=np.full(B, L, np.int32),
    )

    aligner = SingleEndAligner(
        index,
        AlignParams(
            seed_len=24, max_probe=index.max_probe, num_seeds=25,
            hit_cap=8, max_cand=16,
        ),
        batch_size=B,
    )
    sink = io.BytesIO()
    writer = OutputWriter(out=sink, genome=genome, command_line="profile")
    plan_ok = aligner._plan_ok(writer)
    print(f"plan_ok: {plan_ok}", flush=True)

    print("device step (one-time)...", flush=True)
    t0 = time.time()
    (tag, win, out, db, dq, dl), fc = aligner._submit(batch)
    import jax

    jax.block_until_ready(win)
    print(f"  device step: {time.time() - t0:.1f}s", flush=True)

    # warm (jit caches, lazy imports)
    aligner._finalize(
        batch, (tag, win, out, db, dq, dl), fc,
        plan_writer=writer if plan_ok else None,
    )

    pr = cProfile.Profile()
    pr.enable()
    for _ in range(3):
        aligner._finalize(
            batch, (tag, win, out, db, dq, dl), fc,
            plan_writer=writer if plan_ok else None,
        )
    pr.disable()
    st = pstats.Stats(pr)
    st.sort_stats("cumulative").print_stats(args.top)


if __name__ == "__main__":
    main()
