"""Host-half cost breakdown of the paired-end e2e path.

align_batch mixes the (jitted) scoring graphs with the host half —
intersection candidates, the vectorized pair plan, the per-pair slow
loop (finalize_pair + winner_record), and batched emission. This tool
runs one realistic batch (proper FR pairs, substitution errors, an
--indel-frac slice with 1-3bp indels so a real fraction of pairs takes
the slow path) and reports wall time plus a cProfile split, so paired
host-side optimization targets the measured bottleneck.

Usage: python tools/profile_paired_host.py [--pairs 2048] [--iters 3]
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
    ap.add_argument("--pairs", type=int, default=2048)
    ap.add_argument("--read-len", type=int, default=100)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--genome", type=int, default=1_000_000)
    ap.add_argument("--err", type=float, default=0.01)
    ap.add_argument("--indel-frac", type=float, default=0.10)
    ap.add_argument("--repeat-frac", type=float, default=0.0)
    ap.add_argument("--profile", action="store_true")
    args = ap.parse_args()

    import snap_tpu  # noqa: F401

    from snap_tpu.align.paired_driver import PairedEndAligner
    from snap_tpu.align.pipeline import AlignParams
    from snap_tpu.constants import PAD
    from snap_tpu.genome import Contig, Genome
    from snap_tpu.index.index import GenomeIndex
    from snap_tpu.io.fastq import ReadBatch
    from snap_tpu.io.output import OutputWriter

    rng = np.random.default_rng(0)
    glen = args.genome
    if args.repeat_frac > 0:
        from bench import _gen_repeat_genome

        codes = _gen_repeat_genome(rng, glen, args.repeat_frac)
    else:
        codes = rng.integers(0, 4, size=glen).astype(np.uint8)
    gb = np.full(glen + 2000, PAD, dtype=np.uint8)
    gb[1000 : 1000 + glen] = codes
    genome = Genome(
        bases=gb, contigs=[Contig(name="chr1", start=1000, length=glen)]
    )
    print("building index...", flush=True)
    index = GenomeIndex.build(genome, seed_len=24)

    B, L = args.pairs, args.read_len
    inserts = np.clip(
        rng.normal(300, 50, size=B).astype(np.int64), 2 * L + 10, 600
    )
    starts = rng.integers(0, glen - 700, size=B)

    def mutate(read):
        read = read.copy()
        mut = rng.random(read.shape) < args.err
        read[mut] = rng.integers(0, 4, int(mut.sum()))
        if rng.random() < args.indel_frac:
            k = int(rng.integers(1, 4))
            p = int(rng.integers(10, L - 10 - k))
            if rng.random() < 0.5:  # deletion from the read
                read = np.concatenate(
                    [read[:p], read[p + k :], rng.integers(0, 4, k)]
                )
            else:  # insertion into the read
                read = np.concatenate(
                    [read[:p], rng.integers(0, 4, k), read[p:]]
                )[:L]
        return read.astype(np.uint8)

    RC = np.array([3, 2, 1, 0, 4], np.uint8)
    b0bases = np.full((B, 128), 4, np.uint8)
    b1bases = np.full((B, 128), 4, np.uint8)
    for i in range(B):
        fwd = codes[starts[i] : starts[i] + L]
        mate = codes[starts[i] + inserts[i] - L : starts[i] + inserts[i]]
        b0bases[i, :L] = mutate(fwd)
        b1bases[i, :L] = mutate(RC[mate[::-1]])
    quals = np.full((B, 128), 0, np.uint8)
    quals[:, :L] = ord("I")

    def mk(bases, tag):
        return ReadBatch(
            ids=[b"p%07d/%s" % (i, tag) for i in range(B)],
            bases=bases, quals=quals.copy(),
            lengths=np.full(B, L, np.int32),
        )

    b0, b1 = mk(b0bases, b"1"), mk(b1bases, b"2")

    aligner = PairedEndAligner(
        index,
        AlignParams(
            seed_len=24, max_probe=index.max_probe, num_seeds=8,
            hit_cap=8, max_cand=16,
        ),
        batch_size=B,
    )
    sink = io.BytesIO()
    writer = OutputWriter(out=sink, genome=genome, command_line="profile")
    print(f"plan_ok: {aligner._plan_ok(writer)}", flush=True)

    print("warmup (compiles the scoring graphs)...", flush=True)
    t0 = time.time()
    results = aligner.align_batch(b0, b1, plan_writer=writer)
    print(f"  first align_batch: {time.time() - t0:.1f}s", flush=True)
    if isinstance(results, tuple):
        res, plan = results
        nslow = sum(1 for r in res if r is not None and not isinstance(r, str) and r.__class__.__name__ != "_Planned" and r != ("planned",))
        print(f"  planned pairs: {plan['pairs'].size}/{B}")

    times = []
    for _ in range(args.iters):
        sink.seek(0)
        sink.truncate()
        t0 = time.perf_counter()
        r = aligner.align_batch(b0, b1, plan_writer=writer)
        if isinstance(r, tuple):
            aligner._emit_planned_pairs(writer, b0, b1, r[0], r[1])
        times.append(time.perf_counter() - t0)
    best = min(times)
    print(
        f"align_batch+emit: {best*1e3:8.1f} ms "
        f"({2*B/best:10,.0f} reads/s incl. CPU-device step)"
    )
    st = aligner.stats
    done = max(1, st.paired_slow_rows + st.paired_planned_rows)
    print(
        f"intersect wide-tier pairs: {st.intersect_wide_pairs} "
        f"({100.0 * st.intersect_wide_pairs / done:.2f}%)\n"
        f"intersect overflow pairs (host redo): "
        f"{st.intersect_overflow_pairs} "
        f"({100.0 * st.intersect_overflow_pairs / done:.2f}% of "
        f"{done} finalized)\n"
        f"slow finalize rows: {st.paired_slow_rows} "
        f"({100.0 * st.paired_slow_rows / done:.2f}%), planned: "
        f"{st.paired_planned_rows}"
    )

    if args.profile:
        pr = cProfile.Profile()
        pr.enable()
        r = aligner.align_batch(b0, b1, plan_writer=writer)
        if isinstance(r, tuple):
            aligner._emit_planned_pairs(writer, b0, b1, r[0], r[1])
        pr.disable()
        stats = pstats.Stats(pr)
        stats.sort_stats("cumulative").print_stats(28)


if __name__ == "__main__":
    main()
