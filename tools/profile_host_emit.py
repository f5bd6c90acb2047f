"""Host-half throughput of the single-end e2e path, measured alone.

The e2e FASTQ->SAM number is device step + host finalize + emission;
the device step is benchmarked by bench.py on the chip. This tool
times ONLY the host half — _finalize (winner unpack, flagged-row
redo planning, record assembly) and _emit_planned (batched native SAM
formatting + stream write) — on one real winners batch, repeated, so
host-side optimization targets the measured bottleneck.

Runs on CPU; the one-time device step just produces genuine winners.

Usage: python tools/profile_host_emit.py [--batch 16384] [--iters 5]
"""

import argparse
import io
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16384)
    ap.add_argument("--read-len", type=int, default=100)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--genome", type=int, default=1_000_000)
    ap.add_argument("--err", type=float, default=0.01)
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
    writer.write_header = getattr(writer, "write_header", None) or (
        lambda: None
    )
    plan_ok = aligner._plan_ok(writer)
    print(f"plan_ok (batched native SAM path): {plan_ok}", flush=True)

    print("device step (one-time, CPU)...", flush=True)
    t0 = time.time()
    (tag, win, out, db, dq, dl), fc = aligner._submit(batch)
    import jax

    jax.block_until_ready(win)
    print(f"  device step: {time.time() - t0:.1f}s", flush=True)

    fin_times, emit_times = [], []
    nbytes = 0
    for it in range(args.iters):
        sink.seek(0)
        sink.truncate()
        t0 = time.perf_counter()
        if plan_ok:
            results, plan = aligner._finalize(
                batch, (tag, win, out, db, dq, dl), fc, plan_writer=writer
            )
        else:
            results, plan = (
                aligner._finalize(batch, (tag, win, out, db, dq, dl), fc),
                None,
            )
        t1 = time.perf_counter()
        if plan is not None:
            aligner._emit_planned(writer, batch, results, plan)
        else:
            for i, res in enumerate(results):
                aligner._emit(writer, batch, i, res)
        t2 = time.perf_counter()
        fin_times.append(t1 - t0)
        emit_times.append(t2 - t1)
        nbytes = sink.tell()

    fin, emit = min(fin_times), min(emit_times)
    print(f"finalize: {fin*1e3:8.1f} ms  ({B/fin:10,.0f} reads/s)")
    print(f"emit:     {emit*1e3:8.1f} ms  ({B/emit:10,.0f} reads/s)")
    tot = fin + emit
    print(
        f"host half:{tot*1e3:8.1f} ms  ({B/tot:10,.0f} reads/s)  "
        f"[{nbytes/1e6:.1f} MB SAM]"
    )


if __name__ == "__main__":
    main()
