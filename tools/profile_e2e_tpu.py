"""Instrumented e2e single-end run (same shapes as bench.py's e2e).

Prints per-batch wall times for: read, submit (dispatch), winners
device_get, finalize (host + follow-up device calls), emit — so the
e2e gap vs the device-step number can be attributed (tunnel RTTs vs
host compute).

Usage: python tools/profile_e2e_tpu.py [--batch 16384] [--batches 4]
"""

import argparse
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16384)
    ap.add_argument("--batches", type=int, default=4)
    ap.add_argument("--read-len", type=int, default=100)
    ap.add_argument("--genome", type=int, default=1_000_000)
    args = ap.parse_args()

    import snap_tpu  # noqa: F401
    import jax

    from snap_tpu.align.pipeline import AlignParams
    from snap_tpu.align.single import SingleEndAligner
    from snap_tpu.constants import PAD
    from snap_tpu.genome import Contig, Genome
    from snap_tpu.index.index import GenomeIndex
    from snap_tpu.io.readers import single_batches
    from snap_tpu.io.sam import SamWriter

    rng = np.random.default_rng(1)
    glen = args.genome
    L = args.batch * args.batches
    rl = args.read_len
    codes = rng.integers(0, 4, size=glen).astype(np.uint8)
    gb = np.full(glen + 2000, PAD, dtype=np.uint8)
    gb[1000 : 1000 + glen] = codes
    genome = Genome(
        bases=gb, contigs=[Contig(name="chr1", start=1000, length=glen)]
    )
    print("building index...", flush=True)
    index = GenomeIndex.build(genome, seed_len=24)
    params = AlignParams(seed_len=24, max_probe=index.max_probe)
    DEC = np.frombuffer(b"ACGT", np.uint8)

    td = tempfile.mkdtemp()
    fq = os.path.join(td, "r.fq")
    starts = rng.integers(0, glen - rl - 1, size=L)
    rd = codes[starts[:, None] + np.arange(rl)[None, :]]
    mut = rng.random(rd.shape) < 0.01
    rd = np.where(mut, rng.integers(0, 4, rd.shape), rd).astype(np.uint8)
    qline = b"I" * rl
    with open(fq, "wb") as f:
        for i in range(L):
            f.write(b"@r%d\n%s\n+\n%s\n" % (i, DEC[rd[i]].tobytes(), qline))

    aligner = SingleEndAligner(
        index, params, batch_size=args.batch, max_read_len=rl
    )
    import io as _io

    sink = _io.BytesIO()
    writer = SamWriter(out=sink, genome=genome, command_line="prof")
    writer.write_header()
    plan_ok = aligner._plan_ok(writer)
    print(f"plan_ok: {plan_ok}", flush=True)

    # warm pass
    print("warm pass...", flush=True)
    t0 = time.time()
    for batch in single_batches(fq, args.batch, 128):
        handles, fc = aligner._submit(batch)
        if plan_ok:
            results, plan = aligner._finalize(
                batch, handles, fc, plan_writer=writer
            )
            aligner._emit_planned(writer, batch, results, plan)
        else:
            for i, res in enumerate(aligner._finalize(batch, handles, fc)):
                aligner._emit(writer, batch, i, res)
    print(f"warm: {time.time()-t0:.1f}s", flush=True)

    # timed, per-phase
    tot = dict(read=0.0, submit=0.0, getwin=0.0, fin=0.0, emit=0.0)
    t_all = time.time()
    src = iter(single_batches(fq, args.batch, 128))
    while True:
        t0 = time.time()
        batch = next(src, None)
        tot["read"] += time.time() - t0
        if batch is None:
            break
        t0 = time.time()
        handles, fc = aligner._submit(batch)
        tot["submit"] += time.time() - t0
        t0 = time.time()
        # _submit already queued a background device_get of the packed
        # winners (fast path only); wait on THAT future so this phase
        # measures the real pipeline's transfer instead of issuing a
        # redundant second D2H fetch. On the host-merge path (fast_ok
        # False) handles[1] is a Tier1Out pytree consumed by _finalize,
        # so there is nothing to prefetch here.
        if handles[0] == "fast":
            pinned = aligner._win_futures.get(id(handles[1]))
            if pinned is not None:
                pinned[1].result()
        tot["getwin"] += time.time() - t0
        t0 = time.time()
        if plan_ok:
            results, plan = aligner._finalize(
                batch, handles, fc, plan_writer=writer
            )
        else:
            results, plan = aligner._finalize(batch, handles, fc), None
        tot["fin"] += time.time() - t0
        t0 = time.time()
        if plan is not None:
            aligner._emit_planned(writer, batch, results, plan)
        else:
            for i, res in enumerate(results):
                aligner._emit(writer, batch, i, res)
        tot["emit"] += time.time() - t0
    wall = time.time() - t_all
    for k, v in tot.items():
        print(f"{k:8s} {v:7.2f}s  ({L/max(v,1e-9):12,.0f} reads/s)")
    print(f"wall     {wall:7.2f}s  ({L/wall:12,.0f} reads/s e2e, serial)")


if __name__ == "__main__":
    main()
