"""Device-step throughput vs batch size (dev aid for bench.py tuning).

Same workload as bench.py's device-step section, measured at several
batch sizes with the same pipelined loop. New shapes pay a one-time
compile (persistent cache applies).

Usage: python tools/bench_batch_sweep.py [--sizes 16384,32768,65536]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="16384,32768,65536")
    ap.add_argument("--iters", type=int, default=8)
    args = ap.parse_args()
    sizes = [int(s) for s in args.sizes.split(",")]

    import snap_tpu  # noqa: F401
    import jax
    import jax.numpy as jnp
    from snap_tpu.genome import Genome, Contig
    from snap_tpu.constants import PAD
    from snap_tpu.index.build import build_index
    from snap_tpu.index.index import make_device_index
    from snap_tpu.align.pipeline import AlignParams, align_winners_device

    rng = np.random.default_rng(0)
    glen = 1_000_000
    read_len = 100
    codes = rng.integers(0, 4, size=glen).astype(np.uint8)
    bases = np.full(glen + 2000, PAD, dtype=np.uint8)
    bases[1000 : 1000 + glen] = codes
    genome = Genome(
        bases=bases, contigs=[Contig(name="chr1", start=1000, length=glen)]
    )
    idx = build_index(genome, seed_len=24)
    didx = make_device_index(idx, bases)
    params = AlignParams(
        seed_len=24, max_probe=idx["max_probe"], num_seeds=25,
        hit_cap=8, max_cand=16,
    )
    fas = jnp.int64(bases.shape[0])

    for batch in sizes:
        starts = rng.integers(0, glen - read_len - 1, size=batch)
        reads = codes[starts[:, None] + np.arange(read_len)[None, :]]
        mut = rng.random(reads.shape) < 0.01
        reads = np.where(
            mut, rng.integers(0, 4, reads.shape), reads
        ).astype(np.uint8)
        b = jnp.asarray(reads)
        q = jnp.asarray(np.full((batch, read_len), ord("I"), np.uint8))
        l = jnp.asarray(np.full(batch, read_len, np.int32))

        t0 = time.perf_counter()
        win, _ = align_winners_device(didx, b, q, l, fas, params, adaptive=True)
        jax.device_get(win)
        tc = time.perf_counter() - t0

        n_iters = args.iters
        t0 = time.perf_counter()
        win_next, _ = align_winners_device(
            didx, b, q, l, fas, params, adaptive=True
        )
        for _ in range(n_iters - 1):
            win_cur = win_next
            win_next, _ = align_winners_device(
                didx, b, q, l, fas, params, adaptive=True
            )
            jax.device_get(win_cur)
        jax.device_get(win_next)
        dt = time.perf_counter() - t0
        rps = batch * n_iters / dt
        print(
            f"batch {batch:6d}: {rps:12,.0f} reads/s/chip "
            f"(compile+settle {tc:.1f}s)",
            flush=True,
        )


if __name__ == "__main__":
    main()
