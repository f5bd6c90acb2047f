"""BASELINE config-4 demonstration: hg38-scale index, 10M-read batch.

Loads the 3.1Gbp chunked-build index (tools/build_big_index.py output),
streams synthetic 100bp read batches sampled from the genome through
the production device wavefront (align_winners_device), and reports
end-of-run throughput + accuracy-proxy counts as one JSON line.

On a TPU pod slice the index would be sharded over the mesh
(GenomeIndex.to_mesh; dryrun_multichip exercises that path); this tool
demonstrates the capability target the VERDICT set — "loading +
aligning a 10M-read batch (config 4) at least on CPU" — on whatever
backend JAX selects.

Usage: python tools/bench_big.py <index-dir> [--reads 10000000]
       [--batch 16384] [--out BIGIDX_r2.json]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("index_dir")
    ap.add_argument("--reads", type=int, default=10_000_000)
    ap.add_argument("--batch", type=int, default=16384)
    ap.add_argument("--read-len", type=int, default=100)
    ap.add_argument("--out", default="BIGIDX_r2.json")
    ap.add_argument("--mutate", type=float, default=0.01)
    args = ap.parse_args()

    import snap_tpu  # noqa: F401
    import jax
    import jax.numpy as jnp

    from snap_tpu.align.pipeline import AlignParams, align_winners_device
    from snap_tpu.align.pipeline import HostWinners
    from snap_tpu.index.index import GenomeIndex

    t0 = time.time()
    print(f"loading index from {args.index_dir}...", flush=True)
    index = GenomeIndex.load(args.index_dir)
    genome = index.genome_meta
    didx = index.device
    load_s = time.time() - t0
    print(
        f"index loaded in {load_s:.0f}s: table {didx.table.shape}, "
        f"hits {didx.hits.shape[0]:,}, genome {didx.genome.shape[0]:,}",
        flush=True,
    )

    params = AlignParams(
        seed_len=index.seed_len, max_probe=index.max_probe,
        num_seeds=14, hit_cap=8, max_cand=16,
    )
    bases_np = np.asarray(genome.bases)
    L, B = args.read_len, args.batch
    fas = jnp.int64(genome.first_alt_start())

    rng = np.random.default_rng(0)
    # sample read starts inside contigs (avoid padding)
    contigs = genome.contigs
    cstarts = np.array([c.start for c in contigs], np.int64)
    clens = np.array([c.length for c in contigs], np.int64)
    cprob = clens / clens.sum()

    n_total = args.reads
    n_batches = (n_total + B - 1) // B
    done = 0
    found_total = 0
    mapq_hist = np.zeros(71, np.int64)
    pos_ok = 0
    quals = jnp.asarray(np.full((B, L), ord("I"), np.uint8))
    lens = jnp.asarray(np.full(B, L, np.int32))

    t1 = time.time()
    last_log = t1
    for bi in range(n_batches):
        ci = rng.choice(len(contigs), size=B, p=cprob)
        offs = (rng.random(B) * (clens[ci] - L - 1)).astype(np.int64)
        starts = cstarts[ci] + offs
        reads = bases_np[starts[:, None] + np.arange(L)[None, :]]
        mut = rng.random(reads.shape) < args.mutate
        reads = np.where(
            mut, rng.integers(0, 4, reads.shape), reads
        ).astype(np.uint8)
        win, _ = align_winners_device(
            didx, jnp.asarray(reads), quals, lens, fas, params
        )
        hw = HostWinners(np.asarray(jax.device_get(win)))
        found_total += int(hw.found.sum())
        np.add.at(mapq_hist, np.minimum(hw.mapq, 70), 1)
        body = hw.body_loc - 0  # body_loc = winner start location
        pos_ok += int(
            (np.abs(body.astype(np.int64) - starts) <= 32)[hw.found].sum()
        )
        done += B
        now = time.time()
        if now - last_log >= 30:
            rate = done / (now - t1)
            print(
                f"[{now - t1:7.0f}s] {done:,}/{n_total:,} reads "
                f"({rate:,.0f} reads/s)",
                flush=True,
            )
            last_log = now
    dt = time.time() - t1
    rate = done / dt
    rec = {
        "metric": "hg38_scale_10M_read_batch",
        "genome_bases": int(genome.num_bases),
        "index_load_seconds": round(load_s, 1),
        "reads": done,
        "align_seconds": round(dt, 1),
        "reads_per_sec": round(rate, 1),
        "frac_aligned": round(found_total / done, 4),
        "frac_pos_correct_of_aligned": round(
            pos_ok / max(1, found_total), 4
        ),
        "mapq_ge_10": int(mapq_hist[10:].sum()),
        "backend": jax.default_backend(),
    }
    with open(args.out, "w") as f:
        json.dump(rec, f, indent=1)
    print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
