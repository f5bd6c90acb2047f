"""hg38-scale index build demonstration (BASELINE config 4 groundwork).

Synthesizes a 3.1Gbp genome (random base composition plus ~8% repeated
segments so overflow lists and bank imbalance are exercised), then runs
the chunked external builder under a fixed memory budget and saves the
index. Usage:

  python tools/build_big_index.py <outdir> [--gbp 3.1] [--budget-gb 24]

Prints progress lines; the final line reports wall time and sizes.
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("outdir")
    ap.add_argument("--gbp", type=float, default=3.1)
    ap.add_argument("--budget-gb", type=float, default=24.0)
    ap.add_argument("--seed-len", type=int, default=24)
    ap.add_argument("--load-factor", type=float, default=0.85)
    args = ap.parse_args()

    from snap_tpu.constants import PAD
    from snap_tpu.genome import Contig, Genome
    from snap_tpu.index.build import build_index_chunked, save_index

    t0 = time.time()
    n = int(args.gbp * 1e9)
    rng = np.random.default_rng(42)
    print(f"synthesizing {n:,} bases...", flush=True)
    codes = rng.integers(0, 4, size=n, dtype=np.uint8)
    # plant repeats: a 50kb unit copied ~500 times, a 5kb unit ~5000
    # times (~8% of the genome repetitive, like real mammalian content)
    rep1 = codes[1_000_000 : 1_050_000].copy()
    rep2 = codes[2_000_000 : 2_005_000].copy()
    spots1 = rng.integers(0, n - rep1.size, size=500)
    for s in spots1:
        codes[s : s + rep1.size] = rep1
    spots2 = rng.integers(0, n - rep2.size, size=5000)
    for s in spots2:
        codes[s : s + rep2.size] = rep2

    # 24 contigs of ~equal size, SNAP layout (padding before each
    # contig + one trailing run, first contig at exactly pad)
    n_contigs = 24
    clen = n // n_contigs
    pad = 2000
    total = n_contigs * (pad + clen) + pad
    bases = np.full(total, PAD, dtype=np.uint8)
    contigs = []
    off = 0
    for c in range(n_contigs):
        off += pad
        bases[off : off + clen] = codes[c * clen : (c + 1) * clen]
        contigs.append(Contig(name=f"chr{c + 1}", start=off, length=clen))
        off += clen
    del codes
    genome = Genome(bases=bases, contigs=contigs)
    print(
        f"genome ready ({total:,} padded bases, {time.time() - t0:.0f}s)",
        flush=True,
    )

    t1 = time.time()
    last = [0.0]

    def status(s):
        now = time.time()
        if now - last[0] >= 15:
            print(f"[{now - t1:7.0f}s] {s}", flush=True)
            last[0] = now

    arrays = build_index_chunked(
        genome, args.seed_len, load_factor=args.load_factor,
        memory_budget_gb=args.budget_gb,
        tmpdir=os.path.join(args.outdir + ".tmp"),
        status=status,
    )
    print(f"build done in {time.time() - t1:.0f}s; saving...", flush=True)
    save_index(arrays, genome, args.outdir)
    import shutil

    tmpd = arrays.get("_tmpdir")
    if tmpd:
        shutil.rmtree(tmpd, ignore_errors=True)
    shutil.rmtree(args.outdir + ".tmp", ignore_errors=True)

    sizes = {
        f: os.path.getsize(os.path.join(args.outdir, f)) / 1e9
        for f in os.listdir(args.outdir)
    }
    print(
        f"TOTAL {time.time() - t0:.0f}s wall; table banks "
        f"{arrays['table'].shape}, span {arrays['max_probe']}; sizes(GB): "
        + ", ".join(f"{k}={v:.2f}" for k, v in sorted(sizes.items())),
        flush=True,
    )


if __name__ == "__main__":
    main()
