"""BASELINE config-5 demonstration: multi-chip paired-end hg38-style
pipeline — paired alignment over a (data x index) device mesh, sorted
BAM output with duplicate marking and a .bai index, all in one run.

Real v5e-16 hardware is not available in this environment, so the mesh
comes from XLA's virtual host devices (the same mechanism the driver's
dryrun_multichip uses); the code path exercised IS the production CLI
path (cli.cmd_paired -> GenomeIndex.to_mesh -> sharded wavefront ->
OutputWriter sort/dup/BGZF/bai chain). Run it as:

  XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
      python tools/demo_config5.py [--out CONFIG5_r2.json]

Validates, from the produced BAM: coordinate sort order, PCR-duplicate
flagging of planted duplicate pairs, .bai presence, proper-pair rate.
Reference behaviors matched: sorted-output dup marking on by default
(Bam.cpp:950-951), duplicate key = both mates' unclipped 5' + RC flags
(Bam.cpp:2398-2464), best-of-group by base-quality sum.
"""

import argparse
import json
import os
import subprocess
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(__file__))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from golden_harness import gen_genome, gen_pairs, write_fasta, write_fastq


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="CONFIG5_r2.json")
    ap.add_argument("--workdir", default="/tmp/config5")
    ap.add_argument("--genome-size", type=int, default=1_000_000)
    ap.add_argument("--pairs", type=int, default=3000)
    ap.add_argument("--repeat-frac", type=float, default=0.25)
    ap.add_argument("--dup-frac", type=float, default=0.08)
    ap.add_argument("--ishards", type=int, default=2)
    ap.add_argument("--batch", type=int, default=4096)
    args = ap.parse_args()

    os.makedirs(args.workdir, exist_ok=True)
    rng = np.random.default_rng(5)
    contigs = gen_genome(
        rng, args.genome_size, n_contigs=2, repeat_frac=args.repeat_frac
    )
    fa = os.path.join(args.workdir, "g.fa")
    write_fasta(contigs, fa)
    r1, r2 = gen_pairs(rng, contigs, args.pairs, 100, 0.01, 0.001)
    # plant PCR duplicates: identical sequences under new names
    n_dup = int(args.pairs * args.dup_frac)
    dup_src = rng.choice(args.pairs, size=n_dup, replace=False)
    for k, i in enumerate(dup_src):
        r1.append((f"dup{k}", r1[i][1], r1[i][2]))
        r2.append((f"dup{k}", r2[i][1], r2[i][2]))
    fq1 = os.path.join(args.workdir, "r1.fq")
    fq2 = os.path.join(args.workdir, "r2.fq")
    write_fastq(r1, fq1)
    write_fastq(r2, fq2)

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"  # virtual mesh, not the axon chip
    flags = env.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        env["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()
    repo = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")

    idx_dir = os.path.join(args.workdir, "idx")
    bam = os.path.join(args.workdir, "out.bam")
    t0 = time.time()
    subprocess.run(
        [sys.executable, "-m", "snap_tpu.cli", "index", fa, idx_dir],
        env=env, check=True,
    )
    t_index = time.time() - t0
    t0 = time.time()
    subprocess.run(
        [
            sys.executable, "-m", "snap_tpu.cli", "paired", idx_dir,
            fq1, fq2, "-o", bam, "-so",
            "-ishards", str(args.ishards), "-b", str(args.batch),
        ],
        env=env, check=True,
    )
    t_align = time.time() - t0

    # ---- validation from the BAM itself ----
    import snap_tpu  # noqa: F401
    from snap_tpu.io.bam import read_bam

    header_text, ref_names, records = read_bam(bam)
    locs = [
        (r.ref_id, r.pos0) for r in records if not (r.flag & 0x4)
    ]
    sorted_ok = all(locs[i] <= locs[i + 1] for i in range(len(locs) - 1))
    n = len(records)
    dup_flagged = sum(1 for r in records if r.flag & 0x400)
    proper = sum(1 for r in records if r.flag & 0x2)
    mapped = sum(1 for r in records if not (r.flag & 0x4))
    bai_ok = os.path.exists(bam + ".bai")

    # every planted duplicate pair should be flagged (2 records each),
    # modulo pairs whose source also duplicated by chance; require 90%
    want_dups = 2 * n_dup
    rec = {
        "metric": "config5_mesh_paired_sorted_bam_dupmark",
        "devices": 8,
        "index_shards": args.ishards,
        "pairs": args.pairs + n_dup,
        "index_seconds": round(t_index, 1),
        "align_seconds": round(t_align, 1),
        "reads_per_sec": round(2 * (args.pairs + n_dup) / t_align, 1),
        "records": n,
        "mapped_frac": round(mapped / n, 4),
        "proper_pair_frac": round(proper / n, 4),
        "coordinate_sorted": bool(sorted_ok),
        "bai_present": bool(bai_ok),
        "planted_dup_records": want_dups,
        "dup_flagged_records": int(dup_flagged),
        "sort_order_header": "SO:coordinate" in header_text,
    }
    ok = (
        sorted_ok
        and bai_ok
        and mapped / n > 0.97
        and proper / n > 0.9
        and dup_flagged >= 0.9 * want_dups
    )
    rec["pass"] = bool(ok)
    with open(args.out, "w") as f:
        json.dump(rec, f, indent=1)
    print(json.dumps(rec), flush=True)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
