"""Benchmark: single-end alignment device throughput (reads/sec/chip).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline: the reference's north-star target is 5M 100bp reads/s on a
v5e-16 (BASELINE.md), i.e. 312,500 reads/s/chip. vs_baseline is
measured reads/s/chip divided by that.

The measured step is the jitted align wavefront (seed lookup, candidate
generation, DP scoring) on synthetic 100bp reads over a 1Mbp random
genome — a proxy for BASELINE config 1 (E. coli single-end LV).
"""

from __future__ import annotations

import json
import time

import numpy as np

BASELINE_READS_PER_SEC_PER_CHIP = 5_000_000 / 16


def main() -> None:
    import snap_tpu  # noqa: F401
    import jax
    import jax.numpy as jnp
    from snap_tpu.genome import Genome, Contig
    from snap_tpu.constants import PAD
    from snap_tpu.index.build import build_index
    from snap_tpu.index.index import DeviceIndex
    from snap_tpu.align.pipeline import AlignParams, align_single_device

    rng = np.random.default_rng(0)
    glen = 1_000_000  # representative bacterial-scale genome
    read_len = 100
    batch = 16384

    codes = rng.integers(0, 4, size=glen).astype(np.uint8)
    bases = np.full(glen + 2000, PAD, dtype=np.uint8)
    bases[1000 : 1000 + glen] = codes
    genome = Genome(
        bases=bases, contigs=[Contig(name="chr1", start=1000, length=glen)]
    )
    idx = build_index(genome, seed_len=24)
    from snap_tpu.index.index import make_device_index

    didx = make_device_index(idx, bases)
    params = AlignParams(
        seed_len=24, max_probe=idx["max_probe"], num_seeds=14,
        hit_cap=8, max_cand=16,
    )

    starts = rng.integers(0, glen - read_len - 1, size=batch)
    reads = codes[starts[:, None] + np.arange(read_len)[None, :]]
    mut = rng.random(reads.shape) < 0.01
    reads = np.where(mut, rng.integers(0, 4, reads.shape), reads).astype(np.uint8)
    quals = np.full((batch, read_len), ord("I"), dtype=np.uint8)
    lens = np.full(batch, read_len, dtype=np.int32)

    b = jnp.asarray(reads)
    q = jnp.asarray(quals)
    l = jnp.asarray(lens)

    # Measure the production fast path: the full align wavefront
    # (candidates, gapless prescreen, device-gated DP tier, device
    # winner selection + MAPQ) with only the compact per-read winners
    # crossing device->host. Timing materializes the winners on the
    # host every iteration (device_get): the axon plugin's
    # block_until_ready can return before execution completes, so
    # dispatch-only loops would look absurdly fast.
    from snap_tpu.align.pipeline import align_winners_device

    fas = jnp.int64(bases.shape[0])  # no ALT contigs
    win, _out = align_winners_device(didx, b, q, l, fas, params)
    jax.device_get(win)  # compile + settle

    # Pipelined like the production align_file loop: batch i+1 is
    # dispatched before batch i's winners transfer, so device compute
    # overlaps the device->host hop.
    n_iters = 8
    t0 = time.perf_counter()
    win_next, _ = align_winners_device(didx, b, q, l, fas, params)
    for _ in range(n_iters - 1):
        win_cur = win_next
        win_next, _ = align_winners_device(didx, b, q, l, fas, params)
        jax.device_get(win_cur)
    jax.device_get(win_next)
    dt = time.perf_counter() - t0

    reads_per_sec = batch * n_iters / dt
    print(
        json.dumps(
            {
                "metric": "single_end_align_step_reads_per_sec_per_chip",
                "value": round(reads_per_sec, 1),
                "unit": "reads/s/chip",
                "vs_baseline": round(
                    reads_per_sec / BASELINE_READS_PER_SEC_PER_CHIP, 4
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
