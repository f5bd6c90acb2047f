"""Phase-level profile of the single-end device align step on TPU.

Reproduces bench.py's setup, then times individual jitted subgraphs to
attribute the step cost: seeding+probe, hit gather+dedup, gapless tier,
DP tier, finalize, winner D2H.
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def timeit(fn, n=8, warm=2):
    for _ in range(warm):
        r = fn()
    import jax

    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn()
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / n


def main():
    import jax
    import jax.numpy as jnp
    from snap_tpu.genome import Genome, Contig
    from snap_tpu.constants import PAD
    from snap_tpu.index.build import build_index
    from snap_tpu.index.index import make_device_index
    from snap_tpu.align.pipeline import (
        AlignParams,
        align_winners_device,
        align_tier1,
        align_single_device,
    )

    rng = np.random.default_rng(0)
    glen = 1_000_000
    read_len = 100
    batch = 16384

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

    starts = rng.integers(0, glen - read_len - 1, size=batch)
    reads = codes[starts[:, None] + np.arange(read_len)[None, :]]
    mut = rng.random(reads.shape) < 0.01
    reads = np.where(mut, rng.integers(0, 4, reads.shape), reads).astype(np.uint8)
    quals = np.full((batch, read_len), ord("I"), dtype=np.uint8)
    lens = np.full(batch, read_len, dtype=np.int32)

    b = jnp.asarray(reads)
    q = jnp.asarray(quals)
    l = jnp.asarray(lens)
    fas = jnp.int64(bases.shape[0])

    def rps(dt):
        return batch / dt

    # full fast path (what bench times), adaptive + not
    t = timeit(lambda: jax.device_get(
        align_winners_device(didx, b, q, l, fas, params, adaptive=True)[0]))
    print(f"adaptive full step + D2H: {t*1e3:8.2f} ms  {rps(t):>10,.0f} r/s")

    t = timeit(lambda: jax.device_get(
        align_winners_device(didx, b, q, l, fas, params, adaptive=False)[0]))
    print(f"non-adaptive + D2H:       {t*1e3:8.2f} ms  {rps(t):>10,.0f} r/s")

    w, out = align_winners_device(didx, b, q, l, fas, params, adaptive=True)
    t = timeit(lambda: jax.device_get(w))
    print(f"winner D2H alone:         {t*1e3:8.2f} ms  {rps(t):>10,.0f} r/s")

    # dispatch-only (device compute, block until ready)
    t = timeit(lambda: jax.block_until_ready(
        align_winners_device(didx, b, q, l, fas, params, adaptive=True)[0]))
    print(f"adaptive, block only:     {t*1e3:8.2f} ms  {rps(t):>10,.0f} r/s")

    # tier1 only (seeding + probe + gather + dedup + gapless)
    t = timeit(lambda: jax.block_until_ready(
        align_tier1(didx, b, q, l, params).gapless_dist))
    print(f"tier1 only:               {t*1e3:8.2f} ms  {rps(t):>10,.0f} r/s")

    # monolithic (tier1 + tier2, no finalize)
    t = timeit(lambda: jax.block_until_ready(
        align_single_device(didx, b, q, l, params).dist))
    print(f"align_single_device:      {t*1e3:8.2f} ms  {rps(t):>10,.0f} r/s")


if __name__ == "__main__":
    main()
