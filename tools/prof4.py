"""Round-4 device-step profiler with per-stage progress logging.

Writes timestamped progress lines to stderr (unbuffered) so a hung
stage is identifiable, and a final JSON summary to stdout. Stages are
compiled in increasing graph-size order: probe, gather, tier1,
non-adaptive full, adaptive full.

Usage: python -u tools/prof4.py [--batch 16384] [--stages probe,...]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

T0 = time.time()


def log(msg):
    print(f"[{time.time() - T0:8.1f}s] {msg}", file=sys.stderr, flush=True)


def timeit(fn, n=8, warm=1):
    """Forced-materialization timing: the axon plugin's
    block_until_ready can return before execution completes, so the
    measurement fetches an output leaf to the host (a device_get of a
    tiny slice still forces the producing computation). The device
    executes enqueued programs in order, so syncing only the LAST of n
    back-to-back dispatches amortizes the ~tens-of-ms link round trip
    across all n samples."""
    import jax
    import jax.tree_util as jtu

    def sync(r):
        leaf = jtu.tree_leaves(r)[0]
        jax.device_get(leaf[:1] if getattr(leaf, "ndim", 0) else leaf)

    for i in range(warm):
        t0 = time.perf_counter()
        sync(fn())
        log(f"  warm {i}: {time.perf_counter() - t0:.2f}s")
    t0 = time.perf_counter()
    r = None
    for _ in range(n):
        r = fn()
    sync(r)
    return (time.perf_counter() - t0) / n


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16384)
    ap.add_argument(
        "--stages",
        default="dget,probe,gather,tier1,full,adaptive",
    )
    args = ap.parse_args()
    stages = set(args.stages.split(","))

    import jax
    import jax.numpy as jnp

    log(f"backend: {jax.default_backend()} {jax.devices()}")

    from snap_tpu.genome import Genome, Contig
    from snap_tpu.constants import PAD
    from snap_tpu.index.build import build_index
    from snap_tpu.index.index import (
        make_device_index, probe, gather_hits, pack_read_seeds,
    )
    from snap_tpu.align.pipeline import (
        AlignParams, align_winners_device, align_tier1,
    )

    rng = np.random.default_rng(0)
    glen = 1_000_000
    read_len = 100
    batch = args.batch

    codes = rng.integers(0, 4, size=glen).astype(np.uint8)
    bases = np.full(glen + 2000, PAD, dtype=np.uint8)
    bases[1000 : 1000 + glen] = codes
    genome = Genome(
        bases=bases, contigs=[Contig(name="chr1", start=1000, length=glen)]
    )
    log("building index...")
    idx = build_index(genome, seed_len=24)
    log("uploading index...")
    didx = make_device_index(idx, bases)
    jax.block_until_ready(didx)
    log("index on device")
    params = AlignParams(
        seed_len=24, max_probe=idx["max_probe"], num_seeds=25,
        hit_cap=8, max_cand=16,
    )

    starts = rng.integers(0, glen - read_len - 1, size=batch)
    reads = codes[starts[:, None] + np.arange(read_len)[None, :]]
    mut = rng.random(reads.shape) < 0.01
    reads = np.where(mut, rng.integers(0, 4, reads.shape), reads).astype(
        np.uint8
    )
    quals = np.full((batch, read_len), ord("I"), dtype=np.uint8)
    lens = np.full(batch, read_len, dtype=np.int32)

    b = jnp.asarray(reads)
    q = jnp.asarray(quals)
    l = jnp.asarray(lens)
    fas = jnp.int64(bases.shape[0])
    res = {}

    if "dget" in stages:
        log("first device_get (link setup)...")
        t0 = time.perf_counter()
        jax.device_get(jnp.sum(b))
        res["first_dget_s"] = time.perf_counter() - t0
        log(f"  {res['first_dget_s']:.1f}s")
        # per-sample sync overhead (dispatch RTT + tiny fetch): every
        # timeit sample below pays this once — subtract it when
        # reading unit times
        tiny = jnp.arange(8)

        @jax.jit
        def null_op(x):
            return x + 1

        t = timeit(lambda: null_op(tiny))
        res["sync_overhead_ms"] = t * 1e3
        log(f"  sync overhead: {t*1e3:.1f} ms/sample")

    S = params.num_lookups
    H = params.hit_cap

    if "probe" in stages:
        log("compile+run: probe subgraph")

        @jax.jit
        def probe_only(didx, bases):
            fwd, rc, valid = pack_read_seeds(bases, params.seed_len)
            # take S evenly spaced offsets (cheap proxy for the rank sel)
            offs = jnp.linspace(
                0, read_len - params.seed_len, S
            ).astype(jnp.int64)[None, :]
            sf = jnp.take_along_axis(fwd, jnp.broadcast_to(offs, (batch, S)), axis=1)
            sr = jnp.take_along_axis(rc, jnp.broadcast_to(offs, (batch, S)), axis=1)
            canon = jnp.minimum(sf, sr)
            return probe(didx, canon.reshape(-1), params.max_probe)

        t = timeit(lambda: probe_only(didx, b))
        res["probe_ms"] = t * 1e3
        log(f"  probe: {t*1e3:.1f} ms ({batch/t:,.0f} r/s)")

    if "gather" in stages:
        log("compile+run: probe+gather subgraph")

        @jax.jit
        def probe_gather(didx, bases):
            fwd, rc, valid = pack_read_seeds(bases, params.seed_len)
            offs = jnp.linspace(
                0, read_len - params.seed_len, S
            ).astype(jnp.int64)[None, :]
            sf = jnp.take_along_axis(fwd, jnp.broadcast_to(offs, (batch, S)), axis=1)
            sr = jnp.take_along_axis(rc, jnp.broadcast_to(offs, (batch, S)), axis=1)
            canon = jnp.minimum(sf, sr)
            found, start, n0, n1 = probe(
                didx, canon.reshape(-1), params.max_probe
            )
            f_locs, f_valid = gather_hits(didx.hits, start, n0, H)
            r_locs, r_valid = gather_hits(
                didx.hits, start + n0.astype(jnp.int64), n1, H
            )
            return f_locs.sum() + r_locs.sum()

        t = timeit(lambda: probe_gather(didx, b))
        res["probe_gather_ms"] = t * 1e3
        log(f"  probe+gather: {t*1e3:.1f} ms ({batch/t:,.0f} r/s)")

    if "tier1" in stages:
        log("compile+run: tier1 (cand gen + gapless)")
        t = timeit(
            lambda: align_tier1(didx, b, q, l, params).gapless_dist
        )
        res["tier1_ms"] = t * 1e3
        log(f"  tier1: {t*1e3:.1f} ms ({batch/t:,.0f} r/s)")

    if "units" in stages:
        # the adaptive production step's own jit units, phase-A shapes
        import dataclasses

        from snap_tpu.align.pipeline import (
            _awd_candidates, _awd_finalize, _awd_score,
        )

        Ppos = read_len - params.seed_len + 1
        s1 = (Ppos - 1) // params.seed_len + 1 if Ppos > 0 else 1
        K_A = min(4, params.max_cand)
        params_a = dataclasses.replace(
            params, num_seeds=2 * s1 - 2, max_cand=K_A
        )
        dp_a = max(512, (batch * K_A) // 64)
        log("compile+run: phase-A candidates")
        bundle, _low = _awd_candidates(
            didx, b, q, l, params_a, return_lowest=True
        )
        t = timeit(
            lambda: _awd_candidates(
                didx, b, q, l, params_a, return_lowest=True
            )[0][0]
        )
        res["a_cand_ms"] = t * 1e3
        log(f"  A candidates: {t*1e3:.1f} ms")
        log("compile+run: phase-A scoring")
        out_a, needs_a = _awd_score(didx, b, q, bundle, params_a, dp_a)
        t = timeit(
            lambda: _awd_score(didx, b, q, bundle, params_a, dp_a)[0].dist
        )
        res["a_score_ms"] = t * 1e3
        log(f"  A scoring: {t*1e3:.1f} ms")
        log("compile+run: phase-A finalize (incl. winner_flags)")
        t = timeit(
            lambda: _awd_finalize(
                didx, b, out_a, fas, needs_a, params, dp_a, True, 64,
                return_scores=True,
            )[0]
        )
        res["a_final_ms"] = t * 1e3
        log(f"  A finalize: {t*1e3:.1f} ms")

    if "full" in stages:
        log("compile+run: non-adaptive full step (device time)")
        t = timeit(
            lambda: align_winners_device(
                didx, b, q, l, fas, params, adaptive=False
            )[0]
        )
        res["full_ms"] = t * 1e3
        log(f"  full non-adaptive: {t*1e3:.1f} ms ({batch/t:,.0f} r/s)")

    if "adaptive" in stages:
        log("compile+run: adaptive full step (device time; the bench's"
            " pipelined loop adds the overlapped winner D2H)")
        t = timeit(
            lambda: align_winners_device(
                didx, b, q, l, fas, params, adaptive=True
            )[0]
        )
        res["adaptive_ms"] = t * 1e3
        log(f"  adaptive: {t*1e3:.1f} ms ({batch/t:,.0f} r/s)")

    res["batch"] = batch
    print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
