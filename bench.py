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


def _gen_repeat_genome(rng, glen: int, repeat_frac: float) -> np.ndarray:
    """Synthetic genome with planted repeats (same model as
    tools/golden_harness.py --repeat-frac): ~300bp SINE-like units with
    1% divergence, 6kb LINE-like units, and tandem microsatellites."""
    seq = rng.integers(0, 4, size=glen).astype(np.uint8)
    budget = int(glen * repeat_frac)
    alu = rng.integers(0, 4, size=300).astype(np.uint8)
    for _ in range(max(1, budget // 2 // 300)):
        p = int(rng.integers(0, glen - 300))
        u = alu.copy()
        d = rng.random(300) < 0.01
        u[d] = rng.integers(0, 4, int(d.sum()))
        seq[p : p + 300] = u
    line = rng.integers(0, 4, size=6000).astype(np.uint8)
    for _ in range(max(1, budget // 2 // 6000)):
        p = int(rng.integers(0, glen - 6000))
        seq[p : p + 6000] = line
    for _ in range(max(1, glen // 20000)):
        unit = rng.integers(0, 4, size=4).astype(np.uint8)
        reps = int(rng.integers(20, 60))
        p = int(rng.integers(0, glen - 4 * reps))
        seq[p : p + 4 * reps] = np.tile(unit, reps)
    return seq


def main() -> None:
    import snap_tpu  # noqa: F401
    from snap_tpu import errors as _errors

    # the per-batch progress lines include jit-compile time in their
    # first samples, which reads like a collapse in logs; the JSON
    # line below is the artifact
    _errors.configure(quiet=True)
    import jax
    import jax.numpy as jnp
    from snap_tpu.genome import Genome, Contig
    from snap_tpu.constants import PAD
    from snap_tpu.index.build import build_index
    from snap_tpu.index.index import DeviceIndex
    from snap_tpu.align.pipeline import AlignParams, align_single_device

    rng = np.random.default_rng(0)
    glen = 1_000_000  # 1Mbp synthetic genome; the HEADLINE number uses
    # a 25% repeat-content genome (SINE/LINE-like units + tandem
    # microsatellites) because the reference's paper reports >3/4 of
    # real alignment time in >=512-hit pairs — a uniform-random genome
    # has near-zero repeat content and flatters the easy case. The
    # random-genome step rate is reported as a secondary key.
    read_len = 100
    batch = 16384

    codes = _gen_repeat_genome(rng, glen, repeat_frac=0.25)
    bases = np.full(glen + 2000, PAD, dtype=np.uint8)
    bases[1000 : 1000 + glen] = codes
    genome = Genome(
        bases=bases, contigs=[Contig(name="chr1", start=1000, length=glen)]
    )
    idx = build_index(genome, seed_len=24)
    from snap_tpu.index.index import make_device_index

    didx = make_device_index(idx, bases)
    # SNAP's single-end defaults: -n 25 seeds (AlignerOptions.cpp:115)
    # with the seed-loop early stop (BaseAligner.cpp:1028) — replayed
    # here as the adaptive two-phase wavefront
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

    # Measure the production fast path: the full align wavefront
    # (candidates, gapless prescreen, device-gated DP tier, device
    # winner selection + MAPQ) with only the compact per-read winners
    # crossing device->host. Timing materializes the winners on the
    # host every iteration (device_get): the axon plugin's
    # block_until_ready can return before execution completes, so
    # dispatch-only loops would look absurdly fast.
    from snap_tpu.align.pipeline import align_winners_device

    fas = jnp.int64(bases.shape[0])  # no ALT contigs
    win, _out = align_winners_device(didx, b, q, l, fas, params, adaptive=True)
    jax.device_get(win)  # compile + settle

    # Pipelined like the production align_file loop: batch i+1 is
    # dispatched before batch i's winners transfer, so device compute
    # overlaps the device->host hop.
    def timed_step(dx, bb, qq, ll, n_iters=8):
        t0 = time.perf_counter()
        win_next, _ = align_winners_device(
            dx, bb, qq, ll, fas, params, adaptive=True
        )
        for _ in range(n_iters - 1):
            win_cur = win_next
            win_next, _ = align_winners_device(
                dx, bb, qq, ll, fas, params, adaptive=True
            )
            jax.device_get(win_cur)
        jax.device_get(win_next)
        return batch * n_iters / (time.perf_counter() - t0)

    reads_per_sec = timed_step(didx, b, q, l)

    # secondary: the same step on a uniform-random genome (the easy,
    # near-zero-repeat case — kept for comparability with r01-r03)
    rcodes = rng.integers(0, 4, size=glen).astype(np.uint8)
    rbases = np.full(glen + 2000, PAD, dtype=np.uint8)
    rbases[1000 : 1000 + glen] = rcodes
    rgenome = Genome(
        bases=rbases, contigs=[Contig(name="chr1", start=1000, length=glen)]
    )
    ridx = build_index(rgenome, seed_len=24)
    rdidx = make_device_index(ridx, rbases)
    rstarts = rng.integers(0, glen - read_len - 1, size=batch)
    rreads = rcodes[rstarts[:, None] + np.arange(read_len)[None, :]]
    rmut = rng.random(rreads.shape) < 0.01
    rreads = np.where(
        rmut, rng.integers(0, 4, rreads.shape), rreads
    ).astype(np.uint8)
    rb = jnp.asarray(rreads)
    jax.device_get(
        align_winners_device(rdidx, rb, q, l, fas, params, adaptive=True)[0]
    )
    random_rps = timed_step(rdidx, rb, q, l)

    # ---- end-to-end FASTQ -> SAM bytes (the whole production driver:
    # native FASTQ parse, device align, batched native SAM emission).
    # Runs in a timeout-bounded subprocess: the remote compile service
    # occasionally loses an RPC response and the requesting process
    # hangs forever — a wedged e2e half must not take the headline
    # step measurement down with it (a fresh process retries the same
    # cached-compile keys and normally sails through).
    e2e_rps = paired_rps = None
    for attempt in range(2):
        res = _run_e2e_subprocess(timeout_s=2100)
        if res is not None:
            e2e_rps, paired_rps = res
            break

    print(
        json.dumps(
            {
                "metric": "single_end_align_step_reads_per_sec_per_chip",
                "value": round(reads_per_sec, 1),
                "unit": "reads/s/chip",
                "vs_baseline": round(
                    reads_per_sec / BASELINE_READS_PER_SEC_PER_CHIP, 4
                ),
                "genome": "1Mbp, 25% repeat content",
                "random_genome_step_reads_per_sec": round(random_rps, 1),
                "e2e_fastq_to_sam_reads_per_sec": (
                    round(e2e_rps, 1) if e2e_rps else None
                ),
                "paired_e2e_reads_per_sec": (
                    round(paired_rps, 1) if paired_rps else None
                ),
            }
        )
    )


def _run_e2e_subprocess(timeout_s: int):
    """Run `bench.py --e2e-only` in a child; returns (e2e, paired) or
    None on timeout/failure."""
    import json as _json
    import os
    import subprocess
    import sys

    try:
        r = subprocess.run(
            [sys.executable, "-u", os.path.abspath(__file__),
             "--e2e-only"],
            capture_output=True, timeout=timeout_s, text=True,
        )
    except subprocess.TimeoutExpired:
        return None
    if r.returncode != 0:
        return None
    for ln in reversed(r.stdout.strip().splitlines()):
        try:
            d = _json.loads(ln)
            return d["e2e"], d["paired"]
        except Exception:
            continue
    return None


def _e2e_only() -> None:
    import snap_tpu  # noqa: F401
    from snap_tpu import errors as _errors

    _errors.configure(quiet=True)
    rng = np.random.default_rng(0)
    glen = 1_000_000
    read_len = 100
    batch = 16384
    from snap_tpu.constants import PAD
    from snap_tpu.genome import Contig, Genome

    codes = _gen_repeat_genome(rng, glen, repeat_frac=0.25)
    bases = np.full(glen + 2000, PAD, dtype=np.uint8)
    bases[1000 : 1000 + glen] = codes
    genome = Genome(
        bases=bases, contigs=[Contig(name="chr1", start=1000, length=glen)]
    )
    e2e_rps, paired_rps = _bench_end_to_end(
        genome, codes, glen, read_len, batch
    )
    print(json.dumps({"e2e": e2e_rps, "paired": paired_rps}))


def _bench_end_to_end(genome, codes, glen, read_len, batch):
    """Full FASTQ->SAM wall-clock throughput, single and paired.

    Measures what `snap-tpu single/paired` deliver end to end (the
    reference reports reads/s the same way, AlignerContext.cpp:533-573):
    file parse, device wavefront, host finalization, record emission,
    output write. First pass warms the jit caches; the timed pass runs
    the same files again.
    """
    import io
    import os
    import tempfile
    import time as _time

    import numpy as np

    from snap_tpu.align.pipeline import AlignParams
    from snap_tpu.align.single import SingleEndAligner
    from snap_tpu.align.paired_driver import PairedEndAligner
    from snap_tpu.index.index import GenomeIndex
    from snap_tpu.io.sam import SamWriter

    rng = np.random.default_rng(1)
    n_single = 8 * batch
    n_pairs = 2 * batch
    DEC = np.frombuffer(b"ACGT", np.uint8)

    index = GenomeIndex.build(genome, 24)
    params = AlignParams(seed_len=24, max_probe=index.max_probe)

    with tempfile.TemporaryDirectory() as td:
        fq = os.path.join(td, "r.fq")
        starts = rng.integers(0, glen - read_len - 1, size=n_single)
        rd = codes[starts[:, None] + np.arange(read_len)[None, :]]
        mut = rng.random(rd.shape) < 0.01
        rd = np.where(mut, rng.integers(0, 4, rd.shape), rd).astype(np.uint8)
        qline = b"I" * read_len
        with open(fq, "wb") as f:
            for i in range(n_single):
                f.write(
                    b"@r%d\n%s\n+\n%s\n"
                    % (i, DEC[rd[i]].tobytes(), qline)
                )

        def run_single():
            aligner = SingleEndAligner(
                index, params, batch_size=batch, max_read_len=read_len
            )
            with open(os.path.join(td, "out.sam"), "wb") as f:
                w = SamWriter(out=f, genome=genome, command_line="bench")
                aligner.align_file(fq, w)

        run_single()  # warm the jit caches
        t0 = _time.perf_counter()
        run_single()
        e2e_rps = n_single / (_time.perf_counter() - t0)

        # paired: proper FR pairs, insert 200..400
        fq1, fq2 = os.path.join(td, "r1.fq"), os.path.join(td, "r2.fq")
        ins = rng.integers(2 * read_len, 400, size=n_pairs)
        p1 = rng.integers(0, glen - 401, size=n_pairs)
        r1 = codes[p1[:, None] + np.arange(read_len)[None, :]]
        p2 = p1 + ins - read_len
        r2f = codes[p2[:, None] + np.arange(read_len)[None, :]]
        r2 = (3 - r2f[:, ::-1]) % 4
        with open(fq1, "wb") as f1, open(fq2, "wb") as f2:
            for i in range(n_pairs):
                f1.write(
                    b"@p%d/1\n%s\n+\n%s\n"
                    % (i, DEC[r1[i]].tobytes(), qline)
                )
                f2.write(
                    b"@p%d/2\n%s\n+\n%s\n"
                    % (i, DEC[r2[i].astype(np.uint8)].tobytes(), qline)
                )

        def run_paired():
            aligner = PairedEndAligner(
                index, params, batch_size=batch, max_read_len=read_len
            )
            with open(os.path.join(td, "outp.sam"), "wb") as f:
                w = SamWriter(out=f, genome=genome, command_line="bench")
                aligner.align_files(fq1, fq2, w)

        run_paired()
        t0 = _time.perf_counter()
        run_paired()
        paired_rps = 2 * n_pairs / (_time.perf_counter() - t0)

    return e2e_rps, paired_rps


if __name__ == "__main__":
    import sys as _sys

    if "--e2e-only" in _sys.argv:
        _e2e_only()
    else:
        main()
