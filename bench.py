"""Benchmark: single-end alignment device throughput (reads/sec/chip).

Prints ONE final JSON line: {"metric", "value", "unit", "vs_baseline"}.
Intermediate copies of the same artifact line are printed (flushed)
after every completed stage, so a wedged later stage — or the driver's
outer timeout — can never erase an already-measured number. This is
the round-4 postmortem fix: BENCH_r04 was rc=124 with zero output
because the old single-process bench compiled everything before
printing anything. The reference prints reads/s per run
unconditionally (/root/reference/SNAPLib/AlignerContext.cpp:533-573);
this bench now does the moral equivalent.

Structure:
  parent (this process, never imports jax):
    - spawns `bench.py --stage main` (headline + random-genome step
      rates) and `bench.py --stage e2e` (FASTQ->SAM single + paired)
      as timeout-bounded subprocesses, one retry each; children
      stream one JSON line per completed measurement, so a child
      killed mid-stage still delivers its finished measurements;
    - prints the merged artifact line after every update;
    - traps SIGTERM/SIGINT and prints the artifact before dying.
  children: stderr -> log file (compile-progress lines), stdout ->
    parent pipe (JSON only).

Baseline: the reference's north-star target is 5M 100bp reads/s on a
v5e-16 (BASELINE.md), i.e. 312,500 reads/s/chip. vs_baseline is
measured reads/s/chip divided by that.

The measured step is the jitted align wavefront (seed lookup,
candidate generation, DP scoring) on synthetic 100bp reads over a
1Mbp genome with 25% repeat content (the paper puts >3/4 of real
alignment time in >=512-hit pairs, so a uniform-random genome
flatters the easy case); the uniform-random rate is a secondary key.
"""

from __future__ import annotations

import json
import os
import signal
import sys
import time

import numpy as np

BASELINE_READS_PER_SEC_PER_CHIP = 5_000_000 / 16

# Parent wall-clock budget. The driver wraps `python bench.py` in its
# own timeout; stay under it and print what we have. Override with
# SNAP_BENCH_BUDGET_S.
BUDGET_S = float(os.environ.get("SNAP_BENCH_BUDGET_S", "3200"))
T0 = time.time()


def _remaining() -> float:
    return BUDGET_S - (time.time() - T0)


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


# ---------------------------------------------------------------- parent

RESULT: dict = {
    "metric": "single_end_align_step_reads_per_sec_per_chip",
    "value": None,
    "unit": "reads/s/chip",
    "vs_baseline": None,
    "genome": "1Mbp, 25% repeat content",
    "random_genome_step_reads_per_sec": None,
    "e2e_fastq_to_sam_reads_per_sec": None,
    "paired_e2e_reads_per_sec": None,
    # Device link health, measured in-run: the packed winners cross
    # device->host at 24 B/read, so on a degraded tunnel the step rate
    # is link-bound at ~link_bytes/24 regardless of compute speed
    # (sessions vary 0.5-60 MB/s on this link; see PERF.md). A reader
    # comparing rounds should divide these two numbers first.
    "host_link_mbytes_per_sec": None,
    "winner_d2h_bytes_per_read": 24,
}

_KEYMAP = {
    "headline": "value",
    "random": "random_genome_step_reads_per_sec",
    "e2e": "e2e_fastq_to_sam_reads_per_sec",
    "paired": "paired_e2e_reads_per_sec",
    "link": "host_link_mbytes_per_sec",
}


def _print_artifact() -> None:
    if RESULT["value"] is not None:
        RESULT["vs_baseline"] = round(
            RESULT["value"] / BASELINE_READS_PER_SEC_PER_CHIP, 4
        )
    print(json.dumps(RESULT), flush=True)


def _run_stage_child(stage: str, timeout_s: float) -> bool:
    """Run `bench.py --stage <stage>` streaming its JSON lines into
    RESULT; print the merged artifact after each update. Returns True
    if the child exited cleanly."""
    import subprocess

    if timeout_s <= 30:
        return False
    log_path = os.path.join(
        os.environ.get("TMPDIR", "/tmp"), f"snap_bench_{stage}.log"
    )
    logf = open(log_path, "ab")
    proc = subprocess.Popen(
        [sys.executable, "-u", os.path.abspath(__file__), "--stage", stage],
        stdout=subprocess.PIPE,
        stderr=logf,
        text=True,
    )
    deadline = time.time() + timeout_s
    got_any = False
    import queue
    import threading

    q: "queue.Queue[str | None]" = queue.Queue()

    def _reader():
        for line in proc.stdout:
            q.put(line)
        q.put(None)

    threading.Thread(target=_reader, daemon=True).start()
    try:
        while True:
            left = deadline - time.time()
            if left <= 0:
                proc.kill()
                proc.wait()
                return got_any
            try:
                line = q.get(timeout=min(left, 5.0))
            except queue.Empty:
                continue
            if line is None:
                break
            try:
                d = json.loads(line)
            except Exception:
                continue
            k = d.get("key")
            if k in _KEYMAP and d.get("value") is not None:
                RESULT[_KEYMAP[k]] = round(float(d["value"]), 1)
                got_any = True
                _print_artifact()
        proc.wait()
    finally:
        logf.close()
        if proc.poll() is None:
            proc.kill()
            proc.wait()
    return proc.returncode == 0 or got_any


def main() -> None:
    def _die(signum, frame):  # noqa: ARG001
        _print_artifact()
        sys.stdout.flush()
        os._exit(0)

    signal.signal(signal.SIGTERM, _die)
    signal.signal(signal.SIGINT, _die)

    # Stage 1: device step rates (headline + random). One retry — the
    # remote XLA compile service occasionally drops an RPC and the
    # child hangs; compiles finished before the kill persist in the
    # on-disk cache, so the retry resumes from where it died.
    for _ in range(2):
        if RESULT["value"] is not None:
            break
        _run_stage_child("main", min(1500.0, _remaining() - 600))

    # Stage 2: end-to-end FASTQ->SAM (single + paired) — same
    # retry-once policy.
    for _ in range(2):
        if RESULT["e2e_fastq_to_sam_reads_per_sec"] is not None:
            break
        _run_stage_child("e2e", min(1500.0, _remaining() - 30))

    # Headline never landed but the random-genome rate did: report it
    # as the value rather than nothing (flagged via the genome field).
    if RESULT["value"] is None and RESULT[
        "random_genome_step_reads_per_sec"
    ] is not None:
        RESULT["value"] = RESULT["random_genome_step_reads_per_sec"]
        RESULT["genome"] = "1Mbp uniform random (headline stage failed)"

    _print_artifact()


# ---------------------------------------------------------------- stages


def _emit(key: str, value: float) -> None:
    print(json.dumps({"key": key, "value": value}), flush=True)


def _stage_main() -> None:
    """Device step rates: headline (25%-repeat genome) then the
    uniform-random secondary. Emits each as soon as it is measured."""
    import snap_tpu  # noqa: F401
    from snap_tpu import errors as _errors

    _errors.configure(quiet=True)
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
    batch = 16384

    # SNAP's single-end defaults: -n 25 seeds (AlignerOptions.cpp:115)
    # with the seed-loop early stop (BaseAligner.cpp:1028) — replayed
    # here as the adaptive two-phase wavefront
    def make_inputs(codes):
        bases = np.full(glen + 2000, PAD, dtype=np.uint8)
        bases[1000 : 1000 + glen] = codes
        genome = Genome(
            bases=bases,
            contigs=[Contig(name="chr1", start=1000, length=glen)],
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
        reads = np.where(
            mut, rng.integers(0, 4, reads.shape), reads
        ).astype(np.uint8)
        quals = np.full((batch, read_len), ord("I"), dtype=np.uint8)
        lens = np.full(batch, read_len, dtype=np.int32)
        fas = jnp.int64(bases.shape[0])
        return (
            didx, jnp.asarray(reads), jnp.asarray(quals),
            jnp.asarray(lens), fas, params,
        )

    # Timing materializes the winners on the host every iteration
    # (device_get): the axon plugin's block_until_ready can return
    # before execution completes, so dispatch-only loops would look
    # absurdly fast. Pipelined like the production align_file loop:
    # batch i+1 is dispatched before batch i's winners transfer.
    def timed_step(didx, b, q, l, fas, params, n_iters=8):
        win, _ = align_winners_device(
            didx, b, q, l, fas, params, adaptive=True
        )
        jax.device_get(win)  # compile + settle
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
        return batch * n_iters / (time.perf_counter() - t0)

    # Link-bandwidth probe: device_get of a 2MB buffer, best of 3.
    # The headline transfers 24 B/read of packed winners per batch, so
    # a degraded tunnel caps the step at ~link/24 reads/s; publishing
    # the measured link makes a link-bound artifact self-explaining.
    probe = jnp.asarray(
        np.random.default_rng(7).integers(0, 255, 2 << 20, dtype=np.uint8)
    )
    jax.device_get(probe)  # settle the tunnel + any first-use stalls
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        jax.device_get(probe)
        best = min(best, time.perf_counter() - t0)
    _emit("link", probe.size / best / 1e6)

    codes = _gen_repeat_genome(rng, glen, repeat_frac=0.25)
    _emit("headline", timed_step(*make_inputs(codes)))

    rcodes = rng.integers(0, 4, size=glen).astype(np.uint8)
    _emit("random", timed_step(*make_inputs(rcodes)))


def _stage_e2e() -> None:
    """End-to-end FASTQ -> SAM bytes (the whole production driver:
    native FASTQ parse, device align, batched native SAM emission),
    single then paired; each emitted as soon as it is measured."""
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
    _bench_end_to_end(genome, codes, glen, read_len, batch)


def _bench_end_to_end(genome, codes, glen, read_len, batch):
    """Full FASTQ->SAM wall-clock throughput, single and paired.

    Measures what `snap-tpu single/paired` deliver end to end (the
    reference reports reads/s the same way, AlignerContext.cpp:533-573):
    file parse, device wavefront, host finalization, record emission,
    output write. First pass warms the jit caches; the timed pass runs
    the same files again.
    """
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
    # Same params as the main stage's headline step: the compiled
    # graphs are keyed on (params, batch, read_len), so matching them
    # lets this stage reuse the main stage's XLA-cache entries instead
    # of paying a second cold-compile set (which is what timed out the
    # first e2e child on a degraded-tunnel session).
    params = AlignParams(
        seed_len=24, max_probe=index.max_probe, num_seeds=25,
        hit_cap=8, max_cand=16,
    )

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
        _emit("e2e", n_single / (_time.perf_counter() - t0))

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
        _emit("paired", 2 * n_pairs / (_time.perf_counter() - t0))


if __name__ == "__main__":
    if "--stage" in sys.argv:
        stage = sys.argv[sys.argv.index("--stage") + 1]
        if stage == "main":
            _stage_main()
        elif stage == "e2e":
            _stage_e2e()
        else:
            raise SystemExit(f"unknown stage {stage}")
    else:
        main()
