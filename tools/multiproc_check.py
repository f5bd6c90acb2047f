"""Multi-process (multi-host simulation) proof for the sharded align path.

Launches 2 OS processes x 4 virtual CPU devices each, initializes
jax.distributed (the same cli._maybe_mesh code path a real multi-host
run takes), builds a global (data=8, index=1) mesh spanning both
processes, assembles the read batch with
jax.make_array_from_process_local_data (each process contributes its
data-axis half), runs the production align_winners_sharded step, and
checks:

  1. every process's addressable winner rows equal the single-process
     (8 devices, 1 process) run's rows — output equality;
  2. AlignerStats reduce across processes via
     stats.reduce_across_hosts (the stats.py process_count()>1 psum
     path that no test had ever executed).

Run:  python tools/multiproc_check.py            (parent: spawns all)
Exit 0 and a final "MULTIPROC OK" line on success. Writes
MULTIPROC_CHECK.json next to the repo root when invoked with --json.

Reference analogue: SNAP is single-process (ParallelTask.h:43); this
exercises the TPU-native replacement (SURVEY section 2.6: jax.distributed
runtime, data-parallel FASTQ batches, psum stats reduction).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

PORT = 43217
N_PROC = 2
DEV_PER_PROC = 4
B = 512  # global batch
L = 100
GLEN = 200_000
SEED_LEN = 20


def build_world():
    """Deterministic genome/index/reads, identical in every process."""
    from snap_tpu.constants import PAD
    from snap_tpu.genome import Contig, Genome
    from snap_tpu.index.index import GenomeIndex

    rng = np.random.default_rng(5)
    codes = rng.integers(0, 4, size=GLEN).astype(np.uint8)
    gb = np.full(GLEN + 2000, PAD, dtype=np.uint8)
    gb[1000 : 1000 + GLEN] = codes
    genome = Genome(
        bases=gb, contigs=[Contig(name="chr1", start=1000, length=GLEN)]
    )
    index = GenomeIndex.build(genome, seed_len=SEED_LEN)
    starts = rng.integers(0, GLEN - L - 1, size=B)
    reads = codes[starts[:, None] + np.arange(L)[None, :]]
    mut = rng.random(reads.shape) < 0.01
    reads = np.where(mut, rng.integers(0, 4, reads.shape), reads).astype(
        np.uint8
    )
    quals = np.full((B, L), ord("I"), dtype=np.uint8)
    lens = np.full(B, L, dtype=np.int32)
    return genome, index, reads, quals, lens


def run_step(mesh, index, genome, reads, quals, lens, local_rows):
    """Dispatch the sharded step; inputs assembled from process-local
    rows so the path works identically with 1 or N processes."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from snap_tpu.parallel.mesh import align_winners_sharded
    from snap_tpu.align.pipeline import AlignParams

    index.to_mesh(mesh, n_index=1)
    didx = index.device_sharded

    ds = NamedSharding(mesh, P("data"))

    def put(arr):
        return jax.make_array_from_process_local_data(
            ds, np.ascontiguousarray(arr[local_rows])
        )

    params = AlignParams(
        seed_len=SEED_LEN, max_probe=index.max_probe, num_seeds=25,
        hit_cap=8, max_cand=16,
    )
    fas = jnp.int64(np.asarray(genome.bases).shape[0])
    win, _ = align_winners_sharded(
        didx, put(reads), put(quals), put(lens), fas, params, mesh
    )
    return win


def child_main(pid: int):
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{PORT}",
        num_processes=N_PROC,
        process_id=pid,
    )
    assert jax.process_count() == N_PROC, jax.process_count()
    assert len(jax.devices()) == N_PROC * DEV_PER_PROC
    from snap_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(N_PROC * DEV_PER_PROC, 1)
    genome, index, reads, quals, lens = build_world()
    per = B // N_PROC
    local_rows = np.arange(pid * per, (pid + 1) * per)
    win = run_step(mesh, index, genome, reads, quals, lens, local_rows)

    # collect this process's addressable winner rows (its data shards)
    rows = {}
    for shard in win.addressable_shards:
        r0 = shard.index[0].start or 0
        data = np.asarray(shard.data)
        for i in range(data.shape[0]):
            if r0 + i < B:  # drop the dp_overflow tail row
                rows[r0 + i] = data[i]
    out = os.path.join(
        os.environ["MPC_TMP"], f"part{pid}.npz"
    )
    np.savez(
        out,
        idx=np.array(sorted(rows)),
        rows=np.stack([rows[i] for i in sorted(rows)]),
    )

    # stats psum path (stats.py reduce_across_hosts)
    from snap_tpu.stats import AlignerStats, reduce_across_hosts

    st = AlignerStats()
    st.total = len(local_rows)
    st.single = int(pid) + 1  # distinct per process: sum must be 3
    st = reduce_across_hosts(st)
    assert st.total == B, st.total
    assert st.single == sum(range(1, N_PROC + 1)), st.single
    print(f"[proc {pid}] rows={len(rows)} stats_total={st.total} OK",
          flush=True)
    jax.distributed.shutdown()


def parent_main(emit_json: bool):
    import tempfile

    tmp = tempfile.mkdtemp(prefix="mpc_")
    env_base = dict(
        os.environ,
        JAX_PLATFORMS="cpu",
        XLA_FLAGS=(
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={DEV_PER_PROC}"
        ).strip(),
        MPC_TMP=tmp,
        PYTHONPATH=REPO,
    )
    procs = []
    for pid in range(N_PROC):
        procs.append(
            subprocess.Popen(
                [sys.executable, os.path.abspath(__file__), "--child",
                 str(pid)],
                env=env_base,
            )
        )
    rcs = [p.wait(timeout=1200) for p in procs]
    assert all(rc == 0 for rc in rcs), f"child exit codes {rcs}"

    # single-process reference: same global shapes on 8 local devices
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={N_PROC * DEV_PER_PROC}"
    ).strip()
    import jax  # noqa: F401

    from snap_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(N_PROC * DEV_PER_PROC, 1)
    genome, index, reads, quals, lens = build_world()
    win = run_step(
        mesh, index, genome, reads, quals, lens, np.arange(B)
    )
    ref = np.asarray(win)[:B]

    got = {}
    for pid in range(N_PROC):
        z = np.load(os.path.join(tmp, f"part{pid}.npz"))
        for i, row in zip(z["idx"], z["rows"]):
            got[int(i)] = row
    assert len(got) == B, f"covered {len(got)}/{B} reads"
    mism = [i for i in range(B) if not np.array_equal(got[i], ref[i])]
    assert not mism, f"{len(mism)} winner rows differ, first {mism[:5]}"
    print(f"MULTIPROC OK: {B} reads, {N_PROC} processes x "
          f"{DEV_PER_PROC} devices, winners identical to single-process")
    if emit_json:
        with open(os.path.join(REPO, "MULTIPROC_CHECK.json"), "w") as f:
            json.dump(
                {
                    "ok": True,
                    "n_processes": N_PROC,
                    "devices_per_process": DEV_PER_PROC,
                    "reads": B,
                    "winners_identical": True,
                    "stats_psum_path": "exercised",
                },
                f,
            )


if __name__ == "__main__":
    if "--child" in sys.argv:
        child_main(int(sys.argv[sys.argv.index("--child") + 1]))
    else:
        parent_main("--json" in sys.argv)
