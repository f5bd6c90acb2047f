import time, sys
import numpy as np
import snap_tpu
import jax, jax.numpy as jnp
from snap_tpu.genome import Genome, Contig
from snap_tpu.constants import PAD
from snap_tpu.index.build import build_index
from snap_tpu.index.index import DeviceIndex, pack_genome_words
from snap_tpu.align.pipeline import AlignParams, align_winners_device

def log(*a):
    print(*a, flush=True)

rng = np.random.default_rng(0)
glen = 1_000_000; read_len = 100; batch = 16384
codes = rng.integers(0, 4, size=glen).astype(np.uint8)
bases_g = np.full(glen + 2000, PAD, dtype=np.uint8)
bases_g[1000:1000+glen] = codes
genome = Genome(bases=bases_g, contigs=[Contig(name="chr1", start=1000, length=glen)])
log("building index...")
idx = build_index(genome, seed_len=24)
_packed, _bad = pack_genome_words(bases_g)
didx = DeviceIndex(
    table_keys=jnp.asarray(idx["table_keys"]), table_start=jnp.asarray(idx["table_start"]),
    table_n0=jnp.asarray(idx["table_n0"]), table_n1=jnp.asarray(idx["table_n1"]),
    hits=jnp.asarray(idx["hits"]), genome=jnp.asarray(bases_g),
    genome_packed=jnp.asarray(_packed), genome_bad=jnp.asarray(_bad))
params = AlignParams(seed_len=24, max_probe=idx["max_probe"], num_seeds=14, hit_cap=8, max_cand=16)
starts = rng.integers(0, glen - read_len - 1, size=batch)
reads = codes[starts[:, None] + np.arange(read_len)[None, :]]
mut = rng.random(reads.shape) < 0.01
reads = np.where(mut, rng.integers(0, 4, reads.shape), reads).astype(np.uint8)
quals = np.full((batch, read_len), ord("I"), dtype=np.uint8)
lens = np.full(batch, read_len, dtype=np.int32)
b = jnp.asarray(reads); q = jnp.asarray(quals); l = jnp.asarray(lens)
fas = jnp.int64(bases_g.shape[0])
log("compiling winners dp_rows=2048...")
t0 = time.perf_counter()
win, out = align_winners_device(didx, b, q, l, fas, params, dp_rows=2048)
jax.device_get(win.mapq)
log(f"compile+run: {time.perf_counter()-t0:.1f} s")
t0 = time.perf_counter()
outs = [align_winners_device(didx, b, q, l, fas, params, dp_rows=2048)[0] for _ in range(5)]
jax.device_get(outs[-1].mapq)
log(f"winners pipelined: {(time.perf_counter()-t0)/5*1e3:.1f} ms")
t0 = time.perf_counter()
for _ in range(5):
    win, _ = align_winners_device(didx, b, q, l, fas, params, dp_rows=2048)
    jax.device_get(win)
log(f"winners serialized full get: {(time.perf_counter()-t0)/5*1e3:.1f} ms")
import jax.tree_util as jtu
nb = sum(np.asarray(x).nbytes for x in jax.device_get(jtu.tree_leaves(win)))
log(f"winners bytes: {nb/1e3:.0f} KB")
