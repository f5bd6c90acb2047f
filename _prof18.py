import time
import numpy as np
import snap_tpu
import jax, jax.numpy as jnp
from snap_tpu.genome import Genome, Contig
from snap_tpu.constants import PAD
from snap_tpu.index.build import build_index
from snap_tpu.index.index import make_device_index
from snap_tpu.align.pipeline import AlignParams, align_winners_device, align_tier1, _align_impl
import functools

rng = np.random.default_rng(0)
glen = 1_000_000; read_len = 100; batch = 16384
codes = rng.integers(0, 4, size=glen).astype(np.uint8)
bases_g = np.full(glen + 2000, PAD, dtype=np.uint8)
bases_g[1000:1000+glen] = codes
genome = Genome(bases=bases_g, contigs=[Contig(name="chr1", start=1000, length=glen)])
idx = build_index(genome, seed_len=24)
didx = make_device_index(idx, bases_g)
params = AlignParams(seed_len=24, max_probe=idx["max_probe"], num_seeds=14, hit_cap=8, max_cand=16)
starts = rng.integers(0, glen - read_len - 1, size=batch)
reads = codes[starts[:, None] + np.arange(read_len)[None, :]]
mut = rng.random(reads.shape) < 0.01
reads = np.where(mut, rng.integers(0, 4, reads.shape), reads).astype(np.uint8)
quals = np.full((batch, read_len), ord("I"), dtype=np.uint8)
lens = np.full(batch, read_len, dtype=np.int32)
b = jnp.asarray(reads); q = jnp.asarray(quals); l = jnp.asarray(lens)
fas = jnp.int64(bases_g.shape[0])

def t(name, f, out):
    r = f(); jax.device_get(jax.tree_util.tree_leaves(out(r))[0])
    t0 = time.perf_counter()
    outs = [f() for _ in range(5)]
    jax.device_get(jax.tree_util.tree_leaves(out(outs[-1]))[0])
    print(f"{name}: {(time.perf_counter()-t0)/5*1e3:.1f} ms")

t("tier1", lambda: align_tier1(didx, b, q, l, params), lambda r: r.popular)

@jax.jit
def monolithic():
    out, n = _align_impl(didx, b, q, l, params, dp_rows=1024, return_needs=True)
    return out.dist.sum() + n

t("tier1+DPtier", lambda: monolithic(), lambda r: r)
t("winners full", lambda: align_winners_device(didx, b, q, l, fas, params), lambda r: r[0])
