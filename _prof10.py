import time
import numpy as np
import snap_tpu
import jax, jax.numpy as jnp
from snap_tpu.genome import Genome, Contig
from snap_tpu.constants import PAD
from snap_tpu.index.build import build_index, BUCKET_SLOTS
from snap_tpu.index.index import DeviceIndex, murmur_finalize64

rng = np.random.default_rng(0)
glen = 1_000_000
codes = rng.integers(0, 4, size=glen).astype(np.uint8)
bases = np.full(glen + 2000, PAD, dtype=np.uint8)
bases[1000:1000+glen] = codes
genome = Genome(bases=bases, contigs=[Contig(name='chr1', start=1000, length=glen)])
idx = build_index(genome, seed_len=24)
tk = jnp.asarray(idx["table_keys"]); ts = jnp.asarray(idx["table_start"])
t0a = jnp.asarray(idx["table_n0"]); t1a = jnp.asarray(idx["table_n1"])
hits = jnp.asarray(idx["hits"])
N = 16384 * 14
q = jnp.asarray(rng.integers(0, 1 << 48, size=N, dtype=np.uint64))
span = idx["max_probe"]; width = span * BUCKET_SLOTS
capacity = tk.shape[0]
n_buckets = capacity // BUCKET_SLOTS - span

def t(name, f, *a):
    r = f(*a); jax.device_get(jax.tree_util.tree_leaves(r)[0])
    t0 = time.perf_counter()
    outs = [f(*a) for _ in range(5)]
    jax.device_get(jax.tree_util.tree_leaves(outs[-1])[0])
    print(f"{name}: {(time.perf_counter()-t0)/5*1e3:.1f} ms")

@jax.jit
def keys_gather(q):
    mask = jnp.uint64(n_buckets - 1)
    home = (murmur_finalize64(q) & mask).astype(jnp.int64)
    slots = home[:, None] * BUCKET_SLOTS + jnp.arange(width, dtype=jnp.int64)[None, :]
    keys = tk[slots]
    hit = keys == q[:, None]
    return hit.any(axis=1), jnp.argmax(hit, axis=1), home
t("keys gather+cmp", keys_gather, q)

@jax.jit
def payload_gather(q):
    mask = jnp.uint64(n_buckets - 1)
    home = (murmur_finalize64(q) & mask).astype(jnp.int64)
    slot = home * BUCKET_SLOTS  # fake found slot
    return ts[slot], t0a[slot], t1a[slot]
t("3x element gathers", payload_gather, q)

@jax.jit
def hits_gather(q):
    mask = jnp.uint64(n_buckets - 1)
    home = (murmur_finalize64(q) & mask).astype(jnp.int64)
    start = jnp.clip(home, 0, hits.shape[0] - 9)
    offs = jnp.arange(8, dtype=jnp.int64)
    rows = start[:, None] + offs[None, :]
    return hits[rows]
t("hits [N,8] gather", hits_gather, q)
t("hits x2", lambda q: (hits_gather(q), hits_gather(q * 3)), q)

@jax.jit
def murmur_only(q):
    mask = jnp.uint64(n_buckets - 1)
    return (murmur_finalize64(q) & mask).astype(jnp.int64)
t("murmur only", murmur_only, q)

@jax.jit
def noop(q):
    return q + jnp.uint64(1)
t("noop elementwise", noop, q)

@jax.jit
def hits_gather_i32(q):
    home = (q % jnp.uint64(900000)).astype(jnp.int64)
    offs = jnp.arange(8, dtype=jnp.int64)
    rows = home[:, None] + offs[None, :]
    return hits[rows]
t("hits gather no-murmur", hits_gather_i32, q)
