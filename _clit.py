import time
import numpy as np
import snap_tpu
import jax, jax.numpy as jnp
from snap_tpu.index.index import GenomeIndex
from snap_tpu.align.pipeline import AlignParams, align_winners_device

def log(*a):
    print(*a, flush=True)

log("loading index")
idx = GenomeIndex.load('/tmp/idx1m')
params = AlignParams(seed_len=idx.seed_len, max_probe=idx.max_probe)
log("params:", params.num_lookups, "lookups, hit_cap", params.hit_cap,
    "max_cand", params.max_cand)
rng = np.random.default_rng(0)
B, L = 16384, 128
b = jnp.asarray(rng.integers(0,4,(B,L)).astype(np.uint8))
q = jnp.asarray(np.full((B,L), ord('I'), np.uint8))
l = jnp.asarray(np.full(B, 100, np.int32))
fas = jnp.int64(idx.genome_meta.first_alt_start())
t0 = time.perf_counter()
log("dispatching")
win, out = align_winners_device(idx.device, b, q, l, fas, params)
log(f"dispatched at {time.perf_counter()-t0:.1f}s; getting")
jax.device_get(win)
log(f"first done: {time.perf_counter()-t0:.1f}s")
for it in range(3):
    t0 = time.perf_counter()
    w, _ = align_winners_device(idx.device, b, q, l, fas, params)
    jax.device_get(w)
    log(f"iter{it}: {time.perf_counter()-t0:.2f}s")
