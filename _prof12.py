import time
import numpy as np
import snap_tpu
import jax, jax.numpy as jnp
from jax import lax

hits = jnp.asarray(np.random.randint(0, 1<<30, size=1_000_000, dtype=np.uint32))
N = 16384 * 14
starts_np = np.random.randint(0, 999_000, size=N)

def t(name, f, *a):
    r = f(*a); jax.device_get(r)
    t0 = time.perf_counter()
    outs = [f(*a) for _ in range(5)]
    jax.device_get(outs[-1])
    print(f"{name}: {(time.perf_counter()-t0)/5*1e3:.1f} ms")

s32 = jnp.asarray(starts_np.astype(np.int32))

@jax.jit
def slice_gather(s):
    dn = lax.GatherDimensionNumbers(
        offset_dims=(1,), collapsed_slice_dims=(), start_index_map=(0,),
    )
    return lax.gather(hits, s[:, None], dn, slice_sizes=(8,),
                      mode=lax.GatherScatterMode.CLIP)
t("lax slice-gather [N](8,)", slice_gather, s32)

@jax.jit
def dyn_slice_vmap(s):
    f = jax.vmap(lambda st: lax.dynamic_slice(hits, (st,), (8,)))
    return f(s)
t("vmapped dynamic_slice", dyn_slice_vmap, s32)
