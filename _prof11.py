import time
import numpy as np
import snap_tpu
import jax, jax.numpy as jnp

hits = jnp.asarray(np.random.randint(0, 1<<30, size=1_000_000, dtype=np.uint32))
N = 16384 * 14
rows_np = np.random.randint(0, 999_000, size=N)

def t(name, f, *a):
    r = f(*a); jax.device_get(r)
    t0 = time.perf_counter()
    outs = [f(*a) for _ in range(5)]
    jax.device_get(outs[-1])
    print(f"{name}: {(time.perf_counter()-t0)/5*1e3:.1f} ms")

r64 = jnp.asarray(rows_np.astype(np.int64))
r32 = jnp.asarray(rows_np.astype(np.int32))

@jax.jit
def g64(r):
    rows = r[:, None] + jnp.arange(8, dtype=jnp.int64)[None, :]
    return hits[rows]
@jax.jit
def g32(r):
    rows = r[:, None] + jnp.arange(8, dtype=jnp.int32)[None, :]
    return hits[rows]
@jax.jit
def g32_take(r):
    rows = r[:, None] + jnp.arange(8, dtype=jnp.int32)[None, :]
    return jnp.take(hits, rows, axis=0)
@jax.jit
def g32_flat1(r):  # gather single elements [N*8]
    rows = (r[:, None] + jnp.arange(8, dtype=jnp.int32)[None, :]).reshape(-1)
    return hits[rows]
@jax.jit
def g32_dsl(r):  # 8 separate element-gathers then stack (vectorized offsets)
    return jnp.stack([hits[r + i] for i in range(8)], axis=1)

t("row gather int64 idx", g64, r64)
t("row gather int32 idx", g32, r32)
t("take int32", g32_take, r32)
t("flat element gather", g32_flat1, r32)
t("8x shifted element gathers", g32_dsl, r32)
