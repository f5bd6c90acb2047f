"""Multi-chip execution: data-parallel reads x sharded index.

Behavioral reference: the reference is single-node multithreaded
(ParallelTask.h:43, RangeSplitter.h:38); this module is its scale-out
replacement per SURVEY.md section 2.6: reads are data-parallel across
the 'data' mesh axis, and the genome index (hash tables + hit lists,
the ~30GB object for hg38) is sharded across the 'index' axis. Each
device probes its local index shard for all reads in its data column —
a non-owning shard cleanly misses, so no query routing is needed — and
scores its own candidates locally against the (replicated) genome.
Per-shard top-K candidate lists concatenate across the index axis via
the shard_map output spec (an all-gather over ICI), and the existing
merge/selection consumes the union.

Launch across hosts with jax.distributed.initialize(); the mesh spans
all global devices.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..align.pipeline import AlignParams, SingleAlignOut, align_single_device
from ..index.index import DeviceIndex


def make_mesh(n_data: int, n_index: int, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    devs = np.array(devices[: n_data * n_index]).reshape(n_data, n_index)
    return Mesh(devs, axis_names=("data", "index"))


def sharded_device_index(arrays: dict, genome_bases: np.ndarray, mesh: Mesh):
    """Place a stacked [n_shards, ...] index on the mesh: tables/hits
    sharded over 'index', genome replicated."""
    idx_spec = NamedSharding(mesh, P("index"))
    repl = NamedSharding(mesh, P())
    from ..index.index import pack_bad16, pack_genome_words

    packed, bad = pack_genome_words(genome_bases)
    return DeviceIndex(
        table=jax.device_put(jnp.asarray(arrays["table"]), idx_spec),
        hits=jax.device_put(jnp.asarray(arrays["hits"]), idx_spec),
        genome=jax.device_put(jnp.asarray(genome_bases), repl),
        genome_packed=jax.device_put(jnp.asarray(packed), repl),
        genome_bad=jax.device_put(jnp.asarray(bad), repl),
        genome_bad16=jax.device_put(
            jnp.asarray(pack_bad16(genome_bases, packed.shape[0])), repl
        ),
    )


@functools.partial(jax.jit, static_argnames=("params", "mesh"))
def align_single_sharded(
    didx: DeviceIndex,   # stacked [n_shards, ...] tables, genome replicated
    bases: jax.Array,    # [B, L] sharded over 'data'
    quals: jax.Array,
    lens: jax.Array,
    params: AlignParams,
    mesh: Mesh,
) -> SingleAlignOut:
    """Run the align wavefront on every (data, index) device; concat the
    per-shard candidate lists along K."""

    def local(didx_local, b, q, l):
        local_idx = DeviceIndex(
            table=didx_local.table[0],
            hits=didx_local.hits[0],
            genome=didx_local.genome,
            genome_packed=didx_local.genome_packed,
            genome_bad=didx_local.genome_bad,
            genome_bad16=didx_local.genome_bad16,
        )
        out = align_single_device(local_idx, b, q, l, params)
        # a seed's hits live wholly in one shard, so popular-seed skips
        # sum across shards; n_lookups/len_eff are shard-independent
        popular = jax.lax.psum(out.popular, "index")
        truncated = (
            jax.lax.psum(out.truncated.astype(jnp.int32), "index") > 0
        )
        return out._replace(popular=popular, truncated=truncated)

    idx_specs = DeviceIndex(
        table=P("index"),
        hits=P("index"),
        genome=P(),
        genome_packed=P(),
        genome_bad=P(),
        genome_bad16=P(),
    )
    cand2d = P("data", "index")  # [B, K*n_shards] concat across shards
    out_specs = SingleAlignOut(
        dist=cand2d, indels=cand2d, log_prob=cand2d, ag_score=cand2d,
        end_loc=cand2d,
        body_loc=cand2d, cand_loc=cand2d, escalated=cand2d,
        clip_before=cand2d, clip_after=cand2d, seed_off=cand2d,
        direction=cand2d, valid=cand2d,
        len_eff=P("data"), popular=P("data"), n_lookups=P("data"),
        truncated=P("data"),
    )
    f = shard_map(
        local,
        mesh=mesh,
        in_specs=(idx_specs, P("data"), P("data"), P("data")),
        out_specs=out_specs,
        check_vma=False,
    )
    return f(didx, bases, quals, lens)
