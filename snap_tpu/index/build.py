"""Genome index builder: canonical-seed hash table + CSR hit lists.

Behavioral reference: SNAP's GenomeIndex.cpp (BuildIndexToDirectory,
GenomeIndex.cpp:527-1010) and HashTable.h. Semantics preserved:

- every non-N seed position contributes its canonical seed
  min(seed, reverse_complement(seed)) (ref: Seed.h:99
  isBiggerThanItsReverseComplement);
- per-seed hit lists are sorted in DESCENDING genome order — the paired
  intersection walk depends on this (ref: GenomeIndex.cpp:878-884);
- lookups return forward hits and RC hits separately.

The layout is redesigned for TPU gathers instead of SNAP's multi-table
packed-byte format: one open-addressed power-of-two hash table whose
slots carry (key, hits_start, n_fwd, n_rc) as parallel flat arrays, plus
one flat uint32 `hits` array holding, per key, the orientation-0 list
followed by the orientation-1 list. Lookup is a bounded linear-probe
loop of gathers — ideal for a batched [reads x seeds] probe wavefront.

Orientation convention: orientation 0 = genome seed equals the canonical
seed; orientation 1 = genome seed is the reverse complement of the
canonical seed. At lookup, a read seed equal to its canonical gets
fwd=list0 / rc=list1, else swapped.
"""

from __future__ import annotations

import json
import os

import numpy as np

from ..constants import DEFAULT_SEED_LEN
from ..genome import Genome

EMPTY_KEY = np.uint64(0xFFFFFFFFFFFFFFFF)
# Safe sentinel: a canonical seed is min(s, rc(s)), and rc(all-ones) = 0,
# so the all-ones pattern can never be canonical.


def murmur_finalize64(keys: np.ndarray) -> np.ndarray:
    """MurmurHash3 64-bit finalizer (public domain; ref: HashTable.h:72-85)."""
    k = keys.astype(np.uint64, copy=True)
    with np.errstate(over="ignore"):
        k ^= k >> np.uint64(33)
        k *= np.uint64(0xFF51AFD7ED558CCD)
        k ^= k >> np.uint64(33)
        k *= np.uint64(0xC4CEB9FE1A85EC53)
        k ^= k >> np.uint64(33)
    return k


def pack_seeds(bases: np.ndarray, positions: np.ndarray, seed_len: int):
    """Pack 2-bit seeds at `positions`. Returns (fwd, rc, valid).

    fwd[p] has the base at p in the high bits (string order).
    rc is the packed reverse complement. valid = window has only ACGT.
    """
    fwd = np.zeros(len(positions), dtype=np.uint64)
    rc = np.zeros(len(positions), dtype=np.uint64)
    valid = np.ones(len(positions), dtype=bool)
    for i in range(seed_len):
        b = bases[positions + i].astype(np.uint64)
        valid &= b < 4
        bs = np.where(b < 4, b, 0).astype(np.uint64)
        fwd = (fwd << np.uint64(2)) | bs
        # complement of base at p+i goes to rc bit position i (from low end)
        rc |= (np.uint64(3) - bs) << np.uint64(2 * i)
    return fwd, rc, valid


def extract_canonical_seeds(
    genome: Genome, seed_len: int, chunk: int = 1 << 24
):
    """All (canonical_key, orientation, location) triples over the genome."""
    bases = np.asarray(genome.bases)
    n = genome.num_bases - seed_len + 1
    keys_l, orient_l, loc_l = [], [], []
    for lo in range(0, n, chunk):
        hi = min(lo + chunk, n)
        pos = np.arange(lo, hi, dtype=np.int64)
        fwd, rc, valid = pack_seeds(bases, pos, seed_len)
        canonical = np.minimum(fwd, rc)
        orient = (rc < fwd)  # genome seed is the RC of the canonical
        keys_l.append(canonical[valid])
        orient_l.append(orient[valid])
        loc_l.append(pos[valid].astype(np.uint32))
    return (
        np.concatenate(keys_l),
        np.concatenate(orient_l),
        np.concatenate(loc_l),
    )


BUCKET_SLOTS = 8  # slots per hash bucket; a probe gathers whole buckets


def _build_hash_table(unique_keys: np.ndarray, load_factor: float = 0.5):
    """Bucketed placement: each key's home bucket is hash & mask; keys
    overflow into following buckets (greedy fill). The lookup gathers
    `max_probe` CONSECUTIVE buckets in one contiguous [N, span*8] gather
    instead of a sequential probe loop — the TPU-friendly layout.

    Returns (table_key_idx [capacity], capacity, span). capacity
    includes span trailing spill buckets so slots never wrap.

    The greedy fill is fully vectorized: with keys sorted by home
    bucket, slot_k = max(slot_{k-1}+1, home_k*8) unrolls to
    k + running_max(home_k*8 - k).
    """
    u = len(unique_keys)
    n_buckets = 1
    while n_buckets * BUCKET_SLOTS < max(16, int(u / load_factor)):
        n_buckets <<= 1
    mask = np.uint64(n_buckets - 1)

    home = (murmur_finalize64(unique_keys) & mask).astype(np.int64)
    order = np.argsort(home, kind="stable")
    home_sorted = home[order]
    k = np.arange(u, dtype=np.int64)
    slots = k + np.maximum.accumulate(home_sorted * BUCKET_SLOTS - k)
    span = (
        int(np.max(slots // BUCKET_SLOTS - home_sorted)) + 1 if u else 1
    )
    capacity = (n_buckets + span) * BUCKET_SLOTS
    table_key_idx = np.full(capacity, -1, dtype=np.int64)
    table_key_idx[slots] = order
    return table_key_idx, capacity, span


def build_index(
    genome: Genome,
    seed_len: int = DEFAULT_SEED_LEN,
    load_factor: float = 0.5,
) -> dict:
    """Build the full index as a dict of numpy arrays (host format)."""
    keys, orient, locs = extract_canonical_seeds(genome, seed_len)

    # Sort by (key asc, orient asc, location DESC).
    loc_desc = np.uint32(0xFFFFFFFF) - locs
    order = np.lexsort((loc_desc, orient, keys))
    keys, orient, locs = keys[order], orient[order], locs[order]

    unique_keys, start, counts = np.unique(
        keys, return_index=True, return_counts=True
    )
    # per-key orientation split: count of orient==1 in each group
    orient_cum = np.concatenate(([0], np.cumsum(orient.astype(np.int64))))
    n1 = (orient_cum[start + counts] - orient_cum[start]).astype(np.int32)
    n0 = (counts - n1).astype(np.int32)

    table_key_idx, capacity, max_probe = _build_hash_table(
        unique_keys, load_factor
    )

    # Scatter payload into table order (empty slots get EMPTY_KEY / zeros).
    t_keys = np.full(capacity, EMPTY_KEY, dtype=np.uint64)
    t_start = np.zeros(capacity, dtype=np.int64)
    t_n0 = np.zeros(capacity, dtype=np.int32)
    t_n1 = np.zeros(capacity, dtype=np.int32)
    occ = table_key_idx >= 0
    ki = table_key_idx[occ]
    t_keys[occ] = unique_keys[ki]
    t_start[occ] = start[ki]
    t_n0[occ] = n0[ki]
    t_n1[occ] = n1[ki]

    return {
        "seed_len": seed_len,
        "max_probe": max_probe,
        "hits": locs,          # uint32, per key: orient0 desc, then orient1 desc
        "table_keys": t_keys,
        "table_start": t_start,
        "table_n0": t_n0,
        "table_n1": t_n1,
    }


def shard_index(
    genome: Genome, seed_len: int, n_shards: int, load_factor: float = 0.5
) -> dict:
    """Build a seed-sharded index: n_shards independent hash tables.

    Shard ownership = top bits of the Murmur-finalized canonical key, so
    shards are balanced regardless of genome composition (SNAP shards by
    seed prefix into per-prefix tables, GenomeIndex.cpp:1026-1110; the
    hash-based split plays the same role but is uniform by construction).
    Every shard is a complete, self-contained index over its key subset:
    a lookup probed against a non-owning shard cleanly misses. Arrays are
    padded to the max shard size and stacked on a leading axis for
    jax.sharding over the 'index' mesh axis.
    """
    assert n_shards >= 1 and (n_shards & (n_shards - 1)) == 0
    keys, orient, locs = extract_canonical_seeds(genome, seed_len)
    shift = np.uint64(64 - int(np.log2(n_shards))) if n_shards > 1 else None
    if n_shards > 1:
        shard_of = (murmur_finalize64(keys) >> shift).astype(np.int64)
    else:
        shard_of = np.zeros(len(keys), dtype=np.int64)

    shards = []
    for s in range(n_shards):
        m = shard_of == s
        sk, so, sl = keys[m], orient[m], locs[m]
        loc_desc = np.uint32(0xFFFFFFFF) - sl
        order = np.lexsort((loc_desc, so, sk))
        sk, so, sl = sk[order], so[order], sl[order]
        unique_keys, start, counts = np.unique(
            sk, return_index=True, return_counts=True
        )
        orient_cum = np.concatenate(([0], np.cumsum(so.astype(np.int64))))
        n1 = (orient_cum[start + counts] - orient_cum[start]).astype(np.int32)
        n0 = (counts - n1).astype(np.int32)
        table_key_idx, capacity, max_probe = _build_hash_table(
            unique_keys, load_factor
        )
        t_keys = np.full(capacity, EMPTY_KEY, dtype=np.uint64)
        t_start = np.zeros(capacity, dtype=np.int64)
        t_n0 = np.zeros(capacity, dtype=np.int32)
        t_n1 = np.zeros(capacity, dtype=np.int32)
        occ = table_key_idx >= 0
        ki = table_key_idx[occ]
        t_keys[occ] = unique_keys[ki]
        t_start[occ] = start[ki]
        t_n0[occ] = n0[ki]
        t_n1[occ] = n1[ki]
        shards.append(
            {"hits": sl, "table_keys": t_keys, "table_start": t_start,
             "table_n0": t_n0, "table_n1": t_n1, "max_probe": max_probe}
        )

    cap = max(s["table_keys"].shape[0] for s in shards)
    hmax = max(max(s["hits"].shape[0], 1) for s in shards)

    def pad_to(a, n, fill):
        out = np.full((n,), fill, dtype=a.dtype)
        out[: len(a)] = a
        return out

    return {
        "seed_len": seed_len,
        "n_shards": n_shards,
        "max_probe": max(s["max_probe"] for s in shards),
        "hits": np.stack([pad_to(s["hits"], hmax, 0) for s in shards]),
        "table_keys": np.stack(
            [pad_to(s["table_keys"], cap, EMPTY_KEY) for s in shards]
        ),
        "table_start": np.stack(
            [pad_to(s["table_start"], cap, 0) for s in shards]
        ),
        "table_n0": np.stack([pad_to(s["table_n0"], cap, 0) for s in shards]),
        "table_n1": np.stack([pad_to(s["table_n1"], cap, 0) for s in shards]),
    }


def save_index(index: dict, genome: Genome, directory: str) -> None:
    os.makedirs(directory, exist_ok=True)
    genome.save(directory)
    np.savez(
        os.path.join(directory, "index_arrays.npz"),
        hits=index["hits"],
        table_keys=index["table_keys"],
        table_start=index["table_start"],
        table_n0=index["table_n0"],
        table_n1=index["table_n1"],
    )
    with open(os.path.join(directory, "index_meta.json"), "w") as f:
        json.dump(
            {
                "format_version": 2,  # bucketed hash layout (BUCKET_SLOTS)
                "seed_len": index["seed_len"],
                "max_probe": index["max_probe"],
            },
            f,
        )


def load_index_arrays(directory: str) -> dict:
    with open(os.path.join(directory, "index_meta.json")) as f:
        meta = json.load(f)
    if meta.get("format_version", 1) != 2:
        raise ValueError(
            f"index at {directory} uses format version "
            f"{meta.get('format_version', 1)}; this build reads version 2 "
            "(bucketed hash layout) — please rebuild the index"
        )
    arrs = np.load(os.path.join(directory, "index_arrays.npz"))
    return {
        "seed_len": meta["seed_len"],
        "max_probe": meta["max_probe"],
        "hits": arrs["hits"],
        "table_keys": arrs["table_keys"],
        "table_start": arrs["table_start"],
        "table_n0": arrs["table_n0"],
        "table_n1": arrs["table_n1"],
    }
