"""Device-side genome index: hash-probe lookup as a batched gather wavefront.

Behavioral reference: SNAP's GenomeIndex::lookupSeed (GenomeIndex.cpp:
2095-2328) — returns (nHits, hits, nRCHits, rcHits) with hit lists in
descending genome order. Here the lookup is a fixed-bound linear-probe
loop of vectorized gathers over [num_queries] at once; hits are gathered
into fixed-cap [num_queries, cap] tiles with validity masks (TPU-native
replacement for variable-length hit-list pointers).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..genome import Genome
from .build import EMPTY_KEY, load_index_arrays


class DeviceIndex(NamedTuple):
    """Index arrays as a pytree (device-resident, shardable).

    Format v3 (build.py): `table` is [n_banks, bank_slots, 4] uint32 —
    per slot (key_lo, key_hi, hits_start, n0 | n1 << 16). The bank count
    and bucket geometry are static from the shape, and ONE bucket-row
    gather returns keys and payload together (gather cost on TPU scales
    with the number of indices, not bytes).
    """

    table: jax.Array        # [n_banks, bank_slots, 4] uint32
    hits: jax.Array         # [T] uint32 locations (desc per list)
    genome: jax.Array       # [G] uint8 base codes
    # 2-bit-packed genome (16 bases / u32 word, base i at bits 2*(i%16))
    # + per-base invalid mask (N/pad, 32 bases / u32 word): the gapless
    # XOR prescreen reads these instead of byte-gathering windows — the
    # TPU equivalent of SNAP's 64-bit XOR scan (LandauVishkin.h:377-407).
    genome_packed: jax.Array | None = None  # [ceil(G/16)] uint32
    genome_bad: jax.Array | None = None     # [ceil(G/32)] uint32
    # Per-base invalid mask at EVEN bit positions, 16 bases per u32 word
    # — the same geometry as genome_packed, so one funnel shift aligns
    # both and mismatches reduce to XOR + popcount (the TPU form of
    # SNAP's 64-bit XOR scan). Words past the genome end are all-bad.
    genome_bad16: jax.Array | None = None
    # packed + bad16 interleaved ([2i] = packed[i], [2i+1] = bad16[i]),
    # viewed as [n/16, 16] rows: one window read pulls BOTH planes in
    # two 64B row gathers instead of four 32B ones (gather cost on TPU
    # scales with the number of indices)
    genome_pb16: jax.Array | None = None


def pack_genome_words(bases: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Host-side packing of a byte-code genome into (packed, badmask)."""
    g = np.asarray(bases)
    G = g.shape[0]
    n16 = (G + 15) // 16
    # pad to a multiple of 8 words (+8) so windows read as 2-3 row
    # gathers of an [n/8, 8] view
    packed = np.zeros(n16 + 8 + (-(n16 + 8)) % 8, dtype=np.uint32)
    codes = np.where(g < 4, g, 0).astype(np.uint32)
    for i in range(16):
        lane = codes[i::16]
        packed[: len(lane)] |= lane << np.uint32(2 * i)
    n32 = (G + 31) // 32
    bad = np.zeros(n32 + 8 + (-(n32 + 8)) % 8, dtype=np.uint32)
    isbad = (g >= 4).astype(np.uint32)
    for i in range(32):
        lane = isbad[i::32]
        bad[: len(lane)] |= lane << np.uint32(i)
    return packed, bad


def pack_bad16(bases: np.ndarray, n_words: int) -> np.ndarray:
    """Invalid-base mask at even bit positions, 16 bases/word, padded to
    n_words with all-bad words (same geometry as the packed codes)."""
    g = np.asarray(bases)
    ext = np.ones(n_words * 16, dtype=np.uint32)
    ext[: g.shape[0]] = g >= 4
    bad16 = np.zeros(n_words, dtype=np.uint32)
    for i in range(16):
        bad16 |= ext[i::16] << np.uint32(2 * i)
    return bad16


def make_device_index(arrays: dict, genome_bases: np.ndarray) -> DeviceIndex:
    """Build a DeviceIndex with row-gather-friendly layouts: packed
    genome words, 8-aligned padded hits, and a PAD-padded genome whose
    length is a multiple of 8 (so scoring windows read as [G/8, 8] row
    gathers; PAD never matches, identical semantics to out-of-bounds)."""
    packed, bad = pack_genome_words(genome_bases)
    hits = np.asarray(arrays["hits"])
    pad = 8 + (-(hits.shape[0] + 8)) % 8
    hits_p = np.concatenate([hits, np.zeros(pad, hits.dtype)])
    gpad = (-genome_bases.shape[0]) % 8
    if gpad:
        genome_bases = np.concatenate(
            [genome_bases, np.full(gpad, 5, np.uint8)]
        )
    bad16 = pack_bad16(genome_bases, packed.shape[0])
    inter = np.empty(2 * packed.shape[0], dtype=np.uint32)
    inter[0::2] = packed
    inter[1::2] = bad16
    pad16 = (-inter.shape[0]) % 16
    if pad16:
        # pad words read as all-bad so windows past the end never match
        tailp = np.zeros(pad16, np.uint32)
        tailp[1::2] = 0x55555555
        inter = np.concatenate([inter, tailp])
    return DeviceIndex(
        table=jnp.asarray(np.asarray(arrays["table"])),
        hits=jnp.asarray(hits_p),
        genome=jnp.asarray(genome_bases),
        genome_packed=jnp.asarray(packed),
        genome_bad=jnp.asarray(bad),
        genome_bad16=jnp.asarray(bad16),
        genome_pb16=jnp.asarray(inter.reshape(-1, 16)),
    )


def murmur_finalize64(k: jax.Array) -> jax.Array:
    k = k.astype(jnp.uint64)
    k = k ^ (k >> np.uint64(33))
    k = k * np.uint64(0xFF51AFD7ED558CCD)
    k = k ^ (k >> np.uint64(33))
    k = k * np.uint64(0xC4CEB9FE1A85EC53)
    k = k ^ (k >> np.uint64(33))
    return k


def probe(
    idx: DeviceIndex, queries: jax.Array, max_probe: int
) -> tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Hash-probe a batch of canonical seed keys (format v3).

    queries: [N] uint64. max_probe = the index's bucket span: a key
    lives within `span` consecutive 8-slot buckets starting at its home
    bucket inside its bank (see build.assemble_table), so lookup is a
    contiguous span of bucket-row gathers + a parallel compare — no
    sequential probe loop, and payload rides in the same rows.

    Returns (found [N] bool, start [N] int64, n0 [N] int32,
    n1 [N] int32). Missing keys return counts of 0.
    """
    from .build import BUCKET_SLOTS, SPAN_SLACK

    span = max(1, max_probe)
    n_banks, bank_slots, _ = idx.table.shape
    bank_buckets = bank_slots // BUCKET_SLOTS - SPAN_SLACK
    log2b = max(n_banks - 1, 0).bit_length()
    h = murmur_finalize64(queries)
    bank = (
        (h & jnp.uint64(n_banks - 1)).astype(jnp.int64)
        if n_banks > 1
        else jnp.zeros(queries.shape[0], jnp.int64)
    )
    home = ((h >> jnp.uint64(log2b)) & jnp.uint64(bank_buckets - 1)).astype(
        jnp.int64
    )
    # global bucket-row view: [n_banks * bank_buckets_total, 8*4] u32 —
    # one gather index returns a whole bucket (keys + payload)
    t2 = idx.table.reshape(-1, BUCKET_SLOTS * 4)
    nrows = t2.shape[0]
    stride = bank_slots // BUCKET_SLOTS
    brow = bank * stride + home
    if span >= 3 and nrows % 2 == 0:
        # double-bucket gather rows: ceil((span+1)/2) indices instead
        # of span (TPU gather cost scales with the index count, not
        # bytes). The aligned window [2*(home//2), ...) always covers
        # buckets home..home+span-1; the extra buckets it sweeps in
        # can't false-positive because table keys are unique.
        dr = span // 2 + 1
        t4 = t2.reshape(nrows // 2, 2 * BUCKET_SLOTS * 4)
        drow = brow >> 1
        rows = jnp.concatenate(
            [
                t4[jnp.clip(drow + j, 0, nrows // 2 - 1)]
                for j in range(dr)
            ],
            axis=1,
        ).reshape(queries.shape[0], dr * 2 * BUCKET_SLOTS, 4)
    else:
        rows = jnp.concatenate(
            [t2[jnp.clip(brow + j, 0, nrows - 1)] for j in range(span)],
            axis=1,
        ).reshape(queries.shape[0], span * BUCKET_SLOTS, 4)
    q_lo = (queries & jnp.uint64(0xFFFFFFFF)).astype(jnp.uint32)
    q_hi = (queries >> jnp.uint64(32)).astype(jnp.uint32)
    hit = (rows[:, :, 0] == q_lo[:, None]) & (rows[:, :, 1] == q_hi[:, None])
    found = hit.any(axis=1)
    # keys are unique: at most one slot matches, so masked sums select
    # the payload without an element gather
    start = jnp.sum(
        jnp.where(hit, rows[:, :, 2], np.uint32(0)), axis=1,
        dtype=jnp.uint32,
    ).astype(jnp.int64)
    packed = jnp.sum(
        jnp.where(hit, rows[:, :, 3], np.uint32(0)), axis=1,
        dtype=jnp.uint32,
    )
    n0 = (packed & jnp.uint32(0xFFFF)).astype(jnp.int32)
    n1 = (packed >> jnp.uint32(16)).astype(jnp.int32)
    start = jnp.where(found, start, 0)
    n0 = jnp.where(found, n0, 0)
    n1 = jnp.where(found, n1, 0)
    return found, start, n0, n1


def gather_hits(
    hits: jax.Array, start: jax.Array, count: jax.Array, cap: int
) -> tuple[jax.Array, jax.Array]:
    """Gather up to `cap` hit locations per query.

    start/count: [N]. Returns (locs [N, cap] uint32, valid [N, cap] bool).
    Lists are stored descending, so taking the first `cap` keeps the
    highest locations (matches SNAP's descending iteration order).
    """
    T = hits.shape[0]
    offs = jnp.arange(cap, dtype=jnp.int64)
    valid = offs[None, :] < count[:, None].astype(jnp.int64)
    if T % 8 == 0 and T >= 16:
        # windowed row gathers: cap//8+1 rows of 8, then an 8-way phase
        # select — (cap//8+1) gather indices per query instead of cap
        h2 = hits.reshape(-1, 8)
        nrows = cap // 8 + 1
        r0 = start >> 3
        blocks = [
            h2[jnp.clip(r0 + j, 0, h2.shape[0] - 1)] for j in range(nrows)
        ]
        ab = jnp.concatenate(blocks, axis=1)  # [N, nrows*8]
        sh = (start & 7).astype(jnp.int32)
        out = jnp.zeros((start.shape[0], cap), hits.dtype)
        for s in range(8):
            out = jnp.where(
                (sh == s)[:, None],
                jax.lax.slice_in_dim(ab, s, s + cap, axis=1),
                out,
            )
        return out, valid
    rows = start[:, None] + offs[None, :]
    rows = jnp.clip(rows, 0, T - 1)
    return hits[rows], valid


def pack_read_seeds(
    bases: jax.Array, seed_len: int
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Pack every seed position of a read batch.

    bases: [B, L] uint8 codes. Returns (fwd [B, P] uint64, rc [B, P] uint64,
    valid [B, P] bool) where P = L - seed_len + 1. Pure slicing — no
    gathers — so XLA vectorizes it as 2*seed_len shifted adds.
    """
    B, L = bases.shape
    P = L - seed_len + 1
    fwd = jnp.zeros((B, P), dtype=jnp.uint64)
    rc = jnp.zeros((B, P), dtype=jnp.uint64)
    valid = jnp.ones((B, P), dtype=bool)
    for i in range(seed_len):
        b = bases[:, i : i + P]
        ok = b < 4
        valid = valid & ok
        bs = jnp.where(ok, b, 0).astype(jnp.uint64)
        fwd = (fwd << np.uint64(2)) | bs
        rc = rc | ((np.uint64(3) - bs) << np.uint64(2 * i))
    return fwd, rc, valid


class GenomeIndex:
    """Host wrapper: genome metadata + device arrays + static params."""

    def __init__(self, genome: Genome, arrays: dict):
        self.genome_meta = genome
        self.seed_len: int = arrays["seed_len"]
        self.max_probe: int = arrays["max_probe"]
        gb = np.asarray(genome.bases)
        self._n_hits = int(np.asarray(arrays["hits"]).shape[0])
        # host copies for save(): pulling the arrays back from the
        # device would be a slow D2H round trip of the whole index
        self._host_arrays = {
            k: np.asarray(arrays[k]) for k in ("hits", "table")
        }
        self.device = make_device_index(arrays, gb)
        self._host_index = None

    @property
    def host(self):
        """Lazy numpy-side lookup view (full CSR hit lists)."""
        if self._host_index is None:
            from .host_lookup import HostIndex

            self._host_index = HostIndex(
                self._host_arrays, self.seed_len, self.max_probe
            )
        return self._host_index

    @classmethod
    def build(cls, genome: Genome, seed_len: int | None = None) -> "GenomeIndex":
        from ..constants import DEFAULT_SEED_LEN
        from .build import build_index

        arrays = build_index(genome, seed_len or DEFAULT_SEED_LEN)
        return cls(genome, arrays)

    @classmethod
    def load(cls, directory: str) -> "GenomeIndex":
        import os

        if not os.path.exists(os.path.join(directory, "index_meta.json")):
            from .snap_format import is_snap_index_dir, load_snap_index

            if is_snap_index_dir(directory):
                # a reference snap-aligner index directory: import it
                genome, arrays = load_snap_index(directory)
                return cls(genome, arrays)
        genome = Genome.load(directory)
        arrays = load_index_arrays(directory)
        return cls(genome, arrays)

    def to_mesh(self, mesh, n_index: int = 1) -> "GenomeIndex":
        """Place the index for multi-chip execution: re-shard the hash
        table over the 'index' mesh axis (no genome rescan; see
        build.reshard_index) and device_put with the mesh shardings.
        Sets .device_sharded; max_probe widens to cover shard spans."""
        from ..parallel.mesh import sharded_device_index
        from .build import reshard_index

        arrays = reshard_index(
            {
                "seed_len": self.seed_len,
                "max_probe": self.max_probe,
                **self._host_arrays,
            },
            n_index,
        )
        self.max_probe = max(self.max_probe, arrays["max_probe"])
        self.device_sharded = sharded_device_index(
            arrays, np.asarray(self.genome_meta.bases), mesh
        )
        self.mesh = mesh
        return self

    def save(self, directory: str) -> None:
        from .build import save_index

        arrays = {
            "seed_len": self.seed_len,
            "max_probe": self.max_probe,
            **self._host_arrays,
        }
        save_index(arrays, self.genome_meta, directory)
