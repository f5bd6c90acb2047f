"""snap-tpu: a TPU-native short-read DNA aligner.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of SNAP
(the Scalable Nucleotide Alignment Program, reference: amplab/snap).
The compute path — seed lookup, candidate generation, banded DP scoring,
MAPQ — runs as batched fixed-shape tensor wavefronts on TPU; the host
side handles FASTQ/SAM/BAM I/O, index persistence, sorting, and
duplicate marking.

Unlike the reference (per-read pointer-chasing C++, SSE kernels,
pthreads), snap-tpu expresses alignment as SPMD array programs:
reads are batched, seeds are looked up with vectorized hash probes,
candidates form via sort+segment-reduce, and scoring is an
anti-diagonal DP wavefront over thousands of (read, window) pairs.
"""

# 64-bit integers are required for packed seeds (up to 32 bases x 2 bits)
# and for genome-scale sort keys. We opt in before any other jax import.
import os as _os

import jax

# The axon TPU plugin ignores the JAX_PLATFORMS env var; honor it here
# so JAX_PLATFORMS=cpu really runs on CPU (tests, verification).
if _os.environ.get("JAX_PLATFORMS"):
    try:
        jax.config.update("jax_platforms", _os.environ["JAX_PLATFORMS"])
    except Exception:
        pass

jax.config.update("jax_enable_x64", True)

# Persistent compilation cache: the align wavefront is one large program
# and a cold compile through a tunneled device is minutes; caching makes
# repeat CLI/daemon/bench invocations start instantly (the moral
# equivalent of the reference daemon keeping state warm across runs).
_cache_dir = _os.environ.get(
    "SNAP_TPU_COMPILE_CACHE",
    _os.path.join(_os.path.expanduser("~"), ".cache", "snap_tpu_xla"),
)
if _cache_dir and _cache_dir != "0":
    try:
        jax.config.update("jax_compilation_cache_dir", _cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass

__version__ = "0.1.0"
