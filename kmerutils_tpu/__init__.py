"""kmerutils_tpu — a TPU-native k-mer engine.

A from-scratch re-design of the capabilities of the Rust crate
``jean-pierreBoth/kmerutils`` (reference mounted at /root/reference) as
batched-tensor computation on TPU via JAX/XLA/Pallas.

Design stance (see SURVEY.md §7):
  * reads are device-resident, 2-bit packed into uint32 words (16 bases/word),
  * k-mer extraction / canonicalization / hashing are closed-form vectorized
    kernels (no per-kmer objects, no rolling recurrences — prefix-XOR scans),
  * counting is sort/segment based (exact) with Bloom-tensor variants for
    memory-bounded streaming,
  * sketching (ProbMinHash / SuperMinHash / OptDens / SetSketch-HLL) is dense
    (item × slot) VPU work with segmented reductions,
  * multi-device scale-out uses jax.sharding.Mesh + shard_map collectives
    (psum / all-to-all) instead of the reference's crossbeam channels.

64-bit integer support is required (u64 kmers, ntHash values); we enable
jax_enable_x64 at import time, before any JAX computation is traced.
"""

import logging
import os

import jax

jax.config.update("jax_enable_x64", True)

# RUST_LOG twin (reference lib.rs:41-54 lazy env_logger init): set
# KMERUTILS_LOG=debug|info|... to enable the package logger.
_level = os.environ.get("KMERUTILS_LOG")
if _level:
    logging.basicConfig()
    logging.getLogger(__name__).setLevel(_level.upper())

# persistent XLA compilation cache: the streaming-count graphs take minutes
# to compile at multi-10M-element shapes but milliseconds to reload (measured
# 312s -> 27s end-to-end for `parsefastq kmer --count` on a 100 Mbase file).
# Opt out with KMERUTILS_NO_COMPCACHE=1.
if os.environ.get("KMERUTILS_NO_COMPCACHE") != "1":
    _cache = os.environ.get(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.expanduser("~/.cache/kmerutils_tpu/jax"))
    try:
        os.makedirs(_cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", _cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        # CRITICAL for cache hits on the Pallas programs: full tracebacks
        # in MLIR locations leak the CALLER's file:line into the Mosaic
        # custom-call payload, which `strip-debuginfo` cannot reach — so
        # the cache key changed with every distinct call site and the big
        # kernels (merge folds: 4-7 s compile EACH through the remote
        # compiler) recompiled in every new script/process.  With op-site-
        # only locations the keys are stable (measured: 12-batch stream
        # startup 125 s -> 5.4 s from a shifted call site).
        jax.config.update("jax_include_full_tracebacks_in_locations", False)
    except Exception:  # cache is an optimization, never a requirement
        pass

__version__ = "0.1.0"

from . import ops  # noqa: E402,F401
from . import base  # noqa: E402,F401
