"""Shard dispatch of kmers across counters / devices.

Twin of DispatchableT (/root/reference/src/base/kmercount.rs:382-420): a kmer
routes to shard ``invhash(value) % n_shards`` — the extra invertible-hash pass
equidistributes AT/CG-skewed canonical kmers (idea credited to H. Li,
kmercount.rs:828-831).  We use the same construction with Thomas Wang's
invertible hashes (see ops/rng.py provenance note).

On a device mesh the dispatch becomes the partition function for an
all-to-all: each device keeps the kmers whose shard id equals its own (or
exchanges them), so per-shard count tables stay disjoint exactly like the
reference's per-thread counter pools.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..ops.rng import wang_hash32, wang_hash64

U32 = jnp.uint32
U64 = jnp.uint64


def dispatch_u32(values, n_shards: int):
    """Shard id of 32-bit kmer values (kmercount.rs:392-398)."""
    return (wang_hash32(jnp.asarray(values, U32)) % U32(n_shards)).astype(jnp.int32)


def dispatch_u64(values, n_shards: int):
    """Shard id of 64-bit kmer values (kmercount.rs:403-409)."""
    return (wang_hash64(jnp.asarray(values, U64)) % U64(n_shards)).astype(jnp.int32)


def dispatch(values, n_shards: int, k: int):
    """Shard by the width the reference would use for this k."""
    if k <= 16:
        return dispatch_u32(jnp.asarray(values).astype(U32), n_shards)
    return dispatch_u64(values, n_shards)
