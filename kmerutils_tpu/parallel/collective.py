"""Multi-device counting & sketching via shard_map collectives.

TPU-native re-expression of the reference's parallel inventory
(SURVEY.md §2.10 / /root/reference/src/base/kmercount.rs):

* producer->consumer channels routing kmers to per-thread counters
  (count_kmer_threaded_one_to_many, kmercount.rs:881-974)  ==>  reads are
  data-parallel per device; each device extracts + canonicalizes its reads'
  kmers, computes the invhash shard id (DispatchableT, :382-420), and a
  fixed-capacity ``all_to_all`` exchanges kmers so device d receives exactly
  the kmers with shard id d.  Per-device count tables stay disjoint, like the
  reference's counter pools.
* pool merge of bloom filters (:810-814)  ==>  jax.lax.pmax over slot tensors.
* HLL block merge (setsketchert.rs:863-888)  ==>  jax.lax.pmax of registers.
* rayon par_iter over sequences (every sketcher)  ==>  reads-data-parallel
  shard_map with no communication at all.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
try:                                   # moved to the core namespace
    from jax import shard_map
except ImportError:                    # older jax
    from jax.experimental.shard_map import shard_map

from ..base.sequence import ReadBatch
from ..base import kmer as kmer_mod
from ..count import exact, dispatch
from ..count.exact import SENTINEL64
from ..sketch import setsketch
from .mesh import READS_AXIS

U64 = jnp.uint64


def _bucketize_by_shard(keys, shard_ids, n_shards: int, cap: int):
    """Arrange a device's kmers into [n_shards, cap] send buckets (sentinel
    padded).  Overflowing keys are dropped and counted.

    Sort by shard id (keys ride along), locate shard boundaries with a tiny
    searchsorted, and GATHER each bucket's slots — no scatter/segment-sum.
    Sentinel keys must carry shard id >= n_shards so they sort past every
    real shard.
    """
    ss, sk = jax.lax.sort((jnp.asarray(shard_ids, jnp.int32), keys),
                          num_keys=1, is_stable=True)
    starts = jnp.searchsorted(ss, jnp.arange(n_shards + 1, dtype=jnp.int32))
    counts = starts[1:] - starts[:-1]
    dropped = jnp.maximum(counts - cap, 0).sum()
    r = jnp.arange(cap, dtype=jnp.int32)[None, :]
    idx = jnp.minimum(starts[:-1, None] + r, ss.shape[0] - 1)
    live = r < counts[:, None]
    buckets = jnp.where(live, sk[idx], SENTINEL64)
    return buckets, dropped


def sharded_count(batch: ReadBatch, k: int, mesh: Mesh, shard_cap_factor: float = 1.5):
    """Exact canonical-kmer counting with reads data-parallel and kmer space
    hash-partitioned across the mesh.

    batch arrays must be sharded (or shardable) on the leading axis.  Returns
    per-device-sharded (keys [n_dev, C], counts [n_dev, C], dropped [n_dev])
    where row d holds the distinct kmers whose invhash shard is d.
    """
    n_dev = mesh.shape[READS_AXIS]
    n, Pn = batch.n_reads, max(batch.max_len - k + 1, 1)
    local_slots = (n // n_dev) * Pn
    cap = int(local_slots / n_dev * shard_cap_factor) + 64

    def step(words, lengths):
        local = ReadBatch(words=words, lengths=lengths)
        can, valid, _ = kmer_mod.canonical_kmers(local, k)
        keys = jnp.where(valid, can.astype(U64), SENTINEL64).ravel()
        sid = dispatch.dispatch(
            jnp.where(keys == SENTINEL64, U64(0), keys), n_dev, k)
        # sentinels carry an out-of-range shard id so they sort past every
        # real shard and never consume bucket capacity
        sid = jnp.where(keys == SENTINEL64, n_dev, sid)
        buckets, dropped = _bucketize_by_shard(keys, sid, n_dev, cap)
        # all_to_all: send bucket row j to device j
        recv = jax.lax.all_to_all(buckets[None], READS_AXIS, split_axis=1,
                                  concat_axis=1, tiled=False)[0]
        mine = recv.reshape(-1)  # kmers of my shard from all devices
        kc = exact.count_from_values(mine)
        return (kc.keys[None], kc.counts[None], dropped[None],
                kc.n_distinct[None], kc.n_unique[None])

    fn = shard_map(step, mesh=mesh,
                   in_specs=(P(READS_AXIS), P(READS_AXIS)),
                   out_specs=(P(READS_AXIS), P(READS_AXIS), P(READS_AXIS),
                              P(READS_AXIS), P(READS_AXIS)))
    return fn(batch.words, batch.lengths)


def sharded_count_redundant(batch: ReadBatch, k: int, mesh: Mesh):
    """Redundant-compute sharding: every device scans the FULL (replicated)
    batch and keeps only the kmers whose invhash shard is its own — zero
    communication, compute traded for bandwidth.

    Twin of count_kmer_thread_independant (kmercount.rs:797-867), the
    reference's fallback strategy.  Returns per-device-sharded (keys, counts,
    n_distinct, n_unique) like :func:`sharded_count`.
    """
    n_dev = mesh.shape[READS_AXIS]

    def step(words, lengths):
        local = ReadBatch(words=words, lengths=lengths)
        can, valid, _ = kmer_mod.canonical_kmers(local, k)
        keys = jnp.where(valid, can.astype(U64), SENTINEL64).ravel()
        sid = dispatch.dispatch(
            jnp.where(keys == SENTINEL64, U64(0), keys), n_dev, k)
        mine = jax.lax.axis_index(READS_AXIS)
        keys = jnp.where((sid == mine) & (keys != SENTINEL64), keys, SENTINEL64)
        kc = exact.count_from_values(keys)
        return (kc.keys[None], kc.counts[None],
                kc.n_distinct[None], kc.n_unique[None])

    fn = shard_map(step, mesh=mesh, in_specs=(P(), P()),
                   out_specs=(P(READS_AXIS),) * 4)
    return fn(batch.words, batch.lengths)


def sharded_setsketch_collection(items, valid, params, mesh: Mesh, seed: int = 0):
    """One SetSketch for the whole sharded collection: per-device registers
    merged with pmax over ICI (the TPU form of the reference's block-merge
    tree, setsketchert.rs:811-895)."""

    def step(it, va):
        regs = setsketch.setsketch_signatures(it, va, params, seed)
        merged = jax.lax.pmax(jnp.max(regs, axis=0), READS_AXIS)
        return merged[None]

    fn = shard_map(step, mesh=mesh, in_specs=(P(READS_AXIS), P(READS_AXIS)),
                   out_specs=P(READS_AXIS))
    out = fn(items, valid)
    return out[0]


def sharded_bloom_insert(slots, keys, nb_hash: int, log2_slots: int, mesh: Mesh):
    """Insert sharded keys into a replicated Bloom slot tensor: local scatter
    then pmax union (kmercount.rs:810-814's mergeability).

    The local scatter costs ~443 ms per 8M keys on a v5e (see
    count/filters.py — sort-based alternatives measured no faster), so this
    is a per-batch capability API, not the per-kmer hot path; exact counting
    streams through count/stream.py + parallel sharded_stream_* instead."""
    from ..count import filters

    def step(sl, ks):
        idx = filters.probe_indices(ks.ravel(), nb_hash, log2_slots)
        mask = (ks.ravel() != SENTINEL64)[:, None]
        val = jnp.where(mask, jnp.uint8(1), jnp.uint8(0))
        val = jnp.broadcast_to(val, idx.shape)  # one value per PROBE
        idx = jnp.where(mask, idx, 0)
        sl = sl.at[idx.ravel()].max(val.ravel())
        return jax.lax.pmax(sl, READS_AXIS)

    fn = shard_map(step, mesh=mesh, in_specs=(P(), P(READS_AXIS)), out_specs=P())
    return fn(slots, keys)


def sharded_table_create(capacity_per_device: int, mesh: Mesh):
    """Per-device streaming count tables, kmer-space sharded: device d's
    table only ever holds kmers whose invhash shard is d (disjoint, like the
    reference's counter pool).  Returns a table pytree with leading axis
    n_devices, sharded over the mesh."""
    n_dev = mesh.shape[READS_AXIS]
    table = exact.DeviceCountTable.create(capacity_per_device)
    stacked = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x[None], (n_dev,) + x.shape), table)
    sh = jax.sharding.NamedSharding(mesh, P(READS_AXIS))
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), stacked)


def sharded_table_update(table, batch: ReadBatch, k: int, mesh: Mesh,
                         read_num_offset: int = 0,
                         shard_cap_factor: float = 1.5):
    """One streaming step of multi-device counting: reads data-parallel,
    kmers + first-occurrence coords routed to their shard's device over ICI
    (all_to_all), folded into that device's DeviceCountTable.

    The multi-chip production form of `parsefastq kmer --count`: state stays
    in sharded HBM across the whole file; results transfer to host once.
    Returns (updated table, per-device dropped-in-transit count).
    """
    n_dev = mesh.shape[READS_AXIS]
    n, Pn = batch.n_reads, max(batch.max_len - k + 1, 1)
    local_slots = (n // n_dev) * Pn
    cap = int(local_slots / n_dev * shard_cap_factor) + 64

    def step(tab, words, lengths):
        local = ReadBatch(words=words, lengths=lengths)
        dev = jax.lax.axis_index(READS_AXIS)
        n_local = words.shape[0]
        offset = read_num_offset + dev * n_local
        keys, counts, coord = exact.batch_table_inputs(local, k, offset)
        # batch keys keep the kmer dtype (u32 for k <= 16); the sharded
        # exchange and the per-device table run u64-keyed
        live = keys != exact.sentinel_of(keys.dtype)
        keys = jnp.where(live, keys.astype(U64), SENTINEL64)
        # each distinct key appears once per source device (local count +
        # local first coord); the owning device's table_update merges the
        # <= n_dev arriving records per key (sums counts, min coord)
        sid = dispatch.dispatch(
            jnp.where(keys == SENTINEL64, U64(0), keys), n_dev, k)
        sid = jnp.where(keys == SENTINEL64, n_dev, sid)
        kb, dropped_k = _bucketize_by_shard(keys, sid, n_dev, cap)
        cb, _ = _bucketize_by_shard(
            jnp.where(keys == SENTINEL64, U64(0), counts.astype(U64)),
            sid, n_dev, cap)
        ob, _ = _bucketize_by_shard(coord, sid, n_dev, cap)
        rk = jax.lax.all_to_all(kb[None], READS_AXIS, 1, 1, tiled=False)[0]
        rc = jax.lax.all_to_all(cb[None], READS_AXIS, 1, 1, tiled=False)[0]
        ro = jax.lax.all_to_all(ob[None], READS_AXIS, 1, 1, tiled=False)[0]
        mine_k = rk.reshape(-1)
        mine_c = jnp.where(mine_k == SENTINEL64, 0, rc.reshape(-1)).astype(
            jnp.int64)
        mine_o = jnp.where(mine_k == SENTINEL64, SENTINEL64, ro.reshape(-1))
        local_tab = jax.tree_util.tree_map(lambda x: x[0], tab)
        new_tab = exact.table_update(local_tab, mine_k, mine_c, mine_o)
        new_tab = jax.tree_util.tree_map(lambda x: x[None], new_tab)
        return new_tab, dropped_k[None]

    fn = shard_map(step, mesh=mesh,
                   in_specs=(P(READS_AXIS), P(READS_AXIS), P(READS_AXIS)),
                   out_specs=(P(READS_AXIS), P(READS_AXIS)))
    return fn(table, batch.words, batch.lengths)


def _bucketize_multi(payloads, shard_ids, n_shards: int, cap: int,
                     sentinels):
    """_bucketize_by_shard for several payload arrays sharing one shard-id
    permutation: ONE variadic sort carries all payloads."""
    ops = (jnp.asarray(shard_ids, jnp.int32),) + tuple(payloads)
    sorted_ops = jax.lax.sort(ops, num_keys=1, is_stable=True)
    ss = sorted_ops[0]
    starts = jnp.searchsorted(ss, jnp.arange(n_shards + 1, dtype=jnp.int32))
    counts = starts[1:] - starts[:-1]
    dropped = jnp.maximum(counts - cap, 0).sum()
    r = jnp.arange(cap, dtype=jnp.int32)[None, :]
    idx = jnp.minimum(starts[:-1, None] + r, ss.shape[0] - 1)
    live = r < counts[:, None]
    buckets = tuple(jnp.where(live, sp[idx], sent)
                    for sp, sent in zip(sorted_ops[1:], sentinels))
    return buckets, dropped


def sharded_stream_create(capacity_per_device: int, mesh: Mesh,
                          wide: bool = False, coords: bool = False):
    """Per-device streaming merge-fold tables (count/stream.py), kmer-space
    sharded: the multi-chip production successor of sharded_table_create —
    folds run the Pallas merge kernel per chip instead of the
    capacity-sized re-sort."""
    from ..count import stream
    n_dev = mesh.shape[READS_AXIS]
    table = stream.StreamCountTable.create(capacity_per_device, wide, coords)
    stacked = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x[None], (n_dev,) + x.shape), table)
    sh = jax.sharding.NamedSharding(mesh, P(READS_AXIS))
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), stacked)


def sharded_stream_update(table, batch: ReadBatch, k: int, mesh: Mesh,
                          read_num_offset: int = 0,
                          shard_cap_factor: float = 1.5):
    """One streaming step of multi-chip counting through the merge-fold
    table: reads data-parallel, raw kmer entries (count 1 each, optional
    first-occurrence coords) routed to their invhash shard over ICI
    (all_to_all), sorted locally, and folded by ONE Pallas merge per chip.

    Routing uses the RAW canonical value (DispatchableT, kmercount.rs:
    382-420) so placement is bias-independent; keys take their +1 storage
    bias (both widths — count/stream.py's layout contract) only after the
    exchange.  Returns (updated table, per-device in-transit drop count).
    """
    from ..count import stream
    n_dev = mesh.shape[READS_AXIS]
    n, Pn = batch.n_reads, max(batch.max_len - k + 1, 1)
    local_slots = (n // n_dev) * Pn
    cap = int(local_slots / n_dev * shard_cap_factor) + 64
    coords = table.coords if hasattr(table, "coords") else False
    wide = table.wide

    def step(tab, words, lengths):
        local = ReadBatch(words=words, lengths=lengths)
        can, valid, _ = kmer_mod.canonical_kmers(local, k)
        dev = jax.lax.axis_index(READS_AXIS)
        n_local, p = can.shape
        keys = jnp.where(valid.ravel(), can.ravel().astype(U64), SENTINEL64)
        live = keys != SENTINEL64
        sid = dispatch.dispatch(jnp.where(live, keys, U64(0)), n_dev, k)
        sid = jnp.where(live, sid, n_dev)
        payloads = [keys]
        sentinels = [SENTINEL64]
        if coords:
            idx = jnp.arange(n_local * p, dtype=jnp.int64)
            rn = (idx // p + read_num_offset
                  + dev.astype(jnp.int64) * n_local).astype(U64)
            coord = (rn << U64(32)) | (idx % p).astype(U64)
            payloads.append(jnp.where(live, coord, SENTINEL64))
            sentinels.append(SENTINEL64)
        buckets, dropped = _bucketize_multi(payloads, sid, n_dev, cap,
                                            sentinels)
        recv = [jax.lax.all_to_all(b[None], READS_AXIS, 1, 1,
                                   tiled=False)[0].reshape(-1)
                for b in buckets]
        mine_k = recv[0]
        if coords:
            sk, so = jax.lax.sort((mine_k, recv[1]), num_keys=1)
        else:
            sk = jnp.sort(mine_k)
        is_live = sk != SENTINEL64
        if wide:
            biased = jnp.where(is_live, sk + U64(1), SENTINEL64)
            arrs = ((biased >> U64(32)).astype(jnp.uint32),
                    biased.astype(jnp.uint32))
        else:
            # +1 bias (live keys <= 0xFF..FD, so no wrap on live lanes)
            arrs = (jnp.where(is_live, sk.astype(jnp.uint32) + jnp.uint32(1),
                              jnp.uint32(0xFFFFFFFF)),)
        arrs = arrs + (jnp.where(is_live, jnp.uint32(1),
                                 jnp.uint32(0xFFFFFFFF)),)
        if coords:
            arrs = arrs + (
                jnp.where(is_live, (so >> U64(32)).astype(jnp.uint32),
                          jnp.uint32(0xFFFFFFFF)),
                jnp.where(is_live, so.astype(jnp.uint32),
                          jnp.uint32(0xFFFFFFFF)))
        local_tab = jax.tree_util.tree_map(lambda x: x[0], tab)
        new_tab = stream.fold(local_tab, arrs,
                              is_live.sum().astype(jnp.int32))
        new_tab = jax.tree_util.tree_map(lambda x: x[None], new_tab)
        return new_tab, dropped[None]

    # pallas_call inside shard_map predates the vma annotation plumbing —
    # disable the varying-across-mesh check (kwarg renamed check_rep ->
    # check_vma when shard_map moved to core)
    try:
        fn = shard_map(step, mesh=mesh,
                       in_specs=(P(READS_AXIS), P(READS_AXIS),
                                 P(READS_AXIS)),
                       out_specs=(P(READS_AXIS), P(READS_AXIS)),
                       check_vma=False)
    except TypeError:
        fn = shard_map(step, mesh=mesh,
                       in_specs=(P(READS_AXIS), P(READS_AXIS),
                                 P(READS_AXIS)),
                       out_specs=(P(READS_AXIS), P(READS_AXIS)),
                       check_rep=False)
    return fn(table, batch.words, batch.lengths)


def sharded_stream_finalize(table, mesh: Mesh, min_count: int = 1,
                            max_count: int | None = None):
    """Host collection of the sharded tables: finalize each device's
    DISJOINT shard, concatenate, and key-sort on host (the
    KmerCounterPool union is a concatenation, kmercount.rs:546-565)."""
    from ..count import stream
    n_dev = mesh.shape[READS_AXIS]
    parts = []
    for d in range(n_dev):
        local = jax.tree_util.tree_map(lambda x: x[d], table)
        parts.append(stream.finalize(local, min_count, max_count))
    keys = np.concatenate([p[0] for p in parts])
    counts = np.concatenate([p[1] for p in parts])
    rn = np.concatenate([p[2] for p in parts])
    ps = np.concatenate([p[3] for p in parts])
    dropped = sum(p[4] for p in parts)
    order = np.argsort(keys, kind="stable")
    return keys[order], counts[order], rn[order], ps[order], dropped


def gather_signatures(sigs, mesh: Mesh):
    """All-gather per-device signature blocks so every device (and the host)
    sees the full signature matrix — the collection step before ANN export
    (SURVEY.md §7 step 7)."""
    def step(s):
        return jax.lax.all_gather(s, READS_AXIS, axis=0, tiled=True)

    # all_gather makes every device's output identical; shard_map cannot
    # infer that statically, so replication checking is disabled here
    # (kwarg renamed check_rep -> check_vma when shard_map moved to core)
    try:
        fn = shard_map(step, mesh=mesh, in_specs=P(READS_AXIS),
                       out_specs=P(), check_vma=False)
    except TypeError:
        fn = shard_map(step, mesh=mesh, in_specs=P(READS_AXIS),
                       out_specs=P(), check_rep=False)
    return fn(sigs)


def data_parallel_sketch(sketch_fn, mesh: Mesh):
    """Wrap a per-batch sketch function (items, valid) -> sigs as a
    reads-data-parallel shard_map (the rayon par_iter role — zero comms)."""

    def step(items, valid):
        return sketch_fn(items, valid)

    return shard_map(step, mesh=mesh, in_specs=(P(READS_AXIS), P(READS_AXIS)),
                     out_specs=P(READS_AXIS))
