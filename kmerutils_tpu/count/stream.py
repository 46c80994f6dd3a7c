"""Streaming whole-file counting: merge-fold device table.

The round-1 DeviceCountTable (count/exact.py) re-sorts capacity+batch
elements with two payloads on EVERY batch fold (991 ms at 2^25 capacity on
v5e) — the wall-clock ceiling of `parsefastq --count` at file scale.  This
module replaces the fold with the Pallas merge-path kernel
(ops/merge_pallas.py):

  batch      ->  one flat sort of the batch's canonical kmers (raw entries,
                 count 1 each — no per-batch aggregation pass)
  fold       ->  ONE O(n) hierarchical merge of (table, batch); duplicate
                 keys coexist as separate entries
  compact    ->  when entries approach capacity: ONE fused Pallas pass
                 (ops/merge_pallas.aggregate_compact_u32) aggregates runs
                 in VMEM with an SMEM carry and butterfly-compacts
  finalize   ->  the same pass with the count-range filter, ONE transfer

The reference counterpart is the cuckoo+counting-bloom insert loop and its
threaded drivers (/root/reference/src/base/kmercount.rs:241-267,881-974);
counts here are exact (saturating at 2^32-1 — far beyond the reference's
8/16-bit dump saturation), and overflow beyond capacity drops the LARGEST
keys deterministically, counted in ``n_dropped`` (entry granularity: a
dropped entry may be a duplicate of a surviving key, so the distinct-key
drop count is <= n_dropped; any surviving largest key may then undercount).

Table entry layout (all uint32 arrays of length S):
  k <= 16 ("u32 keys"):  (key, cnt[, coord_hi, coord_lo])
  k 17..32 ("u64 keys"): (key_hi, key_lo, cnt[, coord_hi, coord_lo])
The merge compares the first 2 words lexicographically.  u64 keys are
stored BIASED by +1 so no live entry compares equal to all-zeros (the
merge kernel's alignment fakes sit there); u32 keys need no bias because
the count word (>= 1) is part of the compare pair.  Dead slots carry
all-ones in every word.  Within a run of equal keys, entries stay ordered
by first occurrence only until a merge reorders ties, so aggregation
computes the run coordinate as a segmented MIN, not the run head.
"""

from __future__ import annotations

import dataclasses
import functools

import numpy as np
import jax
import jax.numpy as jnp

from ..base.sequence import ReadBatch
from ..base import kmer as kmer_mod
from ..ops.merge_pallas import merge_sorted_u32, aggregate_compact_u32

U32 = jnp.uint32
U64 = jnp.uint64
I64 = jnp.int64
SENT32 = np.uint32(0xFFFFFFFF)
SENT64 = np.uint64(0xFFFFFFFFFFFFFFFF)

# one batch is capped at 8M padded bases (io/fastx.read_batches); the
# auto-compact threshold keeps this much headroom so a fold can never
# overflow between compactions
BATCH_CAP = 9 << 20


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class StreamCountTable:
    """Sorted entry table with pending duplicates (see module docstring).

    arrs:      tuple of uint32 [S] entry words.
    used:      int32 — occupied entries (live rows incl. duplicates).
    n_dropped: int64 — entries dropped past capacity (largest keys first).
    """

    arrs: tuple
    used: jax.Array
    n_dropped: jax.Array
    # post-compaction occupancy signal for growth policies: set by fold to 1
    # when a compaction just ran AND the fresh DISTINCT count is within
    # 4*BATCH_CAP of capacity.  `used` alone cannot drive growth — it is
    # inflated by pending duplicates between compactions — while this flag
    # is only raised on clean post-compact state, and the 4-batch margin
    # absorbs the host's fetch lag before it reacts (see cli/parsefastq).
    grow_hint: jax.Array = dataclasses.field(
        default_factory=lambda: jnp.zeros((), jnp.int32))

    # pytree-static config
    wide: bool = dataclasses.field(metadata=dict(static=True), default=False)
    coords: bool = dataclasses.field(metadata=dict(static=True), default=False)

    @property
    def capacity(self) -> int:
        return self.arrs[0].shape[0]

    @staticmethod
    def create(capacity: int, wide: bool, coords: bool) -> "StreamCountTable":
        narr = (3 if wide else 2) + (2 if coords else 0)
        return StreamCountTable(
            arrs=tuple(jnp.full(capacity, SENT32, U32) for _ in range(narr)),
            used=jnp.zeros((), jnp.int32),
            n_dropped=jnp.zeros((), I64),
            grow_hint=jnp.zeros((), jnp.int32),
            wide=wide, coords=coords)


def _window(narr: int) -> int:
    # VMEM budget: 2*narr scratch + narr out blocks of window i32 words
    return 1 << 18 if narr <= 3 else 1 << 17


def batch_entries(batch: ReadBatch, k: int, read_num_offset,
                  coords: bool = False):
    """One batch's raw sorted entries for :func:`fold`.

    Returns (arrs, n_live): uint32 arrays [n*p] in table layout, sorted,
    one entry per valid kmer position (count 1 each; u64 keys biased +1).
    read_num_offset may be a traced scalar.
    """
    can, valid, _ = kmer_mod.canonical_kmers(batch, k)
    n, p = can.shape
    wide = can.dtype == U64
    flatv = jnp.ravel(valid)
    if wide:
        keys = jnp.where(flatv, jnp.ravel(can) + U64(1), SENT64)
    else:
        keys = jnp.where(flatv, jnp.ravel(can), SENT32)
    if coords:
        idx = jnp.arange(n * p, dtype=jnp.int32)
        sk, perm = jax.lax.sort((keys, idx), num_keys=1, is_stable=True)
        live = sk != (SENT64 if wide else SENT32)
        rn = (perm // p).astype(U32) + jnp.asarray(read_num_offset, U32)
        ps = (perm % p).astype(U32)
        chi = jnp.where(live, rn, SENT32)
        clo = jnp.where(live, ps, SENT32)
    else:
        sk = jnp.sort(keys)
        live = sk != (SENT64 if wide else SENT32)
    cnt = jnp.where(live, U32(1), SENT32)
    if wide:
        arrs = ((sk >> U64(32)).astype(U32), sk.astype(U32), cnt)
    else:
        arrs = (sk.astype(U32), cnt)
    if coords:
        arrs = arrs + (chi, clo)
    return arrs, live.sum().astype(jnp.int32)


def _compact(table: StreamCountTable) -> StreamCountTable:
    outs, n_live = aggregate_compact_u32(
        table.arrs, kw=2 if table.wide else 1, coords=table.coords)
    return StreamCountTable(arrs=tuple(outs), used=n_live,
                            n_dropped=table.n_dropped,
                            wide=table.wide, coords=table.coords)


@jax.jit
def fold(table: StreamCountTable, batch_arrs, batch_live):
    """Merge one batch's sorted entries into the table (one Pallas merge);
    auto-compacts on device when occupancy approaches capacity, so a
    stream of folds never needs host synchronization."""
    S = table.capacity

    def do_fold(t):
        merged = merge_sorted_u32(t.arrs, batch_arrs, ncmp=2,
                                  window=_window(len(t.arrs)))
        arrs = tuple(m[:S] for m in merged)
        used = t.used + batch_live
        dropped = jnp.maximum(used - S, 0).astype(I64)
        return StreamCountTable(arrs=arrs,
                                used=jnp.minimum(used, S),
                                n_dropped=t.n_dropped + dropped,
                                grow_hint=t.grow_hint,
                                wide=t.wide, coords=t.coords)

    def compact_and_flag(t):
        t = _compact(t)
        # t.used is now the true DISTINCT count; raise the growth hint
        # while there are still >= 4 batches of slack (host fetch lag)
        hint = (t.used + batch_live
                > S - min(4 * BATCH_CAP, S // 2)).astype(jnp.int32)
        return dataclasses.replace(t, grow_hint=hint)

    # compact once occupancy crosses S - 4*BATCH_CAP (small test-sized
    # tables: half capacity).  The 4-batch headroom is deliberate: the
    # growth hint can only be raised AT a compaction, so compacting this
    # early guarantees a hint fires while a host reacting with a 1-fold
    # fetch lag still has >= 1 batch of slack before any fold could drop
    # (worst case burns 3 batches: the hint fold's own merge, the lag
    # fold, and the reaction fold; an all-new-keys stream gains at most
    # BATCH_CAP distinct per fold)
    headroom = min(4 * BATCH_CAP, S // 2)
    need = table.used + batch_live > S - headroom
    table = jax.lax.cond(need, compact_and_flag,
                         lambda t: dataclasses.replace(
                             t, grow_hint=jnp.zeros((), jnp.int32)), table)
    return do_fold(table)


@jax.jit
def compact(table: StreamCountTable) -> StreamCountTable:
    return _compact(table)


def grow(table: StreamCountTable, new_capacity: int) -> StreamCountTable:
    """Grow the table's capacity in place: live entries are a sorted prefix
    (merges keep sentinels at the tail), so growth is ONE sentinel-pad
    concatenation — no re-sort, no merge.  The cuckoo-resize role of the
    reference's capacity bound (kmercount.rs:297-307), but cheap enough to
    run mid-stream: callers start small and grow x8 only when occupancy
    stays high after compaction (see cli/parsefastq)."""
    S = table.capacity
    if new_capacity <= S:
        return table
    pad = new_capacity - S
    return StreamCountTable(
        arrs=tuple(jnp.concatenate([a, jnp.full((pad,), SENT32, U32)])
                   for a in table.arrs),
        used=table.used, n_dropped=table.n_dropped,
        wide=table.wide, coords=table.coords)


def finalize(table: StreamCountTable, min_count: int = 1,
             max_count: int | None = None, count_clamp: int | None = None):
    """Aggregate + compact + filter on device, then ONE host transfer.

    Returns numpy (keys u32/u64 UNBIASED, counts, read_nums u32,
    positions u32) ascending by key (read_nums/positions all-zero when the
    table tracks no coordinates).  ``count_clamp`` saturates counts on
    DEVICE to 0xFF/0xFFFF and transfers them at 1/2 bytes each — the dump
    formats saturate anyway (kmercount.rs counter_size), and the
    device->host link is the finalize bottleneck.
    """
    @functools.partial(jax.jit, static_argnames=("lo", "hi", "clamp"))
    def run(t, lo, hi, clamp):
        # ONE fused aggregate+filter+compact pass (ops/merge_pallas.py)
        outs, n = aggregate_compact_u32(
            t.arrs, kw=2 if t.wide else 1, coords=t.coords, lo=lo, hi=hi)
        if clamp is not None:
            kw_ = 2 if t.wide else 1
            dt = jnp.uint8 if clamp <= 0xFF else jnp.uint16
            cc = jnp.minimum(outs[kw_], U32(clamp)).astype(dt)
            outs = outs[:kw_] + (cc,) + outs[kw_ + 1:]
        return outs, n, t.n_dropped

    outs, n, dropped = run(table, min_count, max_count, count_clamp)
    n = int(n)
    host = [np.asarray(o[:n]) for o in outs]
    kw = 2 if table.wide else 1
    if table.wide:
        keys = ((host[0].astype(np.uint64) << np.uint64(32))
                | host[1]) - np.uint64(1)        # un-bias
    else:
        keys = host[0]
    counts = host[kw]
    if table.coords:
        rn, ps = host[kw + 1], host[kw + 2]
    else:
        rn = np.zeros(n, np.uint32)
        ps = np.zeros(n, np.uint32)
    return keys, counts, rn, ps, int(dropped)
