"""Exact k-mer counting via sort + segment reduction.

Capability twin of the reference counting runtime
(/root/reference/src/base/kmercount.rs): KmerCounter (cuckoo + counting-bloom,
:70-288), KmerFilter1 unicity tracking (:985-1123) and the dump drivers.  The
reference's data structures are pointer-chasing filters probed once per kmer —
a shape TPUs cannot express.  The TPU-native replacement is:

    canonical kmers (+ coords)  →  radix-friendly sort  →  run boundaries
    →  per-run counts (segment reduction)

which yields *exact* counts, the unique/multiple split (count==1 vs >=2), and
unique-kmer coordinates, all as fixed-shape device tensors.  The reference's
counts are approximate by design (bloom fpr 0.03, kmercount.rs:1292: dumps hold
an "approximate count"); exact counting is a strict upgrade that agrees
bit-for-bit wherever the reference's filters did not collide.

Shapes are static: outputs are padded to the input slot count with a
``n_unique`` scalar; invalid / padding slots carry the sentinel key 2^64-1.
"""

from __future__ import annotations

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from ..base.sequence import ReadBatch
from ..base import kmer as kmer_mod

U32 = jnp.uint32
U64 = jnp.uint64
SENTINEL64 = np.uint64(0xFFFFFFFFFFFFFFFF)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class KmerCounts:
    """Sorted distinct kmers with exact counts (padded, static shape).

    keys:     uint64[N] — distinct canonical kmer values, ascending; padding
              slots hold SENTINEL64.
    counts:   int32[N]  — multiplicity per distinct kmer (0 on padding).
    n_unique: int32     — number of distinct kmers with count == 1.
    n_distinct: int32   — number of distinct kmers.
    """

    keys: jax.Array
    counts: jax.Array
    n_distinct: jax.Array
    n_unique: jax.Array


def _flatten_valid(kmers, valid):
    flat = jnp.ravel(kmers).astype(U64)
    v = jnp.ravel(valid)
    return jnp.where(v, flat, SENTINEL64)


def count_from_values(values_u64):
    """Exact counts of a 1-D uint64 key array (SENTINEL64 = ignore).

    Returns a :class:`KmerCounts` whose arrays have the input length.
    """
    s = jnp.sort(values_u64)
    n = s.shape[0]
    is_real = s != SENTINEL64
    new_run = jnp.concatenate([jnp.ones((1,), bool), s[1:] != s[:-1]]) & is_real
    # segment id per element (run index); padding all lands in one trailing run
    seg = jnp.cumsum(new_run.astype(jnp.int32)) - 1
    seg = jnp.where(is_real, seg, n - 1)
    counts = jax.ops.segment_sum(is_real.astype(jnp.int32), seg, num_segments=n)
    # distinct keys compacted to the front
    run_starts = jnp.nonzero(new_run, size=n, fill_value=n - 1)[0]
    keys = jnp.where(jnp.arange(n) < new_run.sum(), s[run_starts], SENTINEL64)
    n_distinct = new_run.sum().astype(jnp.int32)
    counts = jnp.where(jnp.arange(n) < n_distinct, counts, 0)
    n_unique = (counts == 1).sum().astype(jnp.int32)
    return KmerCounts(keys=keys, counts=counts,
                      n_distinct=n_distinct, n_unique=n_unique)


def count_batch(batch: ReadBatch, k: int) -> KmerCounts:
    """Canonical-kmer exact counting of a read batch — the pipeline behind
    `parsefastq kmer --count` (kmercount.rs:881-974) as one fused jit graph."""
    can, valid, _ = kmer_mod.canonical_kmers(batch, k)
    return count_from_values(_flatten_valid(can, valid))


def count_batch_detailed(batch: ReadBatch, k: int, read_num_offset: int = 0):
    """Exact counts plus the FIRST-OCCURRENCE coordinate of every distinct
    canonical kmer (generation order: read-major, position-minor).

    Returns (keys u64[N], counts i32[N], first_read u32[N], first_pos u32[N],
    n_distinct) with distinct kmers compacted to the front in ascending key
    order; padding keys are SENTINEL64.

    The first-occurrence coordinates reproduce the reference's dump ordering
    (its dumps regenerate kmers in scan order and emit each on first sight,
    kmercount.rs:186-224, 1060-1079).
    """
    can, valid, _ = kmer_mod.canonical_kmers(batch, k)
    read_num, pos = kmer_mod.kmer_coordinates(batch, k, read_num_offset)
    keys = _flatten_valid(can, valid)
    rn = jnp.ravel(read_num)
    ps = jnp.ravel(pos)
    # stable sort: within a run of equal keys, flat (scan) order is preserved,
    # so each run's first element is the kmer's first occurrence
    order = jnp.argsort(keys, stable=True)
    s, rn, ps = keys[order], rn[order], ps[order]
    n = s.shape[0]
    is_real = s != SENTINEL64
    new_run = jnp.concatenate([jnp.ones((1,), bool), s[1:] != s[:-1]]) & is_real
    seg = jnp.cumsum(new_run.astype(jnp.int32)) - 1
    seg = jnp.where(is_real, seg, n - 1)
    counts = jax.ops.segment_sum(is_real.astype(jnp.int32), seg, num_segments=n)
    run_starts = jnp.nonzero(new_run, size=n, fill_value=n - 1)[0]
    n_distinct = new_run.sum().astype(jnp.int32)
    live = jnp.arange(n) < n_distinct
    out_keys = jnp.where(live, s[run_starts], SENTINEL64)
    out_counts = jnp.where(live, counts, 0)
    out_rn = jnp.where(live, rn[run_starts], 0).astype(U32)
    out_ps = jnp.where(live, ps[run_starts], 0).astype(U32)
    return out_keys, out_counts, out_rn, out_ps, n_distinct


def unique_kmer_coords(batch: ReadBatch, k: int, read_num_offset: int = 0):
    """Unique (count==1) canonical kmers with their coordinates.

    Twin of KmerFilter1 + its coordinate dump (kmercount.rs:985-1123): returns
    (keys u64[N], read_num u32[N], pos u32[N], n_unique) sorted by kmer value,
    padding keyed SENTINEL64.  The coordinate reported for a unique kmer is its
    single occurrence.
    """
    keys, counts, rn, ps, n_distinct = count_batch_detailed(
        batch, k, read_num_offset)
    n = keys.shape[0]
    is_unique = (counts == 1) & (jnp.arange(n) < n_distinct)
    n_uniq = is_unique.sum().astype(jnp.int32)
    idx = jnp.nonzero(is_unique, size=n, fill_value=n - 1)[0]
    live = jnp.arange(n) < n_uniq
    out_keys = jnp.where(live, keys[idx], SENTINEL64)
    out_rn = jnp.where(live, rn[idx], 0)
    out_ps = jnp.where(live, ps[idx], 0)
    return out_keys, out_rn, out_ps, n_uniq


def multiplicity_from_values(values, valid):
    """Within-row multiplicity of every value.

    values [n, P] (any uint), valid bool[n, P] -> int32[n, P] where slot p
    holds the number of occurrences of values[i, p] within row i (0 when
    invalid).  This is the per-row weighted histogram the probminhash
    sketchers consume (setsketchert.rs:128-147), kept in slot-aligned form.
    """
    can = jnp.asarray(values)
    n, P = can.shape
    keys = jnp.where(valid, can.astype(U64), SENTINEL64)
    # argsort once; run lengths in sorted order come from two associative
    # scans (run start via cummax, next-run start via reverse cummin) — no
    # segment-sum; one inverse gather maps the counts back to original slots
    order = jnp.argsort(keys, axis=1)
    s = jnp.take_along_axis(keys, order, axis=1)
    is_real = s != SENTINEL64
    new_run = jnp.concatenate(
        [jnp.ones((n, 1), bool), s[:, 1:] != s[:, :-1]], axis=1) & is_real
    idx = jnp.broadcast_to(jnp.arange(P, dtype=jnp.int32)[None, :], (n, P))
    start = jax.lax.cummax(jnp.where(new_run, idx, -1), axis=1)
    nxt = jnp.where(new_run | ~is_real, idx, P)
    rev_min = jax.lax.cummin(nxt[:, ::-1], axis=1)[:, ::-1]
    next_start = jnp.concatenate(
        [rev_min[:, 1:], jnp.full((n, 1), P, jnp.int32)], axis=1)
    run_counts = next_start - start
    per_slot = jnp.zeros((n, P), jnp.int32).at[
        jnp.arange(n, dtype=jnp.int32)[:, None], order].set(run_counts)
    return jnp.where(valid, per_slot, 0)


def multiplicity_per_slot(batch: ReadBatch, k: int):
    """Per-read multiplicity of the canonical kmer at every position."""
    can, valid, _ = kmer_mod.canonical_kmers(batch, k)
    return multiplicity_from_values(can, valid), valid


# ---------------------------------------------------------------------------
# host-side merge across device batches (streaming files larger than HBM)
# ---------------------------------------------------------------------------

def merge_counts_host(parts):
    """Merge KmerCounts from several batches on host.

    parts: iterable of (keys u64 ndarray, counts ndarray) already compacted
    (no sentinel).  Returns (keys, counts) sorted ascending.
    """
    all_keys = np.concatenate([np.asarray(p[0]) for p in parts])
    all_counts = np.concatenate([np.asarray(p[1]) for p in parts])
    order = np.argsort(all_keys, kind="stable")
    ks, cs = all_keys[order], all_counts[order]
    if ks.size == 0:
        return ks, cs
    boundary = np.concatenate([[True], ks[1:] != ks[:-1]])
    out_keys = ks[boundary]
    seg = np.cumsum(boundary) - 1
    out_counts = np.zeros(out_keys.size, dtype=np.int64)
    np.add.at(out_counts, seg, cs)
    return out_keys, out_counts


def compact(kc: KmerCounts):
    """Strip padding on host; returns numpy (keys, counts)."""
    nd = int(kc.n_distinct)
    return np.asarray(kc.keys)[:nd], np.asarray(kc.counts)[:nd]
