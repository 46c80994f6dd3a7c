"""ProbMinHash — per-read Probability-Jaccard signatures, TPU-dense.

Capability twin of ProbHash3aSketch
(/root/reference/src/sketching/setsketchert.rs:85-203): the reference builds a
per-read weighted histogram of hashed kmers and feeds it to the sequential
ProbMinHash3a of the probminhash crate.  ProbMinHash3a is an *algorithmic
speedup* of the defining sampler (Ertl 2019 / Moulton-Jiang): signature slot
s receives  argmin_x  E_s(x)  with  E_s(x) ~ Exp(weight(x))  drawn as a pure
function of (item x, slot s).  Any implementation of that sampler satisfies
P(sig_s^A == sig_s^B) = J_P(A, B) — the Probability Jaccard.

TPU-native two-phase design (instead of the crate's heap + xoshiro streams):

* light phase — Exp(1) = -ln(U) is monotone in U, so the per-slot argmin over
  weight-1 items is an integer argmax over a 32-bit hash H(x, s): pure VPU
  u32 ops, no transcendentals, ~12 ops per (position, slot) pair.  Items with
  weight >= 2 may safely participate too: with the SAME uniform U, their true
  draw E/w is <= their weight-1 draw E, so if such an item wins the light
  tournament the heavy phase (strictly smaller E) reclaims it — the merged
  argmin is exactly the defining sampler's.  Hence the light phase needs no
  masking at all, and duplicate occurrences (identical H) are harmless.
* heavy phase — the few distinct items with weight >= 2:
  E = -ln(U(x,s)) / w in f32 over a small compacted buffer, min-reduced and
  merged with the light winner by E value (U from the same 32-bit hash, so
  the two phases are consistent).

Signatures hold *item values* (the hashed kmer, Kmer::Val in the reference),
so downstream Jaccard estimation is slot-equality counting, identical in
spirit to compute_probminhash_jaccard (seqsketchjaccard.rs:58-108).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from ..ops.rng import splitmix64

U32 = jnp.uint32
U64 = jnp.uint64
F32 = jnp.float32

SENTINEL64 = np.uint64(0xFFFFFFFFFFFFFFFF)


def _slot_consts(m: int, seed: int):
    s = splitmix64(jnp.arange(m, dtype=np.uint64)
                   + np.uint64(seed) * np.uint64(0x9E3779B97F4A7C15))
    return (s >> U64(32)).astype(U32)


def _fold32(items):
    items = jnp.asarray(items)
    if items.dtype == jnp.uint64:
        return (items ^ (items >> U64(32))).astype(U32)
    return items.astype(U32)


def _hash32(items32, slotc):
    """H(x, s) uint32 — murmur-style 2-multiply mix, ~9 VPU ops."""
    c = U32
    h = items32[..., None] ^ slotc
    h = h * c(0x9E3779B1)
    h = h ^ (h >> c(15))
    h = h * c(0x85EBCA77)
    h = h ^ (h >> c(13))
    return h


def _neg_log_u24(h_u32):
    """-ln(uniform(0,1]) from the top 24 bits of a u32 hash, f32."""
    u = ((jnp.asarray(h_u32, U32) >> U32(8)).astype(F32) + F32(1.0)) * F32(2.0**-24)
    return -jnp.log(u)


def _compact_heavy(items, weights, heavy_mask, cap: int):
    """Scatter positions with heavy_mask to the front of a [n, cap] buffer
    (cumsum ranks — no sort).  Returns (items, weights, mask, overflow)."""
    n, P = items.shape
    rank = jnp.cumsum(heavy_mask.astype(jnp.int32), axis=1) - 1
    ok = heavy_mask & (rank < cap)
    idx = jnp.where(ok, rank, cap)
    row = jnp.arange(n, dtype=jnp.int32)[:, None]
    buf_i = jnp.zeros((n, cap + 1), items.dtype).at[row, idx].set(
        jnp.where(ok, items, 0), mode="drop")[:, :cap]
    buf_w = jnp.zeros((n, cap + 1), jnp.int32).at[row, idx].set(
        jnp.where(ok, weights, 0), mode="drop")[:, :cap]
    n_heavy = heavy_mask.sum(axis=1)
    mask = jnp.arange(cap)[None, :] < jnp.minimum(n_heavy, cap)[:, None]
    return buf_i, buf_w, mask, n_heavy > cap


def _merge_phases(items, valid, h_items, h_w, h_mask, m, seed):
    """Light tournament over all valid items + heavy E pass + merge."""
    slotc = _slot_consts(m, seed)
    it32 = _fold32(items)

    # light: per-slot argmax of H over positions (weight-1 optimum; heavy
    # items participating is safe — see module docstring)
    H = jnp.where(valid[..., None], _hash32(it32, slotc), U32(0))
    light_idx = jnp.argmax(H, axis=1)                       # [n, m]
    light_item = jnp.take_along_axis(jnp.asarray(items), light_idx, axis=1)
    light_best = jnp.take_along_axis(H, light_idx[:, None, :], axis=1)[:, 0, :]
    any_valid = valid.any(axis=1)
    light_E = jnp.where(any_valid[:, None], _neg_log_u24(light_best), jnp.inf)

    # heavy: exponentials over the compacted distinct heavy items
    Hh = _hash32(_fold32(h_items), slotc)                   # [n, cap, m]
    Eh = _neg_log_u24(Hh) / jnp.maximum(h_w, 1)[..., None].astype(F32)
    Eh = jnp.where(h_mask[..., None], Eh, jnp.inf)
    heavy_idx = jnp.argmin(Eh, axis=1)
    heavy_item = jnp.take_along_axis(jnp.asarray(h_items), heavy_idx, axis=1)
    heavy_E = jnp.take_along_axis(Eh, heavy_idx[:, None, :], axis=1)[:, 0, :]

    use_heavy = heavy_E < light_E
    sig = jnp.where(use_heavy, heavy_item.astype(U64), light_item.astype(U64))
    empty = ~any_valid
    return jnp.where(empty[:, None], U64(0), sig), empty


@functools.partial(jax.jit, static_argnames=("m", "heavy_cap", "seed"))
def probminhash_signatures(items, weights, m: int, heavy_cap: int = 0,
                           seed: int = 0):
    """Per-read ProbMinHash signatures from slot-aligned (item, weight) pairs.

    items:   uint64/uint32[n, P] — hashed kmer value per position (the fhash
             closure of the reference, datasketcher.rs:222-226).
    weights: int32[n, P] — multiplicity of the item within its read; 0 marks
             invalid/padding.  Duplicate occurrences may all carry the weight.
    m:       sketch size.
    heavy_cap: static buffer for weight>=2 positions (0 = P, always exact).
             On overflow the surplus heavy items degrade to weight 1
             (overflow flag returned).

    Returns (sig uint64[n, m], empty bool[n], overflow bool[n]).
    """
    items = jnp.asarray(items)
    weights = jnp.asarray(weights, jnp.int32)
    n, P = items.shape
    if heavy_cap <= 0 or heavy_cap > P:
        heavy_cap = P
    valid = weights > 0
    heavy = weights >= 2
    h_items, h_w, h_mask, overflow = _compact_heavy(items, weights, heavy,
                                                    heavy_cap)
    sig, empty = _merge_phases(items, valid, h_items, h_w, h_mask, m, seed)
    return sig, empty, overflow


@functools.partial(jax.jit, static_argnames=("m", "heavy_cap", "seed"))
def probminhash_from_items(items, valid, m: int, heavy_cap: int = 256,
                           seed: int = 0):
    """Fused fast path: multiplicities derived internally by one sort.

    items [n, P] (u32 or u64) with a valid mask; weights are the within-row
    multiplicities (the reference's per-read FnvHashMap histogram,
    setsketchert.rs:128-147).  One sort of the item row finds the distinct
    heavy items (run starts with run length >= 2) — the light tournament runs
    on the raw array, so no inverse permutation is ever needed.
    """
    items = jnp.asarray(items)
    n, P = items.shape
    wide = items.dtype == jnp.uint64
    sent = SENTINEL64 if wide else np.uint32(0xFFFFFFFF)
    keyed = jnp.where(valid, items, sent)
    s = jnp.sort(keyed, axis=1)
    is_real = s != sent
    new_run = jnp.concatenate(
        [jnp.ones((n, 1), bool), s[:, 1:] != s[:, :-1]], axis=1) & is_real
    # run length via segment-sum over flattened rows
    seg = jnp.cumsum(new_run.astype(jnp.int32), axis=1) - 1
    row_off = jnp.arange(n, dtype=jnp.int32)[:, None] * P
    flat_seg = jnp.where(is_real, seg + row_off, n * P - 1).ravel()
    counts = jax.ops.segment_sum(is_real.ravel().astype(jnp.int32), flat_seg,
                                 num_segments=n * P).reshape(n, P)
    run_count = jnp.take_along_axis(counts, seg, axis=1)
    heavy_start = new_run & (run_count >= 2)   # distinct heavy items only
    h_items, h_w, h_mask, overflow = _compact_heavy(
        s, run_count, heavy_start, heavy_cap)
    sig, empty = _merge_phases(items, valid, h_items, h_w, h_mask, m, seed)
    return sig, empty, overflow


def probjaccard_pair(sig_a, sig_b):
    """Fraction of equal slots — unbiased estimator of Probability Jaccard."""
    sig_a = jnp.asarray(sig_a)
    sig_b = jnp.asarray(sig_b)
    return (sig_a == sig_b).mean(axis=-1)


def probjaccard_one_vs_many(sig_a, sigs_b):
    """sig_a [m] vs sigs_b [n, m] -> [n] — twin of
    jaccard_index_probminhash3a's shape (seqsketchjaccard.rs:423-495)."""
    return probjaccard_pair(jnp.asarray(sigs_b), jnp.asarray(sig_a)[None, :])


def probjaccard_matrix(sigs):
    """All-pairs Probability-Jaccard estimate from signatures [n, m] -> [n, n].

    For large n prefer blockwise calls (see ann.py's tiled search).
    """
    s = jnp.asarray(sigs)
    return (s[:, None, :] == s[None, :, :]).mean(axis=-1)
