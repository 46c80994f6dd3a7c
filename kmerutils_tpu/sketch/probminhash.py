"""ProbMinHash — per-read Probability-Jaccard signatures, TPU-dense.

Capability twin of ProbHash3aSketch
(/root/reference/src/sketching/setsketchert.rs:85-203): the reference builds a
per-read weighted histogram of hashed kmers and feeds it to the sequential
ProbMinHash3a of the probminhash crate.  ProbMinHash3a is an *algorithmic
speedup* of the defining sampler (Ertl 2019 / Moulton-Jiang): signature slot
s receives  argmin_x  E_s(x)  with  E_s(x) ~ Exp(weight(x))  drawn as a pure
function of (item x, slot s).  Any implementation of that sampler yields
P(sig_s^A == sig_s^B) = J_P(A, B) — the Probability Jaccard.

TPU-native two-phase design (instead of the crate's heap + xoshiro streams):

* light phase — items with weight 1 (the overwhelming majority of kmers in a
  read): Exp(1) = -ln(U) is monotone in U, so argmin E == argmax H where H is
  the raw 64-bit hash of (item, slot).  A pure integer max-reduction over the
  [positions × slots] grid: no transcendentals, exact ties-by-bits.
* heavy phase — items with weight >= 2, compacted per read into a small
  buffer: E = -ln(U(x,s)) / w computed in f32, min-reduced, then merged with
  the light winner via E comparison.  U comes from the same per-(item, slot)
  hash, so the combined sampler is exactly the defining one.

Signatures hold *item values* (the hashed kmer, Kmer::Val in the reference),
so downstream Jaccard estimation is slot-equality counting, identical in
spirit to compute_probminhash_jaccard (seqsketchjaccard.rs:58-108).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from ..ops.rng import splitmix64, mix2_64

U32 = jnp.uint32
U64 = jnp.uint64
F32 = jnp.float32

_SALT = np.uint64(0x9E3779B97F4A7C15)


def _slot_hash(items_u64, m: int, seed: int):
    """H(x, s) uint64 for every item (last axis broadcast over m slots)."""
    s = jnp.arange(m, dtype=np.uint64) + np.uint64(seed) * _SALT
    return mix2_64(items_u64[..., None], s)


def _neg_log_u24(h_u64):
    """-ln(uniform(0,1]) from the top bits of a u64 hash, f32."""
    u = ((h_u64 >> U64(40)).astype(F32) + F32(1.0)) * F32(2.0**-24)
    return -jnp.log(u)


@functools.partial(jax.jit, static_argnames=("m", "heavy_cap", "seed"))
def probminhash_signatures(items, weights, m: int, heavy_cap: int = 0,
                           seed: int = 0):
    """Per-read ProbMinHash signatures.

    items:   uint64[n, P] — hashed kmer value per position (any salt/hash the
             caller chose, e.g. wang_hash of the canonical kmer — the fhash
             closure of the reference, datasketcher.rs:222-226).
    weights: int32[n, P]  — multiplicity of that item in its read; 0 marks an
             invalid/padding slot.  (Duplicate occurrences of an item may all
             carry the weight; they produce identical draws, so the min is
             unaffected.)
    m:       sketch size.
    heavy_cap: static buffer size for weight>=2 items per read; 0 = P (always
             exact).  If a read has more heavy items than heavy_cap the excess
             is handled in the light phase at weight 1 (overflow flag returned).

    Returns (sig uint64[n, m], empty bool[n], overflow bool[n]).
    """
    items = jnp.asarray(items, U64)
    weights = jnp.asarray(weights, jnp.int32)
    n, P = items.shape
    if heavy_cap <= 0 or heavy_cap > P:
        heavy_cap = P

    valid = weights > 0
    light = valid & (weights == 1)
    heavy = valid & (weights >= 2)

    # ---- heavy compaction: bring heavy positions to the front, keep first cap
    order = jnp.argsort(~heavy, axis=1, stable=True)[:, :heavy_cap]
    h_items = jnp.take_along_axis(items, order, axis=1)
    h_w = jnp.take_along_axis(weights, order, axis=1)
    h_mask = jnp.take_along_axis(heavy, order, axis=1)
    n_heavy = heavy.sum(axis=1)
    overflow = n_heavy > heavy_cap

    # light participants = weight-1 items, plus heavy items NOT in the
    # compacted buffer (overflow degrades them to weight 1 instead of
    # dropping them)
    in_buffer = jnp.zeros((n, P), bool).at[
        jnp.arange(n)[:, None], order].set(h_mask)
    light = valid & ((weights == 1) | (heavy & ~in_buffer))

    # ---- light phase: integer max tournament over positions, per slot
    H = _slot_hash(items, m, seed)                      # [n, P, m]
    Hl = jnp.where(light[..., None], H, U64(0))
    light_best = jnp.max(Hl, axis=1)                    # [n, m]
    light_idx = jnp.argmax(Hl, axis=1)                  # [n, m]
    light_item = jnp.take_along_axis(items, light_idx, axis=1)
    any_light = light.any(axis=1)
    light_E = jnp.where(any_light[:, None], _neg_log_u24(light_best), jnp.inf)

    # ---- heavy phase: f32 exponentials on the compacted buffer
    Hh = _slot_hash(h_items, m, seed)                   # [n, cap, m]
    Eh = _neg_log_u24(Hh) / jnp.maximum(h_w, 1)[..., None].astype(F32)
    Eh = jnp.where(h_mask[..., None], Eh, jnp.inf)
    heavy_E = jnp.min(Eh, axis=1)                       # [n, m]
    heavy_idx = jnp.argmin(Eh, axis=1)
    heavy_item = jnp.take_along_axis(h_items, heavy_idx, axis=1)

    use_heavy = heavy_E < light_E
    sig = jnp.where(use_heavy, heavy_item, light_item)
    empty = ~valid.any(axis=1)
    sig = jnp.where(empty[:, None], U64(0), sig)
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

    Expressed as a one-hot-free comparison matmul-style broadcast; for large n
    prefer blockwise calls.
    """
    s = jnp.asarray(sigs)
    return (s[:, None, :] == s[None, :, :]).mean(axis=-1)
