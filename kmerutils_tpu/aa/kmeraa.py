"""Amino-acid sequences and k-mers, batched.

Capability twin of SequenceAA / KmerAA32bit / KmerAA64bit and their
generators (/root/reference/src/aautils/kmeraa.rs:147-900): 5 bits per
residue, k <= 6 in u32 / k <= 12 in u64, no reverse complement (the
reference's KmerAA::reverse_complement panics, kmeraa.rs:185-187 — AA kmers
are used as-is).

The sketching layer (sketch_aa) mirrors SeqSketcherAAT
(/root/reference/src/aautils/setsketchert.rs): every DNA sketcher works
unchanged on AA items since sketchers only see hashed u64 item streams.
"""

from __future__ import annotations

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from . import alphabet
from ..ops.rng import wang_hash32, wang_hash64
from ..sketch import probminhash, superminhash, densminhash, setsketch
from ..sketch.params import SeqSketcherParams, SketchAlgo
from ..sketch.setsketch import SetSketchParams

U64 = jnp.uint64

NB_BITS = 5


class SequenceAA:
    """Host-side AA sequence (stored raw like the reference's SequenceAA,
    kmeraa.rs:404-484, with validity filtering)."""

    __slots__ = ("raw",)

    def __init__(self, s: bytes | str, filtered: bool = False):
        if isinstance(s, str):
            s = s.encode()
        raw = np.frombuffer(bytes(s), dtype=np.uint8)
        valid = alphabet.is_valid_aa(raw)
        if filtered:
            raw = raw[valid]
        elif not valid.all():
            raise ValueError("invalid amino acid in sequence")
        self.raw = raw

    def __len__(self):
        return self.raw.size

    def __str__(self):
        return self.raw.tobytes().decode()


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class AABatch:
    """Batched AA reads: 5-bit codes as uint8 (device), padding = 0."""

    codes: jax.Array    # uint8[n, L]
    lengths: jax.Array  # int32[n]

    @property
    def n_reads(self):
        return self.codes.shape[0]


def pack_aa_reads(seqs) -> AABatch:
    arrs = []
    for s in seqs:
        if isinstance(s, SequenceAA):
            a = alphabet.encode_aa(s.raw)
        else:
            if isinstance(s, str):
                s = s.encode()
            a = alphabet.encode_aa(np.frombuffer(bytes(s), dtype=np.uint8))
            if (a == 0xFF).any():
                raise ValueError("invalid amino acid; filter first")
        arrs.append(a)
    n = len(arrs)
    L = max((a.size for a in arrs), default=1)
    codes = np.zeros((n, L), dtype=np.uint8)
    lengths = np.zeros(n, dtype=np.int32)
    for i, a in enumerate(arrs):
        codes[i, : a.size] = a
        lengths[i] = a.size
    return AABatch(codes=jnp.asarray(codes), lengths=jnp.asarray(lengths))


def kmers_aa(batch: AABatch, k: int):
    """All AA k-mers as uint64 (5 bits/residue, first residue in the high
    bits — matching KmerAA::push semantics, kmeraa.rs:171-182).

    Returns (kmers u64[n, P], valid bool[n, P]).
    """
    if not 1 <= k <= 12:
        raise ValueError("AA kmers support k <= 12 (u64, 5 bits/residue)")
    codes = batch.codes
    n, L = codes.shape
    P = max(L - k + 1, 1)
    acc = jnp.zeros((n, P), U64)
    for i in range(k):
        acc = (acc << U64(NB_BITS)) | jax.lax.slice_in_dim(
            codes, i, i + P, axis=1).astype(U64)
    pos = jnp.arange(P, dtype=jnp.int32)[None, :]
    valid = pos + k <= batch.lengths[:, None]
    return acc, valid


def kmer_value_from_str(s: str) -> int:
    v = 0
    for c in alphabet.encode_aa(np.frombuffer(s.encode(), dtype=np.uint8)):
        if c == 0xFF:
            raise ValueError("invalid AA")
        v = (v << NB_BITS) | int(c)
    return v


def hashed_kmers_aa(batch: AABatch, k: int, hash_name: str = "wang"):
    """AA kmers through fhash — NO canonicalization (no revcomp for AA)."""
    km, valid = kmers_aa(batch, k)
    if hash_name == "wang":
        if k <= 6:
            items = wang_hash32(km.astype(jnp.uint32))
        else:
            items = wang_hash64(km)
    elif hash_name == "identity":
        items = km
    else:
        raise ValueError(f"unknown hash {hash_name}")
    return items, valid


@dataclasses.dataclass(frozen=True)
class SketcherAA:
    """AA twin of sketch.jaccard.Sketcher (SeqSketcherAAT role)."""

    params: SeqSketcherParams
    hash_name: str = "wang"
    seed: int = 0
    setsketch_params: SetSketchParams | None = None

    def sketch_batch(self, batch: AABatch):
        k, m = self.params.kmer_size, self.params.sketch_size
        algo = self.params.algo
        items, valid = hashed_kmers_aa(batch, k, self.hash_name)
        if algo == SketchAlgo.PROB3A:
            return probminhash.probminhash_from_items(
                items, valid, m, heavy_cap=min(256, items.shape[1]),
                seed=self.seed)[0]
        if algo == SketchAlgo.SUPER:
            return superminhash.superminhash(items, valid, m, self.seed)[0]
        if algo == SketchAlgo.SUPER2:
            return superminhash.superminhash2(items, valid, m, self.seed)[0]
        if algo == SketchAlgo.OPTDENS:
            return densminhash.optdens_signatures(items, valid, m, self.seed)[0]
        if algo == SketchAlgo.REVOPTDENS:
            return densminhash.revoptdens_signatures(items, valid, m, self.seed)[0]
        if algo == SketchAlgo.HLL:
            sp = self.setsketch_params or SetSketchParams(m=m)
            return setsketch.setsketch_signatures(items, valid, sp, self.seed)
        raise ValueError(f"unhandled algo {algo}")

    def sketch_collection(self, batch: AABatch):
        """One signature for ALL sequences together — the AA twin of the
        DNA whole-collection sketcher (sketch_compressedkmer_seqs,
        /root/reference/src/aautils/setsketchert.rs:743-1017).

        For HLL this is the mergeable-register path: the reference sketches
        balanced blocks in parallel threads and merges SetSketch registers
        (:840-888); here per-sequence registers are computed batched and
        max-merged — across a device mesh the same merge is a jax.lax.pmax
        (parallel/collective.sharded_setsketch_collection).
        """
        k, m = self.params.kmer_size, self.params.sketch_size
        algo = self.params.algo
        if algo == SketchAlgo.HLL:
            regs = self.sketch_batch(batch)
            return jnp.max(regs, axis=0)
        from ..count import exact
        items, valid = hashed_kmers_aa(batch, k, self.hash_name)
        flat = items.reshape(1, -1)
        fvalid = valid.reshape(1, -1)
        if algo == SketchAlgo.PROB3A:
            kc = exact.count_from_values(
                jnp.where(fvalid[0], flat[0].astype(jnp.uint64),
                          exact.SENTINEL64))
            weights = jnp.where(kc.keys != exact.SENTINEL64, kc.counts, 0)
            sig, _, _ = probminhash.probminhash_signatures(
                kc.keys[None, :], weights[None, :], m, seed=self.seed)
            return sig[0]
        if algo == SketchAlgo.SUPER:
            return superminhash.superminhash(flat, fvalid, m, self.seed)[0][0]
        if algo == SketchAlgo.SUPER2:
            return superminhash.superminhash2(flat, fvalid, m,
                                              self.seed)[0][0]
        if algo == SketchAlgo.OPTDENS:
            return densminhash.optdens_signatures(flat, fvalid, m,
                                                  self.seed)[0][0]
        if algo == SketchAlgo.REVOPTDENS:
            return densminhash.revoptdens_signatures(flat, fvalid, m,
                                                     self.seed)[0][0]
        raise ValueError(f"unhandled algo {algo}")

    def jaccard(self, sig_a, sig_b):
        if self.params.algo == SketchAlgo.HLL:
            sp = self.setsketch_params or SetSketchParams(m=self.params.sketch_size)
            return setsketch.jaccard(sig_a, sig_b, sp)
        return (jnp.asarray(sig_a) == jnp.asarray(sig_b)).mean(axis=-1)
