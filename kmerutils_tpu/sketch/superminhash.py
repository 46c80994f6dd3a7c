"""SuperMinHash (Ertl 2017) — per-read Jaccard signatures, TPU-dense.

Capability twin of SuperHashSketch / SuperHash2Sketch
(/root/reference/src/sketching/setsketchert.rs:211-336, 904-1046).  The
defining structure: for item d and slot j,

    h_j(d) = u_{d,j} + pi_d(j)

where u_{d,j} ~ U[0,1) and pi_d is a uniformly random permutation of
{0..m-1}, both pure functions of d; signature_j = min_d h_j(d).  The
permutation spreads each item's small values across slots, which cuts the
estimator variance vs m independent minhashes (Ertl's result).

The reference generates pi_d by incremental Fisher-Yates inside a sequential
loop.  Here pi_d(j) is a format-preserving 4-round Feistel permutation over
the next power-of-two domain with cycle-walking, keyed by d — fully
vectorized, deterministic per (d, j), uniform enough for the variance
benefit.  Cycle-walking is capped at 16 fixed rounds (P(residual out-of-range)
< 2^-16 per element; stragglers clamp to m-1 — deterministic, so estimator
consistency is unaffected).

Two signature flavors, as in the reference:
* ``superminhash``  — float32 signatures (SUPER; Sig=f32/f64 in the crate)
* ``superminhash2`` — uint64 signatures (SUPER2): same ordering on the exact
  integer key (pi << 32 | top32(u)), so no float ties at all.
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


def _small_perm(j, keys_u64, m: int):
    """Keyed pseudorandom permutation of [0, m): cycle-walked rounds of
    (xor key, odd multiply, xorshift-right) on the pow2 superdomain — each
    round step is bijective mod 2^nbits, so the composition is a permutation."""
    nbits = max((m - 1).bit_length(), 1)
    dom = 1 << nbits
    mask = np.uint64(dom - 1)

    def encrypt(x_u64, salt):
        k1 = splitmix64(keys_u64 ^ np.uint64(salt))
        x = (x_u64 ^ (k1 & mask)) & mask
        x = (x * U64(0x9E3779B97F4A7C15 | 1)) & mask   # odd multiplier
        x = (x ^ (x >> U64(max(nbits // 2, 1)))) & mask  # xorshift-right
        return x

    j = jnp.asarray(j, U64)
    x = j
    for r in range(3):
        x = encrypt(x, 0xA5A5 + r)
    # cycle-walk back into [0, m)
    for _ in range(16):
        out = x >= U64(m)
        x2 = x
        for r in range(3):
            x2 = encrypt(x2, 0xA5A5 + r)
        x = jnp.where(out, x2, x)
    x = jnp.minimum(x, U64(m - 1))
    return x.astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("m", "seed"))
def superminhash2(items, valid, m: int, seed: int = 0):
    """Integer-signature SuperMinHash (SUPER2): sig uint64[n, m].

    items uint64[n, P], valid bool[n, P].
    """
    items = jnp.asarray(items, U64)
    n, P = items.shape
    key = splitmix64(items ^ np.uint64(seed))
    j = jnp.arange(m, dtype=np.uint64)[None, None, :]
    pi = _small_perm(jnp.broadcast_to(j, (n, P, m)), key[..., None], m)
    u32 = (mix2_64(items[..., None], j + np.uint64(seed) * np.uint64(0x632BE59B))
           >> U64(32)).astype(U64)
    hkey = (pi.astype(U64) << U64(32)) | u32
    hkey = jnp.where(valid[..., None], hkey, U64(0xFFFFFFFFFFFFFFFF))
    sig = jnp.min(hkey, axis=1)
    empty = ~valid.any(axis=1)
    return jnp.where(empty[:, None], U64(0xFFFFFFFFFFFFFFFF), sig), empty


@functools.partial(jax.jit, static_argnames=("m", "seed"))
def superminhash(items, valid, m: int, seed: int = 0):
    """Float-signature SuperMinHash (SUPER): sig float32[n, m] in [0, m)."""
    sig2, empty = superminhash2(items, valid, m, seed)
    pi = (sig2 >> U64(32)).astype(F32)
    u = (sig2 & U64(0xFFFFFFFF)).astype(F32) * F32(2.0**-32)
    sig = pi + u
    return jnp.where(empty[:, None], jnp.inf, sig), empty


def superminhash_jaccard(sig_a, sig_b):
    """Fraction of equal slots — SuperMinHash's Jaccard estimator."""
    return (jnp.asarray(sig_a) == jnp.asarray(sig_b)).mean(axis=-1)
