"""Host-side GOLDEN ProbMinHash3 — Ertl's published sequential algorithm.

PARITY.md's standing deviation is that TPU signatures are
estimator-equivalent to the reference's, not bit-identical: the reference
consumes the external ``probminhash`` crate (not in the snapshot, no Rust
toolchain here), whose RNG-consumption order is inherently sequential.  To
QUANTIFY the equivalence instead of merely arguing it, this module
implements ProbMinHash3 exactly as published (O. Ertl, "ProbMinHash — A
Class of Locality-Sensitive Hash Algorithms for the (Probability) Jaccard
Similarity", IEEE TKDE 2020, Algorithm 3 — the same algorithm family the
crate implements for the reference's ProbHash3aSketch,
/root/reference/src/sketching/setsketchert.rs:85-203; 3a is an
early-termination optimization with the identical output distribution):

  per item d of weight w: a dedicated RNG seeded from d; the j-th smallest
  of m iid Exp(w) arrival times generated incrementally
  (t_j = t_{j-1} + Exp((m-j) * w), 0-indexed), each assigned to a
  uniformly-random not-yet-visited slot via an inline Fisher-Yates step;
  slot s keeps the item with the smallest arrival time.  Iteration stops
  once t exceeds the current worst slot.

RNG: xoshiro256** (Blackman-Vigna, public domain), seeded from
splitmix64(item ^ golden_seed) exactly as the crate family seeds per-item
streams.  Exponential draws are -ln(u) / rate with u drawn as the standard
53-bit double in (0,1].

This is NOT a performance path — it exists so tests can measure the
slot-collision statistics of the TPU sampler against a faithful
implementation of the published algorithm (PARITY.md §3 carries the
numbers).
"""

from __future__ import annotations

import math

import numpy as np

_MASK64 = (1 << 64) - 1


def _splitmix64(x: int):
    x = (x + 0x9E3779B97F4A7C15) & _MASK64
    z = x
    z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & _MASK64
    z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & _MASK64
    return x, z ^ (z >> 31)


class Xoshiro256ss:
    """xoshiro256** — the crate family's stream generator."""

    def __init__(self, seed: int):
        s = seed & _MASK64
        st = []
        for _ in range(4):
            s, v = _splitmix64(s)
            st.append(v)
        self.s = st

    @staticmethod
    def _rotl(x, k):
        return ((x << k) | (x >> (64 - k))) & _MASK64

    def next_u64(self) -> int:
        s = self.s
        result = (self._rotl((s[1] * 5) & _MASK64, 7) * 9) & _MASK64
        t = (s[1] << 17) & _MASK64
        s[2] ^= s[0]
        s[3] ^= s[1]
        s[1] ^= s[2]
        s[0] ^= s[3]
        s[2] ^= t
        s[3] = self._rotl(s[3], 45)
        return result

    def uniform(self) -> float:
        """Standard 53-bit double in (0, 1]."""
        return ((self.next_u64() >> 11) + 1) * (2.0 ** -53)

    def below(self, n: int) -> int:
        """Unbiased uniform integer in [0, n) (rejection on the top range)."""
        lim = _MASK64 - (_MASK64 + 1) % n
        while True:
            v = self.next_u64()
            if v <= lim:
                return v % n


def probminhash3_golden(items, weights, m: int, seed: int = 0):
    """Signature of a weighted set by the published sequential algorithm.

    items: iterable of int hash values; weights: positive floats/ints.
    Returns uint64[m] (slot -> winning item value).
    """
    sig_t = np.full(m, np.inf)
    sig_v = np.zeros(m, dtype=np.uint64)
    for d, w in zip(items, weights):
        d = int(d)
        w = float(w)
        rng = Xoshiro256ss(d ^ (seed * 0x9E3779B97F4A7C15 & _MASK64))
        perm = list(range(m))
        t = 0.0
        worst = sig_t.max()
        for j in range(m):
            rate = w * (m - j)
            t += -math.log(rng.uniform()) / rate
            if t >= worst:
                break
            r = j + rng.below(m - j) if m - j > 1 else j
            perm[j], perm[r] = perm[r], perm[j]
            s = perm[j]
            if t < sig_t[s]:
                sig_t[s] = t
                sig_v[s] = d
                worst = sig_t.max()
    return sig_v


def probjaccard_exact(wa: dict, wb: dict) -> float:
    """Exact Probability Jaccard J_P of two weighted sets:
    J_P = sum_d 1 / sum_e max(w_e^A / w_d^A, w_e^B / w_d^B) over the union
    (Moulton-Jiang; the quantity every ProbMinHash estimates)."""
    union = set(wa) | set(wb)
    total = 0.0
    for d in union:
        da, db = wa.get(d, 0.0), wb.get(d, 0.0)
        if da == 0.0 or db == 0.0:
            continue
        denom = 0.0
        for e in union:
            denom += max(wa.get(e, 0.0) / da, wb.get(e, 0.0) / db)
        total += 1.0 / denom
    return total
