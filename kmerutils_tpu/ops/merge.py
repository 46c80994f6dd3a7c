"""Payload-carrying bitonic merge of two sorted arrays.

Merging two individually sorted arrays with ``jax.lax.sort`` costs a full
O(n log^2 n) comparator network; the bitonic MERGE network is O(n log n):
form the bitonic sequence [A ascending | sentinel pad | B descending] and
run log2(n) half-cleaner stages, each ONE reshaped elementwise
compare-and-swap — no scatter, no gather.

This is the device-side primitive behind streaming count-table folds
(count/exact.py): the table is kept sorted, each batch's records arrive
sorted, and the fold becomes a merge instead of a re-sort of
capacity + batch elements.

Keys order ascending; an optional secondary key orders ties (the (key,
coord) ordering the count table uses for first-occurrence coordinates).
All-ones sentinels sort to the end like any other value.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def _next_pow2(n: int) -> int:
    return 1 << max(int(n - 1).bit_length(), 0)


def merge_sorted(keys_a, keys_b, payloads_a=(), payloads_b=(),
                 secondary_a=None, secondary_b=None):
    """Merge sorted (keys_a, *payloads) with sorted (keys_b, *payloads).

    keys_*: 1-D ascending (pad with the dtype's max sentinel).
    secondary_*: optional same-length arrays ordering equal keys (ties
    resolve to the smaller secondary — the 2-key sort rule).
    payloads_*: tuples of 1-D arrays riding along.

    Returns (keys, secondary, payloads) of length next_pow2(len_a + len_b),
    fully sorted ascending by (key, secondary); the pow2 padding carries
    sentinel keys at the end.
    """
    keys_a = jnp.asarray(keys_a)
    keys_b = jnp.asarray(keys_b)
    dt = keys_a.dtype
    sent = np.array(np.iinfo(np.dtype(dt)).max, np.dtype(dt))
    na, nb = keys_a.shape[0], keys_b.shape[0]
    T = _next_pow2(na + nb)
    pad = T - na - nb

    two_key = secondary_a is not None
    if two_key:
        secondary_a = jnp.asarray(secondary_a)
        secondary_b = jnp.asarray(secondary_b)
        sdt = secondary_a.dtype
        ssent = np.array(np.iinfo(np.dtype(sdt)).max, np.dtype(sdt))

    # 2-D working layout [R, W]: every stage is a ROLL-based compare-exchange
    # (partner of flat index i at stride s is i XOR s, materialized with two
    # rotations) — reshapes to tiny trailing dims would cost up to 64x in
    # TPU tile padding and OOM at capacity sizes.
    W = min(T, 2048)
    R = T // W

    def build(a, b, fill):
        # [A ascending | fill pad | B descending] — bitonic (<= one peak)
        mid = jnp.full((pad,), fill, a.dtype) if pad else a[:0]
        return jnp.concatenate([a, mid, b[::-1]]).reshape(R, W)

    keys = build(keys_a, keys_b, sent)
    sec = build(secondary_a, secondary_b, ssent) if two_key else None
    pls = [build(jnp.asarray(pa), jnp.asarray(pb),
                 np.zeros((), jnp.asarray(pa).dtype))
           for pa, pb in zip(payloads_a, payloads_b)]

    col = jnp.arange(W, dtype=jnp.int32)[None, :]
    row = jnp.arange(R, dtype=jnp.int32)[:, None]

    s = T // 2
    while s >= 1:
        if s >= W:
            axis, amt = 0, s // W
            high = (row // (s // W)) % 2 == 1
        else:
            axis, amt = 1, s
            high = (col // s) % 2 == 1

        def partner(x):
            # block-aligned strides never cross the array edge for the side
            # that uses each roll, so the wraparound values are never taken
            return jnp.where(high, jnp.roll(x, amt, axis=axis),
                             jnp.roll(x, -amt, axis=axis))

        pk = partner(keys)
        if two_key:
            ps = partner(sec)
            a_gt_b = (keys > pk) | ((keys == pk) & (sec > ps))
            b_gt_a = (pk > keys) | ((pk == keys) & (ps > sec))
        else:
            a_gt_b = keys > pk
            b_gt_a = pk > keys
        # low position keeps the pair minimum, high keeps the maximum; on a
        # full tie both keep their own element (consistent, payload-safe)
        take = jnp.where(high, b_gt_a, a_gt_b)

        keys = jnp.where(take, pk, keys)
        if two_key:
            sec = jnp.where(take, ps, sec)
        pls = [jnp.where(take, partner(p), p) for p in pls]
        s //= 2

    flat = lambda x: x.reshape(T)  # noqa: E731
    return (flat(keys), flat(sec) if two_key else None,
            tuple(flat(p) for p in pls))
