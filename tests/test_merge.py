"""Bitonic merge (ops/merge.py): equality with lax.sort of the
concatenation, payload carriage, sentinel padding, two-key tie ordering."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from kmerutils_tpu.ops.merge import merge_sorted

SENT64 = np.uint64(0xFFFFFFFFFFFFFFFF)


class TestMergeSorted:
    @pytest.mark.parametrize("na,nb", [(1000, 1000), (513, 2000), (1, 7),
                                       (4096, 4096)])
    def test_matches_sort(self, rng, na, nb):
        a = np.sort(rng.integers(0, 1 << 60, size=na, dtype=np.uint64))
        b = np.sort(rng.integers(0, 1 << 60, size=nb, dtype=np.uint64))
        oa = rng.integers(0, 1 << 60, size=na, dtype=np.uint64)
        ob = rng.integers(0, 1 << 60, size=nb, dtype=np.uint64)
        ca = rng.integers(1, 100, size=na).astype(np.int32)
        cb = rng.integers(1, 100, size=nb).astype(np.int32)
        keys, sec, (cnt,) = merge_sorted(a, b, (ca,), (cb,),
                                         secondary_a=oa, secondary_b=ob)
        # oracle: 2-key sort of the concatenation (keys unique w.h.p. so the
        # count payload is determined)
        ks, ss, cs = jax.lax.sort(
            (jnp.concatenate([jnp.asarray(a), jnp.asarray(b)]),
             jnp.concatenate([jnp.asarray(oa), jnp.asarray(ob)]),
             jnp.concatenate([jnp.asarray(ca), jnp.asarray(cb)])),
            num_keys=2)
        n = na + nb
        assert (np.asarray(keys[:n]) == np.asarray(ks)).all()
        assert (np.asarray(sec[:n]) == np.asarray(ss)).all()
        assert (np.asarray(cnt[:n]) == np.asarray(cs)).all()
        assert (np.asarray(keys[n:]) == SENT64).all()

    def test_duplicate_keys_tie_on_secondary(self, rng):
        # same key on both sides: the smaller secondary must come first
        a = np.array([5, 7, 7, 9], dtype=np.uint64)
        b = np.array([7, 7, 8, 100], dtype=np.uint64)
        oa = np.array([10, 3, 30, 1], dtype=np.uint64)
        ob = np.array([2, 40, 5, 6], dtype=np.uint64)
        keys, sec, _ = merge_sorted(a, b, secondary_a=oa, secondary_b=ob)
        got = list(zip(np.asarray(keys)[:8].tolist(),
                       np.asarray(sec)[:8].tolist()))
        assert got == sorted(got)

    def test_single_key_mode(self, rng):
        a = np.sort(rng.integers(0, 1 << 30, size=100, dtype=np.uint32))
        b = np.sort(rng.integers(0, 1 << 30, size=28, dtype=np.uint32))
        keys, sec, _ = merge_sorted(a, b)
        assert sec is None
        want = np.sort(np.concatenate([a, b]))
        assert (np.asarray(keys)[:128] == want).all()

    def test_sentinel_padded_inputs(self, rng):
        # inputs already carry trailing sentinels (dead table slots)
        a = np.sort(rng.integers(0, 1 << 40, size=50, dtype=np.uint64))
        a = np.concatenate([a, np.full(14, SENT64)])
        b = np.sort(rng.integers(0, 1 << 40, size=30, dtype=np.uint64))
        keys, _, _ = merge_sorted(a, b)
        live = np.asarray(keys[keys != SENT64])
        want = np.sort(np.concatenate([a[:50], b]))
        assert (live == want).all()
