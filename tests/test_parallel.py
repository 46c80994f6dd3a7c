"""Multi-device tests on the virtual 8-device CPU mesh (SURVEY.md §4)."""

import collections

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from kmerutils_tpu.base.sequence import pack_ascii_reads
from kmerutils_tpu.base import kmer
from kmerutils_tpu.count import exact
from kmerutils_tpu.parallel import mesh as kmesh, collective
from kmerutils_tpu.sketch.setsketch import SetSketchParams
from kmerutils_tpu.sketch import setsketch


def revcomp_str(s):
    comp = {"A": "T", "C": "G", "G": "C", "T": "A"}
    return "".join(comp[c] for c in reversed(s))


def oracle_counts(reads, k):
    c = collections.Counter()
    for s in reads:
        for p in range(len(s) - k + 1):
            sub = s[p : p + k]
            c[min(kmer.kmer_value_from_str(sub),
                  kmer.kmer_value_from_str(revcomp_str(sub)))] += 1
    return c


@pytest.fixture(scope="module")
def mesh8():
    assert len(jax.devices()) == 8, "conftest must provide 8 CPU devices"
    return kmesh.make_mesh(8)


class TestShardedCount:
    def test_matches_oracle(self, rng, mesh8):
        reads = ["".join(rng.choice(list("ACGT"), size=200)) for _ in range(16)]
        reads = reads + reads[:8]  # cross-device duplicate kmers
        batch = pack_ascii_reads(reads)
        k = 9
        keys, counts, dropped, nd, nu = collective.sharded_count(batch, k, mesh8)
        keys, counts = np.asarray(keys), np.asarray(counts)
        assert int(np.asarray(dropped).sum()) == 0
        got = {}
        for d in range(keys.shape[0]):
            live = counts[d] > 0
            assert live.sum() == int(np.asarray(nd)[d])
            for kk, cc in zip(keys[d][live], counts[d][live]):
                assert kk not in got  # shards disjoint
                got[int(kk)] = int(cc)
        want = oracle_counts(reads, k)
        assert got == dict(want)

    def test_shard_ownership(self, rng, mesh8):
        from kmerutils_tpu.count import dispatch
        reads = ["".join(rng.choice(list("ACGT"), size=150)) for _ in range(8)]
        batch = pack_ascii_reads(reads)
        k = 9
        keys, counts, dropped, nd, nu = collective.sharded_count(batch, k, mesh8)
        keys = np.asarray(keys)
        counts = np.asarray(counts)
        for d in range(8):
            live = keys[d][counts[d] > 0]
            if live.size:
                sid = np.asarray(dispatch.dispatch(jnp.asarray(live), 8, k))
                assert (sid == d).all()


class TestShardedSketch:
    def test_setsketch_collection_merge(self, rng, mesh8):
        sp = SetSketchParams(m=256)
        items = rng.integers(1, 1 << 60, size=(16, 64), dtype=np.uint64)
        valid = np.ones((16, 64), bool)
        merged = collective.sharded_setsketch_collection(
            jnp.asarray(items), jnp.asarray(valid), sp, mesh8)
        # must equal the single-device sketch of everything
        all_regs = setsketch.setsketch_signatures(
            items.reshape(1, -1), valid.reshape(1, -1), sp)[0]
        assert (np.asarray(merged) == np.asarray(all_regs)).all()

    def test_data_parallel_sketch(self, rng, mesh8):
        from kmerutils_tpu.sketch import superminhash
        items = rng.integers(1, 1 << 60, size=(16, 32), dtype=np.uint64)
        valid = np.ones((16, 32), bool)
        fn = collective.data_parallel_sketch(
            lambda it, va: superminhash.superminhash2(it, va, 64)[0], mesh8)
        sigs = np.asarray(fn(jnp.asarray(items), jnp.asarray(valid)))
        ref = np.asarray(superminhash.superminhash2(items, valid, 64)[0])
        assert (sigs == ref).all()


class TestRedundantShardedCount:
    def test_matches_oracle(self, rng, mesh8):
        reads = ["".join(rng.choice(list("ACGT"), size=180)) for _ in range(12)]
        reads += reads[:4]
        batch = pack_ascii_reads(reads)
        k = 9
        keys, counts, nd, nu = collective.sharded_count_redundant(batch, k, mesh8)
        keys, counts = np.asarray(keys), np.asarray(counts)
        got = {}
        for d in range(keys.shape[0]):
            live = counts[d] > 0
            assert live.sum() == int(np.asarray(nd)[d])
            for kk, cc in zip(keys[d][live], counts[d][live]):
                assert kk not in got
                got[int(kk)] = int(cc)
        assert got == dict(oracle_counts(reads, k))


class TestShardedStreamingTable:
    def test_two_batches_match_oracle(self, rng, mesh8):
        from kmerutils_tpu.base import kmer as kmer_mod
        k = 9
        all_reads = []
        table = collective.sharded_table_create(2048, mesh8)
        offset = 0
        for b in range(2):
            reads = ["".join(rng.choice(list("ACGT"), size=160))
                     for _ in range(16)]
            if b == 1:
                reads[:4] = all_reads[:4]  # cross-batch duplicates
            all_reads.extend(reads)
            batch = pack_ascii_reads(reads)
            table, dropped = collective.sharded_table_update(
                table, batch, k, mesh8, read_num_offset=offset)
            assert int(np.asarray(dropped).sum()) == 0
            offset += len(reads)
        keys = np.asarray(table.keys)
        counts = np.asarray(table.counts)
        coord = np.asarray(table.coord)
        got, got_first = {}, {}
        for d in range(8):
            live = counts[d] > 0
            for kk, cc, oo in zip(keys[d][live], counts[d][live],
                                  coord[d][live]):
                assert kk not in got  # shard-disjoint
                got[int(kk)] = int(cc)
                got_first[int(kk)] = (int(oo) >> 32, int(oo) & 0xFFFFFFFF)
        want = oracle_counts(all_reads, k)
        assert got == dict(want)
        first = {}
        for r, s in enumerate(all_reads):
            for p in range(len(s) - k + 1):
                sub = s[p : p + k]
                can = min(kmer_mod.kmer_value_from_str(sub),
                          kmer_mod.kmer_value_from_str(revcomp_str(sub)))
                first.setdefault(can, (r, p))
        assert got_first == first


class TestShardedStream:
    @pytest.mark.parametrize("k,coords", [(13, False), (13, True),
                                          (21, True)])
    def test_matches_oracle_across_batches(self, rng, mesh8, k, coords):
        # multi-chip streaming through the Pallas merge-fold tables: two
        # sequential batches, per-shard disjoint tables, host union ==
        # Counter oracle (+ first-occurrence coords)
        from jax.sharding import NamedSharding, PartitionSpec as P

        sh = NamedSharding(mesh8, P(kmesh.READS_AXIS))
        batches = []
        for _ in range(2):
            reads = ["".join(rng.choice(list("ACGT"), size=160))
                     for _ in range(16)]
            b = pack_ascii_reads(reads)
            from kmerutils_tpu.base.sequence import ReadBatch
            batches.append((reads, ReadBatch(
                words=jax.device_put(np.asarray(b.words), sh),
                lengths=jax.device_put(np.asarray(b.lengths), sh))))

        table = collective.sharded_stream_create(1 << 12, mesh8,
                                                 wide=k > 16, coords=coords)
        offset = 0
        for reads, gb in batches:
            table, dropped = collective.sharded_stream_update(
                table, gb, k, mesh8, read_num_offset=offset)
            assert int(np.asarray(dropped).sum()) == 0
            offset += len(reads)
        keys, counts, rn, ps, dropped = collective.sharded_stream_finalize(
            table, mesh8)
        assert dropped == 0

        all_reads = [r for reads, _ in batches for r in reads]
        want = oracle_counts(all_reads, k)
        got = dict(zip(keys.tolist(), counts.tolist()))
        assert got == dict(want)
        if coords:
            first = {}
            for i, r in enumerate(all_reads):
                for p in range(len(r) - k + 1):
                    sub = r[p:p + k]
                    v = min(kmer.kmer_value_from_str(sub),
                            kmer.kmer_value_from_str(revcomp_str(sub)))
                    first.setdefault(v, (i, p))
            for v, r_, p_ in zip(keys.tolist(), rn.tolist(), ps.tolist()):
                assert first[v] == (r_, p_), v


class TestShardedBloom:
    def test_matches_single_device_at_size(self, rng, mesh8):
        """sharded_bloom_insert at a realistic-ish size (1M keys over the
        8-device mesh): the pmax-unioned replicated slots must be
        IDENTICAL to a single-device insert of the same keys (probe
        indices are deterministic; max-union is exact, the mergeability of
        kmercount.rs:810-814), every inserted key must test positive, and
        the fill fraction must match the Bloom expectation (balance)."""
        from kmerutils_tpu.count import filters
        from kmerutils_tpu.count.exact import SENTINEL64

        n, log2s, nh = 1 << 20, 24, 4
        keys = rng.integers(0, 2**63, size=n, dtype=np.uint64)
        # pad one sentinel per shard tail (the masked-lane path)
        keys_sh = keys.reshape(8, -1)
        keys_sh = np.concatenate(
            [keys_sh, np.full((8, 1), SENTINEL64, np.uint64)], axis=1)
        slots = jnp.zeros(1 << log2s, jnp.uint8)
        out = collective.sharded_bloom_insert(
            slots, jnp.asarray(keys_sh.ravel()), nh, log2s, mesh8)

        ref = filters.BloomFilter.create(log2s, nh).insert(
            jnp.asarray(keys))
        np.testing.assert_array_equal(np.asarray(out),
                                      np.asarray(ref.slots))

        bf = filters.BloomFilter(slots=out, nb_hash=nh, log2_slots=log2s)
        probe = jnp.asarray(keys[:: max(n // 4096, 1)])
        assert bool(np.asarray(bf.contains(probe)).all())
        # expected fill: 1 - (1 - 1/S)^(n*nh)
        exp = 1.0 - (1.0 - 1.0 / (1 << log2s)) ** (n * nh)
        got = float(np.asarray(out, np.float64).mean())
        assert abs(got - exp) < 0.01, (got, exp)
