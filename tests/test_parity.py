"""Host-side parity surface: Kmer value types (golden values mirroring the
reference's unit tests), IterSequence, seqminhash range sketches, hashed-item
wrappers, reload accessors, size heuristics."""

import numpy as np
import pytest

from kmerutils_tpu.base.kmertypes import (
    Kmer32bit, Kmer16b32bit, Kmer64bit, KmerAA32bit, KmerAA64bit,
    kmer_type_for)
from kmerutils_tpu.base.sequence import Sequence, IterSequence, pack_ascii_reads
from kmerutils_tpu.base import kmer as kmer_mod


def revcomp_str(s):
    comp = {"A": "T", "C": "G", "G": "C", "T": "A"}
    return "".join(comp[c] for c in reversed(s))


class TestKmer32bit:
    # golden cases from the reference's own tests (kmer32bit.rs:221-313)
    @pytest.mark.parametrize("fwd,rc", [
        ("TACGAGTAGGAT", "ATCCTACTCGTA"),
        ("ACTTGGAACGTT", "AACGTTCCAAGT"),
        ("TACGAGTAGGA", "TCCTACTCGTA"),
        ("ACTTGGAACGT", "ACGTTCCAAGT"),
    ])
    def test_reverse_complement_golden(self, fwd, rc):
        revcomp = Kmer32bit.from_str(fwd).reverse_complement()
        should = Kmer32bit.from_str(rc)
        assert revcomp.get_nb_base() == should.get_nb_base()
        assert revcomp.word == should.word

    def test_ord_and_eq(self):
        a = Kmer32bit.from_str("TACGAGTAGGAT")
        b = Kmer32bit.from_str("ACTTGGAACGTT")
        c = Kmer32bit.from_str("TACGAGTAGGAT")
        assert a == c and a > b
        # longer kmer sorts greater regardless of value (kmer32bit.rs:47-55)
        assert Kmer32bit.from_str("AAAAAAAAAA") > Kmer32bit.from_str("TTTTT")

    def test_tag_in_top_bits_and_roundtrip(self):
        km = Kmer32bit.from_str("ACGTACGTACG")
        assert km.get_nb_base() == 11
        assert (km.word >> 28) == 11
        assert str(km) == "ACGTACGTACG"
        assert km.get_compressed_value() == kmer_mod.kmer_value_from_str(
            "ACGTACGTACG")

    def test_matches_device_extraction(self):
        s = "CATTGCTAGGCAATCAGTCA"
        k = 9
        batch = pack_ascii_reads([s])
        km, valid = kmer_mod.kmers_u32(batch, k)
        km_h = np.asarray(km)
        for p in range(len(s) - k + 1):
            assert int(km_h[0, p]) == Kmer32bit.from_str(
                s[p : p + k]).get_compressed_value()


class TestKmer16b32bit:
    def test_revcomp_and_value(self):
        s = "TACGAGTAGGATCCAT"
        km = Kmer16b32bit.from_str(s)
        assert str(km.reverse_complement()) == revcomp_str(s)
        assert km.get_compressed_value() == kmer_mod.kmer_value_from_str(s)

    def test_push_rolls_window(self):
        s = "TACGAGTAGGATCCAT"
        km = Kmer16b32bit.from_str(s)
        km2 = km.push(2)  # push G
        assert str(km2) == s[1:] + "G"


class TestKmer64bit:
    @pytest.mark.parametrize("k", [17, 21, 32])
    def test_revcomp_roundtrip(self, k):
        rng = np.random.default_rng(3)
        s = "".join(rng.choice(list("ACGT"), size=k))
        km = Kmer64bit.from_str(s)
        assert km.get_nb_base() == k
        assert str(km.reverse_complement()) == revcomp_str(s)
        assert str(km.reverse_complement().reverse_complement()) == s

    def test_matches_device_extraction(self):
        rng = np.random.default_rng(5)
        s = "".join(rng.choice(list("ACGT"), size=60))
        k = 23
        batch = pack_ascii_reads([s])
        km, _ = kmer_mod.kmers_u64(batch, k)
        km_h = np.asarray(km)
        for p in (0, 10, 60 - k):
            assert int(km_h[0, p]) == Kmer64bit.from_str(
                s[p : p + k]).get_compressed_value()

    def test_dump_bytes_layout(self):
        km = Kmer64bit.from_str("ACGTACGTACGTACGTA")
        b = km.dump_bytes()
        assert b[0] == 17 and len(b) == 9


class TestKmerAA:
    def test_push_and_str(self):
        km = KmerAA32bit.from_str("MKLVW"[:5])  # 5 residues fit u32
        assert str(km) == "MKLVW"
        km64 = KmerAA64bit.from_str("ACDEFGHIKLMN")
        assert str(km64) == "ACDEFGHIKLMN"

    def test_revcomp_raises(self):
        with pytest.raises(NotImplementedError):
            KmerAA32bit.from_str("MKL").reverse_complement()

    def test_ord(self):
        assert KmerAA32bit.from_str("AC") < KmerAA32bit.from_str("CA")
        assert KmerAA32bit.from_str("ACD") > KmerAA32bit.from_str("YY")


def test_kmer_type_dispatch():
    assert kmer_type_for(9) is Kmer32bit
    assert kmer_type_for(16) is Kmer16b32bit
    assert kmer_type_for(21) is Kmer64bit
    with pytest.raises(ValueError):
        kmer_type_for(15)


class TestIterSequence:
    def test_forward_backward_range(self):
        s = Sequence(b"ACGTACGTTG", 2)
        it = IterSequence(s, decode=True)
        assert bytes(iter(it)) == b"ACGTACGTTG"
        it = IterSequence(s, decode=True)
        it.set_range(2, 7)
        assert bytes(iter(it)) == b"GTACG"
        it = IterSequence(s)
        it.set_range(2, 7)
        assert it.next_back() == 2  # G
        assert it.next() == 2       # G
        assert [it.next(), it.next(), it.next()] == [3, 0, 1]  # T A C
        assert it.next() is None

    def test_bad_range(self):
        s = Sequence(b"ACGT", 2)
        it = IterSequence(s)
        with pytest.raises(ValueError):
            it.set_range(2, 9)


class TestSeqMinhashRange:
    def test_range_restriction_changes_sketch(self):
        from kmerutils_tpu.sketch.seqminhash import (
            sketch_seqrange_superminhash, sketch_seqrange_minhash)
        rng = np.random.default_rng(0)
        s = "".join(rng.choice(list("ACGT"), size=300))
        batch = pack_ascii_reads([s])
        full = np.asarray(sketch_seqrange_superminhash(batch, 0, 300, 11, 64))
        half = np.asarray(sketch_seqrange_superminhash(batch, 0, 150, 11, 64))
        sub = np.asarray(sketch_seqrange_superminhash(
            pack_ascii_reads([s[:150]]), 0, 150, 11, 64))
        # range sketch == sketch of the sliced string, != full sketch
        assert (half == sub).all()
        assert (full != half).any()
        sk, counts = sketch_seqrange_minhash(batch, 0, 150, 11, 32)
        sk2, counts2 = sketch_seqrange_minhash(
            pack_ascii_reads([s[:150]]), 0, 150, 11, 32)
        assert (np.asarray(sk) == np.asarray(sk2)).all()

    def test_k16_dispatch(self):
        from kmerutils_tpu.sketch.seqminhash import sketch_seqrange_superminhash
        rng = np.random.default_rng(1)
        s = "".join(rng.choice(list("ACGT"), size=100))
        sig = sketch_seqrange_superminhash(pack_ascii_reads([s]), 0, 100, 16, 32)
        assert np.isfinite(np.asarray(sig)).all()
        with pytest.raises(ValueError):
            sketch_seqrange_superminhash(pack_ascii_reads([s]), 0, 100, 15, 32)


class TestHashed:
    def test_ordering_and_recovery(self):
        from kmerutils_tpu.hashed import HashedItem, HashCount, InvHashedItem
        from kmerutils_tpu.ops.rng import wang_hash32
        a, b = HashedItem(3, "x"), HashedItem(9, "y")
        assert a < b and sorted([b, a])[0] is a
        assert HashCount(a, 5).hashed.item == "x"
        h = int(wang_hash32(np.uint32(123456)))
        assert InvHashedItem(h).recover() == 123456


def test_kmercount_reload_rank_accessor(tmp_path):
    from kmerutils_tpu.io import formats
    keys = np.array([7, 3, 11], dtype=np.uint64)
    rn = np.array([0, 1, 2], dtype=np.uint32)
    ps = np.array([4, 5, 6], dtype=np.uint32)
    f = str(tmp_path / "u.bin")
    formats.write_unique_kmer_dump(f, 16, keys, rn, ps)
    rel = formats.KmerCountReload.load_unique_kmers_from_file(f)
    assert rel.get_coord_from_rank(1) == (1, 5)
    assert rel.get_coord_from_rank(3) is None
    assert rel.get_unique_kmer_coord(11) == (2, 6)
    f2 = str(tmp_path / "m.bin")
    formats.write_multiple_kmer_dump(f2, 16, np.array([5, 9], np.uint64),
                                     np.array([3, 2], np.int64))
    rel2 = formats.KmerCountReload.load_multiple_kmers_from_file(f2)
    assert rel2.get_kmer_count(5) == 3 and rel2.get_kmer_count(4) is None
    assert sorted(rel2.get_multi_kmer_counts()) == [2, 3]
