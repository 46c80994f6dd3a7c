"""Golden tests for alphabet / sequence / kmer extraction — the fixtures are
the same strings the reference uses in its unit tests
(kmer32bit.rs:221-313, sequence.rs:737-1166, kmergenerator.rs:595-972)."""

import numpy as np
import pytest

from kmerutils_tpu.base import alphabet, sequence, kmer
from kmerutils_tpu.base.sequence import Sequence, pack_ascii_reads
from kmerutils_tpu.ops import bitops
import jax.numpy as jnp


SEQ80 = ("TCAAAGGGAAACATTCAAAATCAGTATGCGCCCGTTCAGTTACGTATTGCTCTCGCT"
         "AATGAGATGGGCTGGGTACAGAG")


def revcomp_str(s: str) -> str:
    comp = {"A": "T", "C": "G", "G": "C", "T": "A"}
    return "".join(comp[c] for c in reversed(s))


class TestAlphabet:
    def test_encode_decode_roundtrip(self):
        raw = np.frombuffer(SEQ80.encode(), dtype=np.uint8)
        codes = alphabet.encode_2b(raw)
        assert (alphabet.decode_2b(codes) == raw).all()

    def test_encoding_values(self):
        # A=00 C=01 G=10 T=11, alphabet.rs:119-127
        assert list(alphabet.encode_2b(np.frombuffer(b"ACGT", dtype=np.uint8))) == [0, 1, 2, 3]
        # lowercase accepted
        assert list(alphabet.encode_2b(np.frombuffer(b"acgt", dtype=np.uint8))) == [0, 1, 2, 3]

    def test_complement(self):
        assert list(alphabet.complement_2b(np.array([0, 1, 2, 3]))) == [3, 2, 1, 0]

    def test_is_acgt(self):
        assert alphabet.count_non_acgt(np.frombuffer(b"ACGTN", dtype=np.uint8)) == 1
        assert alphabet.count_non_acgt(np.frombuffer(SEQ80.encode(), dtype=np.uint8)) == 0

    def test_get_ac_from_tg(self):
        # alphabet.rs:20-26: T->A, G->C, everything else unchanged
        assert alphabet.get_ac_from_tg(ord("T")) == ord("A")
        assert alphabet.get_ac_from_tg(ord("G")) == ord("C")
        assert alphabet.get_ac_from_tg(ord("A")) == ord("A")
        assert alphabet.get_ac_from_tg(ord("N")) == ord("N")

    def test_4bit(self):
        raw = np.frombuffer(b"ACGTN", dtype=np.uint8)
        codes = alphabet.encode_4b(raw)
        assert list(codes) == [0b0001, 0b0010, 0b0100, 0b1000, 0b1111]
        assert (alphabet.decode_4b(codes) == raw).all()


class TestSequence:
    @pytest.mark.parametrize("nb_bits", [2, 4, 8])
    def test_roundtrip(self, nb_bits):
        for s in [SEQ80, "A", "AC", "ACG", "ACGT", "ACGTA"]:
            seq = Sequence(s.encode(), nb_bits)
            assert seq.size() == len(s)
            assert seq.decompress() == s.encode()

    def test_packing_layout_2bit(self):
        # first base in high bits of byte: "ACGT" -> 0b00011011 = 0x1B
        seq = Sequence(b"ACGT", 2)
        assert seq.seq[0] == 0x1B
        # partial byte padded with A (=00) on the right, sequence.rs:60-72
        seq = Sequence(b"TT", 2)
        assert seq.seq[0] == 0b11110000
        assert seq.description == (2, 2)

    def test_get_base(self):
        seq = Sequence(SEQ80.encode(), 2)
        want = alphabet.encode_2b(np.frombuffer(SEQ80.encode(), dtype=np.uint8))
        got = [seq.get_base(i) for i in range(len(SEQ80))]
        assert got == list(want)

    def test_reverse_complement(self):
        seq = Sequence(SEQ80.encode(), 2)
        assert seq.reverse_complement().decompress().decode() == revcomp_str(SEQ80)


class TestReadBatch:
    def test_codes_roundtrip(self):
        reads = [SEQ80, SEQ80[:17], "ACGT", SEQ80[5:64]]
        batch = pack_ascii_reads(reads)
        codes = np.asarray(batch.codes())
        for i, r in enumerate(reads):
            want = alphabet.encode_2b(np.frombuffer(r.encode(), dtype=np.uint8))
            assert (codes[i, : len(r)] == want).all()
            assert (codes[i, len(r):] == 0).all()
        assert list(np.asarray(batch.lengths)) == [len(r) for r in reads]

    def test_revcomp_batch(self):
        reads = [SEQ80, SEQ80[:33], "ACGTACGTA"]
        batch = pack_ascii_reads(reads)
        rc = sequence.revcomp_batch(batch)
        codes = np.asarray(rc.codes())
        for i, r in enumerate(reads):
            want = alphabet.encode_2b(
                np.frombuffer(revcomp_str(r).encode(), dtype=np.uint8))
            assert (codes[i, : len(r)] == want).all()


class TestRevcompBitops:
    # fixtures from kmer32bit.rs:228-291
    CASES_12 = [("TACGAGTAGGAT", "ATCCTACTCGTA"), ("ACTTGGAACGTT", "AACGTTCCAAGT")]
    CASES_11 = [("TACGAGTAGGA", "TCCTACTCGTA"), ("ACTTGGAACGT", "ACGTTCCAAGT")]

    @pytest.mark.parametrize("s,want", CASES_12 + CASES_11)
    def test_revcomp_u32(self, s, want):
        k = len(s)
        v = kmer.kmer_value_from_str(s)
        got = int(bitops.revcomp_u32(jnp.uint32(v), k))
        assert got == kmer.kmer_value_from_str(want)

    def test_revcomp_u32_16(self):
        s = SEQ80[:16]
        v = kmer.kmer_value_from_str(s)
        got = int(bitops.revcomp_u32(jnp.uint32(v), 16))
        assert got == kmer.kmer_value_from_str(revcomp_str(s))

    @pytest.mark.parametrize("k", [17, 21, 28, 32])
    def test_revcomp_u64(self, k):
        s = SEQ80[:k]
        v = kmer.kmer_value_from_str(s)
        got = int(bitops.revcomp_u64(jnp.uint64(v), k))
        assert got == kmer.kmer_value_from_str(revcomp_str(s))

    @pytest.mark.parametrize("k", [4, 11, 16, 23, 32])
    def test_revcomp_involution(self, rng, k):
        vals = rng.integers(0, 1 << (2 * k), size=100, dtype=np.uint64)
        if k <= 16:
            x = jnp.asarray(vals.astype(np.uint32))
            assert (np.asarray(bitops.revcomp_u32(bitops.revcomp_u32(x, k), k)) == np.asarray(x)).all()
        else:
            x = jnp.asarray(vals)
            assert (np.asarray(bitops.revcomp_u64(bitops.revcomp_u64(x, k), k)) == np.asarray(x)).all()


class TestKmerExtraction:
    """Every generated kmer must equal the string slice — the reference's
    generator oracle (kmergenerator.rs:595-972)."""

    @pytest.mark.parametrize("k", [1, 3, 8, 11, 14, 16])
    def test_kmers_u32_vs_slices(self, k):
        batch = pack_ascii_reads([SEQ80])
        kmers, valid = kmer.kmers_u32(batch, k)
        kmers, valid = np.asarray(kmers), np.asarray(valid)
        n_valid = len(SEQ80) - k + 1
        assert valid[0].sum() == n_valid
        for p in range(n_valid):
            assert kmer.kmer_str_from_value(int(kmers[0, p]), k) == SEQ80[p : p + k]

    @pytest.mark.parametrize("k", [17, 20, 25, 32])
    def test_kmers_u64_vs_slices(self, k):
        batch = pack_ascii_reads([SEQ80, SEQ80[:40]])
        kmers, valid = kmer.kmers_u64(batch, k)
        kmers, valid = np.asarray(kmers), np.asarray(valid)
        for r, s in enumerate([SEQ80, SEQ80[:40]]):
            n_valid = len(s) - k + 1
            assert valid[r].sum() == n_valid
            for p in range(n_valid):
                assert kmer.kmer_str_from_value(int(kmers[r, p]), k) == s[p : p + k]

    def test_canonical(self):
        k = 11
        batch = pack_ascii_reads([SEQ80])
        can, valid, strand = kmer.canonical_kmers(batch, k)
        can, strand = np.asarray(can), np.asarray(strand)
        for p in range(len(SEQ80) - k + 1):
            s = SEQ80[p : p + k]
            rc = revcomp_str(s)
            want = min(kmer.kmer_value_from_str(s), kmer.kmer_value_from_str(rc))
            assert int(can[0, p]) == want

    def test_short_read_no_valid(self):
        batch = pack_ascii_reads(["ACG", SEQ80])
        _, valid = kmer.kmers_u32(batch, 16)
        assert np.asarray(valid)[0].sum() == 0
