"""Block sketcher + amino-acid pipeline tests (seqblocksketch.rs:458-496,
aautils/setsketchert.rs:1218-1560 strategies)."""

import numpy as np
import pytest

from kmerutils_tpu.base.sequence import pack_ascii_reads
from kmerutils_tpu.sketch import block
from kmerutils_tpu.sketch.params import SeqSketcherParams, SketchAlgo, DataType
from kmerutils_tpu.aa import alphabet as aa_alphabet, kmeraa
from kmerutils_tpu.io import formats


class TestBlockSketch:
    def test_blocks_of_same_read_similar(self, rng):
        s = "".join(rng.choice(list("ACGT"), size=1000))
        res = block.block_sketch(pack_ascii_reads([s, s]), k=8, m=64,
                                 block_size=256)
        assert res.sigs.shape[0] == 2
        # identical reads -> identical block signatures
        assert (res.sigs[0] == res.sigs[1]).all()
        # distinct blocks of one read -> low jaccard (random content)
        a, b = res.sigs[0, 0], res.sigs[0, 1]
        assert (a == b).mean() < 0.2

    def test_dist_block_sketched(self, rng):
        s1 = "".join(rng.choice(list("ACGT"), size=600))
        s2 = "".join(rng.choice(list("ACGT"), size=600))
        res = block.block_sketch(pack_ascii_reads([s1, s2]), k=8, m=64,
                                 block_size=512)
        assert block.dist_block_sketched(0, res.sigs[0, 0], 0, res.sigs[0, 0]) == 1.0
        d = block.dist_block_sketched(0, res.sigs[0, 0], 1, res.sigs[1, 0])
        assert 0.8 < d <= 1.0

    def test_block_dump_roundtrip(self, rng, tmp_path):
        s = "".join(rng.choice(list("ACGT"), size=700))
        res = block.block_sketch(pack_ascii_reads([s]), k=8, m=32, block_size=256)
        per_seq = block.flatten_for_dump(res)
        p = str(tmp_path / "b.bin")
        formats.write_block_signature_dump(p, 8, 256, per_seq)
        k, m, bs, back = formats.read_block_signature_dump(p)
        assert (k, m, bs) == (8, 32, 256)
        assert len(back[0][1]) == len(per_seq[0][1]) == 3  # ceil(693/256)


PROT = ("MKTAYIAKQRQISFVKSHFSRQLEERLGLIEVQAPILSRVGDGTQDNLSGAEKAVQVKVKAL"
        "PDAQFEVVHSLAKWKRQTLGQHDFSAGEGLYTHMKALRPDEDRLSPLHSVYVDQWDWERVMG"
        "DGERQFSTLKSTVEAIWAGIKATEAAVSEEFGLAPFLPDQIHFVHSQELLSRYPDLDAKGRE")


class TestAA:
    def test_alphabet_codes(self):
        # exact table from kmeraa.rs:85-106, incl. the Q=15 skip
        assert aa_alphabet.encode_aa(np.frombuffer(b"A", np.uint8))[0] == 1
        assert aa_alphabet.encode_aa(np.frombuffer(b"P", np.uint8))[0] == 0b01101
        assert aa_alphabet.encode_aa(np.frombuffer(b"Q", np.uint8))[0] == 0b01111
        assert aa_alphabet.encode_aa(np.frombuffer(b"Y", np.uint8))[0] == 0b10101
        raw = np.frombuffer(aa_alphabet.BASES, np.uint8)
        codes = aa_alphabet.encode_aa(raw)
        assert (aa_alphabet.decode_aa(codes) == raw).all()

    def test_sequence_filtering(self):
        s = kmeraa.SequenceAA("MKTAXYIAB", filtered=True)  # X, B invalid
        assert str(s) == "MKTAYIA"
        with pytest.raises(ValueError):
            kmeraa.SequenceAA("MKTAX")

    @pytest.mark.parametrize("k", [3, 6, 9, 12])
    def test_kmers_vs_slices(self, k):
        batch = kmeraa.pack_aa_reads([PROT[:50]])
        km, valid = kmeraa.kmers_aa(batch, k)
        km, valid = np.asarray(km), np.asarray(valid)
        n_valid = 50 - k + 1
        assert valid[0].sum() == n_valid
        for p in range(n_valid):
            assert int(km[0, p]) == kmeraa.kmer_value_from_str(PROT[p : p + k])

    @pytest.mark.parametrize("algo", [SketchAlgo.PROB3A, SketchAlgo.SUPER2,
                                      SketchAlgo.OPTDENS])
    def test_aa_sketch_half_overlap(self, algo):
        params = SeqSketcherParams(kmer_size=4, sketch_size=128, algo=algo,
                                   data_t=DataType.AA)
        sk = kmeraa.SketcherAA(params=params)
        batch = kmeraa.pack_aa_reads([PROT, PROT[: len(PROT) // 2], PROT])
        sigs = sk.sketch_batch(batch)
        j_same = float(sk.jaccard(sigs[0], sigs[2]))
        j_half = float(sk.jaccard(sigs[0], sigs[1]))
        assert j_same == 1.0
        assert 0.2 < j_half < 0.8


class TestAACollection:
    def test_hll_collection_equals_merged_registers(self):
        # AA whole-collection sketcher (setsketchert.rs:743-1017): the
        # collection registers must equal the max-merge of per-sequence
        # registers (the reference's block-merge invariant)
        import numpy as np
        params = SeqSketcherParams(kmer_size=4, sketch_size=64,
                                   algo=SketchAlgo.HLL, data_t=DataType.AA)
        sk = kmeraa.SketcherAA(params=params)
        batch = kmeraa.pack_aa_reads([PROT, PROT[: len(PROT) // 2],
                                      PROT[::-1]])
        per_seq = np.asarray(sk.sketch_batch(batch))
        coll = np.asarray(sk.sketch_collection(batch))
        assert np.array_equal(coll, per_seq.max(axis=0))

    @pytest.mark.parametrize("algo", [SketchAlgo.PROB3A, SketchAlgo.SUPER2,
                                      SketchAlgo.OPTDENS,
                                      SketchAlgo.REVOPTDENS, SketchAlgo.SUPER])
    def test_collection_matches_single_concatenated_stream(self, algo):
        # a collection sketch of several sequences must estimate the union:
        # sketching [PROT] as a collection == per-read sketch of PROT alone
        import numpy as np
        params = SeqSketcherParams(kmer_size=4, sketch_size=64, algo=algo,
                                   data_t=DataType.AA)
        sk = kmeraa.SketcherAA(params=params)
        one = kmeraa.pack_aa_reads([PROT])
        coll = np.asarray(sk.sketch_collection(one))
        per = np.asarray(sk.sketch_batch(one))[0]
        assert coll.shape == per.shape
        # same single-sequence content => same kmer multiset => same sketch
        assert np.allclose(np.sort(coll), np.sort(per)) or np.array_equal(coll, per)
