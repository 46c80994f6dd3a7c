"""CLI binary tests — drive parsefastq / datasketcher through their mains."""

import collections
import os

import numpy as np
import pytest

from kmerutils_tpu.base import kmer
from kmerutils_tpu.cli import parsefastq, datasketcher
from kmerutils_tpu.io import fastx, formats


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


@pytest.fixture
def fastq_file(rng, tmp_path):
    reads = ["".join(rng.choice(list("ACGT"), size=int(n)))
             for n in rng.integers(60, 200, size=12)]
    reads += reads[:4]  # duplicates for counts >= 2
    p = str(tmp_path / "in.fastq")
    fastx.write_fastq(p, reads)
    return p, reads


class TestParsefastq:
    def test_count(self, fastq_file, tmp_path, monkeypatch):
        p, reads = fastq_file
        monkeypatch.chdir(tmp_path)
        rc = parsefastq.main(["-f", p, "kmer", "--count", "-s", "11",
                              "--capacity", "16384"])
        assert rc == 0
        k, reload = formats.read_multiple_kmer_dump(p + ".multi_kmer.bin")
        want = {kk: min(cc, 255) for kk, cc in oracle_counts(reads, 11).items()
                if cc >= 2}
        assert k == 11 and reload == want
        assert os.path.exists("bases.histo")

    def test_unique(self, fastq_file, tmp_path, monkeypatch):
        p, reads = fastq_file
        monkeypatch.chdir(tmp_path)
        rc = parsefastq.main(["-f", p, "kmer", "--unique", "-s", "16",
                              "--capacity", "16384"])
        assert rc == 0
        k, keys, rn, ps, = formats.read_unique_kmer_dump(p + ".once_kmer.bin")
        want = {kk for kk, cc in oracle_counts(reads, 16).items() if cc == 1}
        assert set(keys.tolist()) == {v & 0xFFFFFFFF for v in want}
        # scan order: (read, pos) nondecreasing
        rp = list(zip(rn.tolist(), ps.tolist()))
        assert rp == sorted(rp)

    def test_count_k20_u64_table(self, fastq_file, tmp_path, monkeypatch):
        # k > 16 exercises the Kmer64bit domain and the u64-keyed table
        p, reads = fastq_file
        monkeypatch.chdir(tmp_path)
        rc = parsefastq.main(["-f", p, "kmer", "--count", "-s", "20",
                              "--capacity", "16384"])
        assert rc == 0
        k, reload = formats.read_multiple_kmer_dump(p + ".multi_kmer.bin")
        want = {kk: min(cc, 255) for kk, cc in oracle_counts(reads, 20).items()
                if cc >= 2}
        assert k == 20 and reload == want

    def test_k15_rejected(self, fastq_file, capsys):
        p, _ = fastq_file
        assert parsefastq.main(["-f", p, "kmer", "--count", "-s", "15"]) == 1


class TestDatasketcher:
    def test_sketch_dump(self, fastq_file, tmp_path, monkeypatch):
        p, reads = fastq_file
        monkeypatch.chdir(tmp_path)
        out = str(tmp_path / "sigs.bin")
        rc = datasketcher.main(["-f", p, "-s", "64", "-k", "11", "-d", out])
        assert rc == 0
        k, m, sigs = formats.read_signature_dump(out)
        assert (k, m) == (11, 64)
        assert sigs.shape[0] == len(reads)
        # duplicate reads must have identical signatures
        assert (sigs[0] == sigs[12]).all()
        from kmerutils_tpu.sketch.params import SeqSketcherParams
        back = SeqSketcherParams.reload_json(str(tmp_path))
        assert back.kmer_size == 11 and back.sketch_size == 64

    def test_block_mode(self, fastq_file, tmp_path):
        p, reads = fastq_file
        out = str(tmp_path / "bsigs.bin")
        rc = datasketcher.main(["-f", p, "-s", "32", "-k", "8", "-d", out,
                                "-b", "64"])
        assert rc == 0
        k, m, bs, back = formats.read_block_signature_dump(out)
        assert (k, m, bs) == (8, 32, 64)
        assert len(back) == len(reads)

    def test_block_ann(self, fastq_file, tmp_path):
        # block mode + ann: block-level neighbor table excludes same-read
        # blocks (DistBlockSketched semantics) and ships a (numseq, numblock)
        # row index
        p, reads = fastq_file
        out = str(tmp_path / "b.bin")
        rc = datasketcher.main(["-f", p, "-s", "64", "-k", "11", "-d", out,
                                "-b", "64", "ann", "-n", "2"])
        assert rc == 0
        from kmerutils_tpu.ann import read_neighbor_dump
        nn, sim = read_neighbor_dump(out + "-ann")
        who = np.fromfile(out + "-ann.blocks", dtype=np.uint32).reshape(-1, 2)
        assert who.shape[0] == nn.shape[0]
        read_of = who[:, 0]
        live = sim >= 0
        assert live.any()
        # no neighbor may come from the query's own read
        for q in range(nn.shape[0]):
            for j in range(nn.shape[1]):
                if live[q, j]:
                    assert read_of[nn[q, j]] != read_of[q]

    def test_ann(self, fastq_file, tmp_path):
        p, reads = fastq_file
        out = str(tmp_path / "s.bin")
        rc = datasketcher.main(["-f", p, "-s", "64", "-k", "11", "-d", out,
                                "ann", "-n", "3"])
        assert rc == 0
        from kmerutils_tpu.ann import read_neighbor_dump
        nn, sim = read_neighbor_dump(out + "-ann")
        assert nn.shape == (len(reads), 3)
        # read 0 and its duplicate (12) must be mutual top neighbors
        assert nn[0, 0] == 12 and nn[12, 0] == 0
