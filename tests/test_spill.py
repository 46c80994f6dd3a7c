"""Spill segments: exact counting past device-table capacity.

Unit-level: SpillStore.merge_stream against a dict oracle (count sums,
first-occurrence coordinate minima, multi-step chunked merging).
CLI-level: parsefastq with a capacity far below the file's distinct-kmer
cardinality must still produce the exact dump (vs the in-core path run at
ample capacity), through multiple spill epochs.
"""

import collections

import numpy as np
import pytest

from kmerutils_tpu.count.spill import SpillStore
from kmerutils_tpu.cli import parsefastq
from kmerutils_tpu.io import fastx, formats

from test_cli import oracle_counts


def _random_segments(rng, n_seg, wide, coords, universe=5000, seg_max=800):
    """Sorted-distinct-key segments + the oracle aggregate."""
    kdt = np.uint64 if wide else np.uint32
    segs = []
    oracle: dict = {}
    for _ in range(n_seg):
        n = int(rng.integers(1, seg_max))
        keys = rng.choice(universe, size=n, replace=False).astype(kdt)
        if wide:  # push some keys past 2^32 to exercise u64 compares
            keys = keys + (keys % 3).astype(np.uint64) * np.uint64(1 << 40)
        keys = np.sort(keys)
        counts = rng.integers(1, 1000, size=n).astype(np.uint32)
        rn = rng.integers(0, 1 << 20, size=n).astype(np.uint32)
        ps = rng.integers(0, 1 << 20, size=n).astype(np.uint32)
        segs.append((keys, counts, rn, ps))
        for i in range(n):
            kk = int(keys[i])
            c0, coord0 = oracle.get(kk, (0, (1 << 64) - 1))
            oracle[kk] = (c0 + int(counts[i]),
                          min(coord0, (int(rn[i]) << 32) | int(ps[i])))
    return segs, oracle


@pytest.mark.parametrize("wide", [False, True])
@pytest.mark.parametrize("chunk", [64, 1 << 20])
def test_merge_stream_oracle(rng, tmp_path, wide, chunk):
    segs, oracle = _random_segments(rng, n_seg=5, wide=wide, coords=True)
    with SpillStore(wide=wide, coords=True, tmpdir=str(tmp_path)) as store:
        for keys, counts, rn, ps in segs:
            store.add_segment(keys, counts, rn, ps)
        got: dict = {}
        prev_last = None
        for mk, mc, mr, mp in store.merge_stream(chunk=chunk):
            assert (np.diff(mk.astype(np.uint64)) > 0).all()  # strictly asc
            if prev_last is not None:     # ascending ACROSS chunks too
                assert int(mk[0]) > prev_last
            prev_last = int(mk[-1])
            for i in range(len(mk)):
                got[int(mk[i])] = (int(mc[i]),
                                   (int(mr[i]) << 32) | int(mp[i]))
    assert got == oracle


def test_merge_stream_count_saturation(tmp_path):
    with SpillStore(wide=False, coords=False, tmpdir=str(tmp_path)) as store:
        big = np.uint32(0xFFFFFFF0)
        for _ in range(3):
            store.add_segment(np.array([7], np.uint32),
                              np.array([big], np.uint32))
        [(mk, mc, _r, _p)] = list(store.merge_stream())
    assert mk.tolist() == [7] and mc.tolist() == [0xFFFFFFFF]


@pytest.fixture
def big_fastq(rng, tmp_path):
    # ~60 random reads of ~150 bases -> ~8k distinct 11-mers, far above the
    # tiny CLI capacity used below; duplicate a third for counts >= 2
    reads = ["".join(rng.choice(list("ACGT"), size=int(n)))
             for n in rng.integers(120, 180, size=60)]
    reads += reads[:20]
    p = str(tmp_path / "big.fastq")
    fastx.write_fastq(p, reads)
    return p, reads


class TestParsefastqSpill:
    def test_count_exact_through_spill(self, big_fastq, tmp_path,
                                       monkeypatch, capsys):
        p, reads = big_fastq
        monkeypatch.chdir(tmp_path)
        rc = parsefastq.main(["-f", p, "--batch-reads", "2", "kmer", "--count",
                              "-s", "11", "--capacity", "2048"])
        assert rc == 0
        out = capsys.readouterr()
        assert "spill segments merged" in out.out
        assert "WARNING" not in out.err
        k, reload = formats.read_multiple_kmer_dump(p + ".multi_kmer.bin")
        want = {kk: min(cc, 255)
                for kk, cc in oracle_counts(reads, 11).items() if cc >= 2}
        assert k == 11 and reload == want

    def test_unique_exact_through_spill(self, big_fastq, tmp_path,
                                        monkeypatch, capsys):
        p, reads = big_fastq
        monkeypatch.chdir(tmp_path)
        rc = parsefastq.main(["-f", p, "--batch-reads", "2", "kmer", "--unique",
                              "-s", "16", "--capacity", "2048"])
        assert rc == 0
        out = capsys.readouterr()
        assert "spill segments merged" in out.out
        k, keys, rn, ps = formats.read_unique_kmer_dump(p + ".once_kmer.bin")
        want = {kk for kk, cc in oracle_counts(reads, 16).items() if cc == 1}
        assert set(keys.tolist()) == {v & 0xFFFFFFFF for v in want}
        # coordinates are first occurrences, records in scan order
        rp = list(zip(rn.tolist(), ps.tolist()))
        assert rp == sorted(rp)
        occ = {}
        for r, s in enumerate(reads):
            for pos in range(len(s) - 15):
                sub = s[pos:pos + 16]
                from test_cli import revcomp_str
                from kmerutils_tpu.base import kmer as kmer_mod
                v = min(kmer_mod.kmer_value_from_str(sub),
                        kmer_mod.kmer_value_from_str(revcomp_str(sub)))
                occ.setdefault(v, (r, pos))
        got = dict(zip(keys.tolist(), rp))
        assert got == {int(v) & 0xFFFFFFFF: occ[v] for v in want}

    def test_no_spill_drops_with_warning(self, big_fastq, tmp_path,
                                         monkeypatch, capsys):
        p, reads = big_fastq
        monkeypatch.chdir(tmp_path)
        rc = parsefastq.main(["-f", p, "--batch-reads", "2", "kmer", "--count",
                              "-s", "11", "--capacity", "2048",
                              "--no-spill"])
        assert rc == 0
        out = capsys.readouterr()
        assert "dropped past capacity" in out.err
