"""I/O, dump-format round-trips, and statistics tests."""

import numpy as np
import pytest

from kmerutils_tpu.base.sequence import pack_ascii_reads
from kmerutils_tpu.count import exact
from kmerutils_tpu.io import fastx, formats
from kmerutils_tpu import stats


def make_reads(rng, n, lo=60, hi=300):
    return ["".join(rng.choice(list("ACGT"), size=int(L)))
            for L in rng.integers(lo, hi, size=n)]


class TestFastx:
    def test_fastq_roundtrip(self, rng, tmp_path):
        reads = make_reads(rng, 20)
        p = str(tmp_path / "t.fastq")
        fastx.write_fastq(p, reads)
        got = [r for _, r, _ in fastx.iter_fastx(p)]
        assert [g.decode() for g in got] == reads

    def test_fasta_roundtrip(self, rng, tmp_path):
        reads = make_reads(rng, 10)
        p = str(tmp_path / "t.fasta")
        fastx.write_fasta(p, reads)
        got = [r.decode() for _, r, _ in fastx.iter_fastx(p)]
        assert got == reads

    def test_non_acgt_reads_dropped(self, tmp_path):
        p = str(tmp_path / "t.fastq")
        fastx.write_fastq(p, ["ACGTACGT", "ACGTNCGT", "TTTT"])
        st = fastx.IngestStats()
        clean = list(fastx.iter_clean_reads(p, st))
        assert len(clean) == 2
        assert st.nb_bad_read == 1
        assert st.nb_bad_bases == 1
        assert st.n_bases == 8 + 8 + 4

    def test_batching_preserves_reads(self, rng, tmp_path):
        reads = make_reads(rng, 57)
        p = str(tmp_path / "t.fastq")
        fastx.write_fastq(p, reads)
        seen = {}
        for batch, idx in fastx.read_batches(p, batch_reads=16):
            codes = np.asarray(batch.codes())
            lens = np.asarray(batch.lengths)
            for row, i in enumerate(idx):
                from kmerutils_tpu.base import alphabet
                s = alphabet.decode_2b(codes[row, : lens[row]]).tobytes().decode()
                seen[int(i)] = s
        assert len(seen) == 57
        assert all(seen[i] == reads[i] for i in range(57))

    @pytest.mark.parametrize("bucket", [False, True])
    def test_shapes_are_deterministic_quota_rungs(self, rng, tmp_path,
                                                  bucket):
        # round 5 invariant: every emitted batch shape is exactly
        # (pow2 row quota of its width rung, rung width) — data-dependent
        # group sizes must never leak into shapes (each distinct shape is
        # a full XLA compile), and the index stream must partition the
        # file even with carry-over across flush windows
        lens = np.concatenate([
            rng.integers(60, 300, 400),          # short rung mix
            rng.integers(300, 2000, 300),        # mid rungs
            rng.integers(2000, 9000, 50),        # long tail
        ])
        rng.shuffle(lens)
        reads = ["".join(rng.choice(list("ACGT"), size=int(n)))
                 for n in lens]
        p = str(tmp_path / "mix.fastq")
        fastx.write_fastq(p, reads)

        def qwidth(L):
            L = max(L, 256)
            pw = 1 << (L - 1).bit_length()
            return 3 * pw // 4 if L <= 3 * pw // 4 else pw

        def quota(Lq, batch_reads):
            q = max(1, min(batch_reads, (8 << 20) // Lq))
            n = 1 << (q - 1).bit_length()
            return n if n <= q else n >> 1

        seen_idx = []
        for batch, idx in fastx.read_batches(p, batch_reads=10000,
                                             bucket=bucket, to_host=True):
            n, w = batch.words.shape
            L = (w - 1) * 16
            assert L == qwidth(L), (n, w)        # width on a rung
            assert n == quota(L, 10000), (n, w)  # rows == pow2 quota
            ll = np.asarray(batch.lengths)
            assert int(ll.max()) <= L
            if bucket:
                # rung-pure: every live read in this batch is on the rung
                live = ll[ll > 0]
                assert all(qwidth(int(x)) == L for x in live)
            seen_idx.extend(int(i) for i in idx)
        assert sorted(seen_idx) == list(range(len(reads)))

    @pytest.mark.parametrize("to_device", [False, True])
    def test_overlapped_matches_plain(self, rng, tmp_path, to_device):
        # the two-stage (parse thread -> upload thread) pipeline yields
        # exactly read_batches' stream, in order, with stats filled
        reads = make_reads(rng, 57)
        p = str(tmp_path / "t.fastq")
        fastx.write_fastq(p, reads)
        plain = list(fastx.read_batches(p, batch_reads=16))
        st = fastx.IngestStats()
        over = list(fastx.read_batches_overlapped(
            p, batch_reads=16, stats=st, to_device=to_device))
        assert len(over) == len(plain)
        for (ba, ia), (bb, ib) in zip(plain, over):
            np.testing.assert_array_equal(np.asarray(ba.words),
                                          np.asarray(bb.words))
            np.testing.assert_array_equal(np.asarray(ba.lengths),
                                          np.asarray(bb.lengths))
            np.testing.assert_array_equal(ia, ib)
        assert st.n_bases == sum(len(r) for r in reads)

    def test_to_host_batches_stay_numpy(self, rng, tmp_path):
        # to_host=True must yield pure-host numpy batches (zero transfers:
        # the overlapped pipeline's upload stage owns the device_put) with
        # content identical to the default device stream
        reads = make_reads(rng, 23)
        p = str(tmp_path / "t.fastq")
        fastx.write_fastq(p, reads)
        host = list(fastx.read_batches(p, batch_reads=8, to_host=True))
        dev = list(fastx.read_batches(p, batch_reads=8))
        assert len(host) == len(dev) > 0
        for (bh, ih), (bd, id_) in zip(host, dev):
            assert isinstance(bh.words, np.ndarray)
            assert isinstance(bh.lengths, np.ndarray)
            np.testing.assert_array_equal(bh.words, np.asarray(bd.words))
            np.testing.assert_array_equal(bh.lengths,
                                          np.asarray(bd.lengths))
            np.testing.assert_array_equal(ih, id_)

    def test_overlapped_propagates_errors(self, tmp_path):
        p = str(tmp_path / "missing.fastq")
        with pytest.raises(Exception):
            list(fastx.read_batches_overlapped(p, to_device=True))

    def test_batch_capacity_cap(self, rng, tmp_path):
        # padded rows x width never exceeds ~8M bases; an ultra-long read
        # still fits (alone in an over-cap batch) and short reads batch wide
        long_read = "".join(rng.choice(list("ACGT"), size=40_000))
        shorts = ["".join(rng.choice(list("ACGT"), size=300))
                  for _ in range(50)]
        p = str(tmp_path / "mix.fastq")
        fastx.write_fastq(p, [long_read] + shorts)
        total = 0
        for batch, idx in fastx.read_batches(p, batch_reads=10000):
            n, W = batch.words.shape
            padded_bases = n * (W - 1) * 16
            assert padded_bases <= (8 << 20) or len(idx) == 1, \
                (n, W, len(idx))
            total += len(idx)
        assert total == 51

    def test_gzip(self, rng, tmp_path):
        import gzip
        reads = make_reads(rng, 5)
        p = str(tmp_path / "t.fastq.gz")
        body = "".join(f"@r{i}\n{r}\n+\n{'I'*len(r)}\n" for i, r in enumerate(reads))
        with gzip.open(p, "wt") as f:
            f.write(body)
        got = [r.decode() for _, r, _ in fastx.iter_fastx(p)]
        assert got == reads


class TestDumpFormats:
    @pytest.mark.parametrize("k", [11, 16, 21])
    def test_multiple_kmer_roundtrip(self, rng, tmp_path, k):
        reads = make_reads(rng, 6, 100, 200) * 2  # duplicates -> counts >= 2
        batch = pack_ascii_reads(reads)
        keys, counts, rn, ps, nd = exact.count_batch_detailed(batch, k)
        keys, counts, rn, ps = exact.compact_detailed(keys, counts, rn, ps)
        assert len(keys) == int(nd)
        # reference record order: first-occurrence scan order
        order = np.argsort(rn.astype(np.int64) * (1 << 32) + ps, kind="stable")
        p = str(tmp_path / "d.multi_kmer.bin")
        n = formats.write_multiple_kmer_dump(p, k, keys[order], counts[order])
        k2, reload = formats.read_multiple_kmer_dump(p)
        assert k2 == k
        want = {int(kk): int(cc) for kk, cc in zip(keys, counts) if cc >= 2}
        assert reload == want
        assert n == len(want)

    def test_multiple_kmer_16bit_counts(self, rng, tmp_path):
        p = str(tmp_path / "d16.bin")
        keys = np.array([5, 9], dtype=np.uint64)
        counts = np.array([300, 2])
        formats.write_multiple_kmer_dump(p, 16, keys, counts, bytes_per_count=2)
        _, reload = formats.read_multiple_kmer_dump(p)
        assert reload == {5: 300, 9: 2}

    def test_unique_kmer_roundtrip(self, rng, tmp_path):
        reads = make_reads(rng, 4, 100, 150)
        batch = pack_ascii_reads(reads)
        k = 16
        keys, rn, ps, nu = exact.unique_kmer_coords(batch, k)
        keys, rn, ps = exact.compact_unique(keys, rn, ps)
        assert len(keys) == int(nu)
        order = np.argsort(rn.astype(np.int64) * (1 << 32) + ps, kind="stable")
        p = str(tmp_path / "d.once_kmer.bin")
        formats.write_unique_kmer_dump(p, k, keys[order], rn[order], ps[order])
        k2, kk, rr, pp = formats.read_unique_kmer_dump(p)
        assert k2 == k
        assert (kk == keys[order].astype(np.uint32)).all()
        assert (rr == rn[order]).all() and (pp == ps[order]).all()

    def test_signature_dump_roundtrip(self, rng, tmp_path):
        sigs = rng.integers(0, 1 << 32, size=(7, 12), dtype=np.uint32)
        p = str(tmp_path / "sig.bin")
        formats.write_signature_dump(p, 8, sigs)
        k, m, back = formats.read_signature_dump(p)
        assert (k, m) == (8, 12)
        assert (back == sigs).all()

    def test_signature_dump_header_bytes(self, tmp_path):
        # byte-level check of the header layout (seqsketchjaccard.rs:382-414)
        p = str(tmp_path / "sig.bin")
        formats.write_signature_dump(p, 8, np.zeros((1, 3), np.uint32))
        hdr = open(p, "rb").read(16)
        assert hdr == bytes.fromhex("ddeaabce") + (4).to_bytes(4, "little") \
            + (3).to_bytes(4, "little") + (8).to_bytes(4, "little")

    def test_block_signature_roundtrip(self, rng, tmp_path):
        per_seq = [(0, [rng.integers(0, 99, 5, dtype=np.uint32) for _ in range(3)]),
                   (1, [rng.integers(0, 99, 5, dtype=np.uint32)])]
        p = str(tmp_path / "bsig.bin")
        formats.write_block_signature_dump(p, 8, 500, per_seq)
        k, m, bs, back = formats.read_block_signature_dump(p)
        assert (k, m, bs) == (8, 5, 500)
        assert len(back) == 2
        for (ns, blocks), (ns2, blocks2) in zip(per_seq, back):
            assert ns == ns2
            for a, b in zip(blocks, blocks2):
                assert (a == b).all()


class TestStats:
    def test_base_distribution(self, rng):
        reads = ["AAAA", "ACGT", "GGGGGGGG"]
        dist = stats.get_base_count([pack_ascii_reads(reads)])
        m = dist.acgt_distribution
        # AAAA: A at 100%; ACGT: each base at 25%; GGGG..: G at 100%
        assert m[100, 0] == 1 and m[100, 2] == 1
        assert m[25, 0] == 1 and m[25, 1] == 1 and m[25, 2] == 1 and m[25, 3] == 1
        # 0% rows: base absent entirely
        assert m[0, 3] == 2  # T absent in AAAA and GGGG…
        assert dist.n_reads == 3
        norm = dist.normalized_distribution()
        assert abs(norm[100, 0] - 1 / 3) < 1e-12

    def test_readlen_histo_dump(self, rng, tmp_path):
        reads = make_reads(rng, 300, 50, 500)
        dist = stats.get_base_count([pack_ascii_reads(reads)])
        f1 = str(tmp_path / "bases.histo")
        f2 = str(tmp_path / "readlen.histo")
        dist.ascii_dump_acgt_distribution(f1)
        dist.ascii_dump_readlen_distribution(f2)
        assert len(open(f1).read().splitlines()) == 101
        # the reference's quantile sampler (statutils.rs:150-170) sweeps
        # thresholds in units of total-entry count against read LENGTHS, so
        # small files yield few points — we reproduce that behavior
        lines = open(f2).read().splitlines()
        assert len(lines) >= 2
        total = sum(int(l.split()[1]) for l in lines)
        assert total <= 300

    def test_merge(self, rng):
        reads = make_reads(rng, 40)
        d1 = stats.get_base_count([pack_ascii_reads(reads[:20])])
        d2 = stats.get_base_count([pack_ascii_reads(reads[20:])])
        d1.merge(d2)
        dall = stats.get_base_count([pack_ascii_reads(reads)])
        assert d1.n_reads == dall.n_reads == 40
        assert np.allclose(d1.acgt_distribution, dall.acgt_distribution)
        assert (d1.read_lengths == dall.read_lengths).all()


class TestNativeParser:
    def test_native_matches_python(self, rng, tmp_path):
        from kmerutils_tpu.io import native
        if not native.available():
            pytest.skip("native parser not built")
        reads = make_reads(rng, 40) + ["ACGTNN"]  # last one dropped
        p = str(tmp_path / "n.fastq")
        fastx.write_fastq(p, reads)
        got = [c.tobytes() for c in native.iter_clean_read_codes(p)]
        from kmerutils_tpu.base import alphabet
        want = [alphabet.encode_2b(np.frombuffer(r.encode(), np.uint8)).tobytes()
                for r in reads[:-1]]
        assert got == want

    def test_native_multiline_fasta(self, tmp_path):
        from kmerutils_tpu.io import native
        if not native.available():
            pytest.skip("native parser not built")
        p = str(tmp_path / "m.fasta")
        with open(p, "w") as f:
            f.write(">r0\nACGT\nACGT\nTT\n>r1\nGGGG\n")
        got = [c.tobytes() for c in native.iter_clean_read_codes(p)]
        from kmerutils_tpu.base import alphabet
        assert got[0] == alphabet.encode_2b(
            np.frombuffer(b"ACGTACGTTT", np.uint8)).tobytes()
        assert len(got) == 2

    def test_native_stats(self, rng, tmp_path):
        from kmerutils_tpu.io import native
        if not native.available():
            pytest.skip("native parser not built")
        p = str(tmp_path / "s.fastq")
        fastx.write_fastq(p, ["ACGT", "ACNT", "GGGG"])
        r = native.NativeFastxReader(p)
        list(r)
        assert r.stats.tolist() == [12, 1, 1, 3]

    def test_packed_blocks_word_layout(self, tmp_path):
        # packed output must equal pack_codes' word layout (first base in
        # the top 2 bits), reads word-aligned, dropped reads absent
        from kmerutils_tpu.io import native
        from kmerutils_tpu.base.sequence import pack_ascii_reads
        if not native.available():
            pytest.skip("native parser not built")
        reads = ["ACGTACGTACGTACGTAC",       # 18 bases -> 2 words
                 "ACNT",                      # dropped
                 "T" * 16,                    # exactly one word
                 "G"]
        p = str(tmp_path / "p.fastq")
        fastx.write_fastq(p, reads)
        r = native.NativeFastxReader(p)
        blocks = list(r.packed_blocks(n_threads=2))
        assert len(blocks) == 1
        words, woff, lens = blocks[0]
        keep = [reads[0], reads[2], reads[3]]
        assert lens.tolist() == [len(x) for x in keep]
        for i, s in enumerate(keep):
            want = np.asarray(pack_ascii_reads([s]).words)[0]
            got = words[woff[i] : woff[i + 1]]
            # pack_ascii_reads appends a slack word; packed path does not
            assert got.tolist() == want[: got.size].tolist()
            assert got.size == (len(s) + 15) // 16
        assert r.stats.tolist() == [39, 1, 1, 4]

    def test_packed_batches_match_byte_path(self, rng, tmp_path):
        from kmerutils_tpu.io import native
        if not native.available():
            pytest.skip("native parser not built")
        reads = []
        for i in range(200):
            n = int(rng.integers(5, 700))
            s = "".join(rng.choice(list("ACGT"), size=n))
            if i % 13 == 0:
                s = s[: n // 2] + "N" + s[n // 2 :]
            reads.append(s)
        for writer, name in ((fastx.write_fastq, "a.fastq"),
                             (fastx.write_fasta, "a.fasta")):
            p = str(tmp_path / name)
            writer(p, reads)
            st_a, st_b = fastx.IngestStats(), fastx.IngestStats()
            A = list(fastx.read_batches(p, batch_reads=32, stats=st_a,
                                        packed=True))
            B = list(fastx.read_batches(p, batch_reads=32, stats=st_b,
                                        packed=False))
            assert len(A) == len(B)
            for (ba, ia), (bb, ib) in zip(A, B):
                assert (np.asarray(ia) == np.asarray(ib)).all()
                assert ba.words.shape == bb.words.shape
                assert (np.asarray(ba.words) == np.asarray(bb.words)).all()
                assert (np.asarray(ba.lengths)
                        == np.asarray(bb.lengths)).all()
            assert vars(st_a) == vars(st_b)


class TestParserEdgeCases:
    @pytest.mark.parametrize("data,n_reads,n_bases", [
        # CRLF line endings (both parsers must strip \r)
        (b"@r0\r\nACGTACGT\r\n+\r\nIIIIIIII\r\n"
         b"@r1\r\nTTTTCCCC\r\n+\r\nIIIIIIII\r\n", 2, 16),
        # truncated: quality line missing entirely
        (b"@r0\nACGTACGT\n+\n", 1, 8),
        # truncated mid-quality
        (b"@r0\nACGTACGT\n+\nIIII", 1, 8),
    ])
    def test_python_native_agree(self, tmp_path, data, n_reads, n_bases):
        from kmerutils_tpu.io import native
        p = str(tmp_path / "edge.fastq")
        with open(p, "wb") as f:
            f.write(data)
        st_py = fastx.IngestStats()
        # with_quality forces the pure-python parser branch
        py = [c for c, _q in fastx.iter_clean_reads(p, st_py,
                                                    with_quality=True)]
        st_na = fastx.IngestStats()
        na = list(fastx.iter_clean_reads(p, st_na))
        assert len(py) == n_reads and st_py.n_bases == n_bases
        if native.available():
            assert len(na) == len(py)
            for a, b in zip(py, na):
                assert a.tolist() == b.tolist()
            assert (st_na.n_reads, st_na.n_bases) == (st_py.n_reads,
                                                      st_py.n_bases)


class TestWrappedFastq:
    def test_wrapped_records_parse(self, tmp_path):
        # legal multi-line FASTQ: sequence and quality each wrap; the
        # quality may even start with '@' — length, not markers, delimits
        p = str(tmp_path / "wrapped.fastq")
        seq = "ACGTACGTACGTACGTACGTACGTACGT"
        qual = "@" + "I" * (len(seq) - 1)
        with open(p, "w") as f:
            f.write("@r0\n")
            f.write(seq[:10] + "\n" + seq[10:20] + "\n" + seq[20:] + "\n")
            f.write("+\n")
            f.write(qual[:7] + "\n" + qual[7:] + "\n")
            f.write("@r1\nACGT\n+\nIIII\n")
        recs = list(fastx.iter_fastx(p))
        assert len(recs) == 2
        assert recs[0][1] == seq.encode()
        assert recs[0][2] == qual.encode()
        assert recs[1][1] == b"ACGT"

    def test_wrapped_batches_match_flat(self, tmp_path):
        # the python fallback batching over a wrapped file must equal the
        # flat 4-line form of the same reads
        rng = np.random.default_rng(9)
        reads = ["".join(rng.choice(list("ACGT"), size=int(n)))
                 for n in rng.integers(30, 90, 8)]
        flat = str(tmp_path / "flat.fastq")
        fastx.write_fastq(flat, reads)
        wrapped = str(tmp_path / "wrapped.fastq")
        with open(wrapped, "w") as f:
            for i, r in enumerate(reads):
                f.write(f"@read{i}\n{r[:17]}\n{r[17:]}\n+\n"
                        f"{'I' * min(17, len(r))}\n{'I' * max(0, len(r)-17)}\n")
        a = [(rid, s) for rid, s, _ in fastx.iter_fastx(flat)]
        b = [(rid, s) for rid, s, _ in fastx.iter_fastx(wrapped)]
        assert a == b

    def test_empty_read_keeps_sync(self, tmp_path):
        # an adapter-trimmed zero-length read still carries ONE empty
        # quality line; skipping it desynchronized every later record
        p = str(tmp_path / "empty.fastq")
        with open(p, "w") as f:
            f.write("@r0\n\n+\n\n@r1\nACGT\n+\nIIII\n@r2\nGGTT\n+\nIIII\n")
        recs = list(fastx.iter_fastx(p))
        assert [(r[0], r[1]) for r in recs] == [
            (b"r0", b""), (b"r1", b"ACGT"), (b"r2", b"GGTT")]
