"""Quality subsystem + anchors + utils + ANN tests."""

import threading

import numpy as np
import pytest

from kmerutils_tpu.quality import quality as Q
from kmerutils_tpu.quality.qserver import QualityServer, QualityClient
from kmerutils_tpu import anchor, ann, utils
from kmerutils_tpu.base.sequence import pack_ascii_reads
from kmerutils_tpu.io import fastx


class TestQualityRemap:
    def test_remap_exact(self):
        # quality.rs:34-43 boundary values
        assert Q.remap_quality8(0x24) == 0
        assert Q.remap_quality8(0x25) == 1
        assert Q.remap_quality8(0x37) == 7
        assert Q.remap_quality8(0x38) == 7
        assert Q.remap_quality8(0xFF) == 7
        # interior: q=0x2e -> (0x2e-0x25)*6/18 = 3 -> 4
        assert Q.remap_quality8(0x2E) == 4
        # vectorized equals scalar loop
        qs = np.arange(0, 256, dtype=np.uint8)
        got = Q.remap_quality8(qs)
        for q, g in zip(qs, got):
            if q > 0x37:
                assert g == 7
            elif q < 0x25:
                assert g == 0
            else:
                assert g == 1 + int((min(q, 0x37) - 0x25) * 6 / 18)

    def test_quality_to_proba(self):
        assert abs(Q.quality_to_proba(0x25, 0x25) - 1.0) < 1e-12
        assert Q.quality_to_proba(0x2F, 0x25) == pytest.approx(0.1)


class TestWaveletMatrix:
    def test_access_roundtrip(self, rng):
        vals = rng.integers(0, 8, size=1000, dtype=np.uint64)
        wm = Q.WaveletMatrix(vals)
        assert (wm.access_all() == vals).all()
        idx = rng.integers(0, 1000, size=50)
        assert (wm.lookup(idx) == vals[idx]).all()

    def test_access_dense_bits(self):
        # regression: a dense level (all-ones bits) drives the within-
        # superblock rank prefix to 7*64 = 448, which overflowed the u8
        # directory (ranks wrapped mod 256 for positions past word 11)
        vals = np.full(1000, 7, dtype=np.uint64)
        vals[::7] = 2
        wm = Q.WaveletMatrix(vals)
        assert (wm.access_all() == vals).all()
        assert wm.rank(7, 1000) == int((vals == 7).sum())

    def test_rank(self, rng):
        vals = rng.integers(0, 8, size=500, dtype=np.uint64)
        wm = Q.WaveletMatrix(vals)
        for sym in range(8):
            for pos in (0, 1, 17, 255, 500):
                assert wm.rank(sym, pos) == int((vals[:pos] == sym).sum()), (sym, pos)

    def test_native_build_layout_parity(self, rng):
        # native/wavelet.cpp must emit byte-identical directories to the
        # numpy build (words / sub / sup / zeros) at awkward sizes
        from kmerutils_tpu.io import native
        if native.wavelet_build(np.zeros(1, np.uint8), 3) is None:
            pytest.skip("native wavelet builder not available")
        for n in (64, 65, 511, 513, 4095, 100_001):
            vals = rng.integers(0, 8, size=n).astype(np.uint64)
            words, sub, sup, zeros = native.wavelet_build(
                vals.astype(np.uint8), 3)
            cur = vals
            for d, lvl in enumerate((2, 1, 0)):
                bits = ((cur >> np.uint64(lvl)) & np.uint64(1)).astype(bool)
                bv = Q._BitVecRank(bits)
                assert (words[d] == bv.words).all(), (n, d)
                assert (sub[d] == bv.sub).all(), (n, d)
                assert (sup[d] == bv.sup).all(), (n, d)
                assert zeros[d] == int((~bits).sum()), (n, d)
                cur = np.concatenate([cur[~bits], cur[bits]])

    def test_native_build_dense(self):
        # dense all-ones levels exercised above the native threshold
        vals = np.full(100_000, 7, dtype=np.uint64)
        vals[::7] = 2
        wm = Q.WaveletMatrix(vals)
        assert (wm.access_all() == vals).all()
        assert wm.rank(7, vals.size) == int((vals == 7).sum())

    def test_memory_savings(self, rng):
        vals = rng.integers(0, 8, size=100_000, dtype=np.uint64)
        wm = Q.WaveletMatrix(vals)
        # 3 bits/symbol + rank directories must stay well under 8 bits/symbol
        assert wm.memory_bits() / vals.size < 4.5  # ~3.6 expected

    def test_qsequence_roundtrip(self, rng):
        qv = rng.integers(33, 80, size=300, dtype=np.uint8)
        wm = Q.QSequenceWM(7, qv=qv)
        raw = wm.decompress()
        assert raw.read_num == 7
        assert (raw.qseq == Q.remap_quality8(qv)).all()


class TestQualityStore:
    def _fixture(self, rng, tmp_path, n_reads=12):
        reads = ["".join(rng.choice(list("ACGT"), size=int(n)))
                 for n in rng.integers(20, 200, n_reads)]
        quals = ["".join(chr(int(q)) for q in rng.integers(0x21, 0x4B, len(r)))
                 for r in reads]
        p = str(tmp_path / "store.fastq")
        fastx.write_fastq(p, reads, quals)
        return p, quals

    def test_store_matches_per_read(self, rng, tmp_path):
        p, quals = self._fixture(rng, tmp_path)
        store = Q.load_quality_store(p)
        per_read = Q.load_quality_wm(p)
        assert len(store) == len(per_read) == len(quals)
        for i in range(len(quals)):
            view = store[i]
            assert view.read_num == i
            assert len(view) == len(per_read[i])
            got = view.decompress().qseq
            assert (got == per_read[i].decompress().qseq).all()
        # random block lookups through the adapter
        v = store[3]
        exp = Q.remap_quality8(np.frombuffer(quals[3].encode(), np.uint8))
        idx = rng.integers(0, len(v), size=17)
        assert (v.qseq.lookup(idx) == exp[idx].astype(np.uint64)).all()
        with pytest.raises(IndexError):
            store[len(quals)]

    def test_store_max_reads(self, rng, tmp_path):
        p, quals = self._fixture(rng, tmp_path, n_reads=9)
        store = Q.load_quality_store(p, max_reads=4)
        assert len(store) == 4
        exp = Q.remap_quality8(np.frombuffer(quals[3].encode(), np.uint8))
        assert (store[3].decompress().qseq == exp).all()

    def test_store_memory(self, rng, tmp_path):
        p, quals = self._fixture(rng, tmp_path, n_reads=30)
        store = Q.load_quality_store(p)
        total = sum(len(q) for q in quals)
        # one shared directory: comfortably under the 8 bits/symbol raw rate
        assert store.memory_bits() / total < 5.0

    def test_server_over_store(self, rng, tmp_path):
        p, quals = self._fixture(rng, tmp_path, n_reads=5)
        store = Q.load_quality_store(p)
        server = QualityServer(store, port=0)
        server.serve_in_thread()
        cli = QualityClient(port=server.port)
        want = Q.remap_quality8(np.frombuffer(quals[2].encode(), np.uint8))
        assert (cli.get_quality_sequence(2) == want).all()
        assert (cli.get_quality_block(2, 5, 15) == want[5:15]).all()
        assert cli.get_quality_base(2, 7) == int(want[7])
        cli.exit_server()
        cli.close()


class TestQualityServer:
    def test_server_roundtrip(self, rng, tmp_path):
        reads = ["".join(rng.choice(list("ACGT"), size=50)) for _ in range(4)]
        quals = ["".join(chr(int(c)) for c in rng.integers(0x21, 0x49, size=50))
                 for _ in range(4)]
        p = str(tmp_path / "q.fastq")
        fastx.write_fastq(p, reads, quals)
        qseqs = Q.load_quality_wm(p)
        server = QualityServer(qseqs, port=0)
        server.serve_in_thread()
        cli = QualityClient(port=server.port)
        got = cli.get_quality_sequence(2)
        want = Q.remap_quality8(np.frombuffer(quals[2].encode(), dtype=np.uint8))
        assert (got == want).all()
        blk = cli.get_quality_block(1, 10, 20)
        want1 = Q.remap_quality8(np.frombuffer(quals[1].encode(), dtype=np.uint8))
        assert (blk == want1[10:20]).all()
        assert cli.get_quality_base(0, 5) == int(
            Q.remap_quality8(np.frombuffer(quals[0].encode(), dtype=np.uint8))[5])
        cli.exit_server()
        cli.close()


class TestAnchors:
    def test_compute_anchors(self, rng):
        reads = ["".join(rng.choice(list("ACGT"), size=500)) for _ in range(3)]
        params = anchor.AnchorsGeneratorParameters(
            fasta_name="x.fa", window=100, nbkmer=8, kmer_size=11, overlap=20)
        anchors = anchor.compute_anchors(pack_ascii_reads(reads), params)
        # windows per read: beg = 0,80,160,... while beg < 500 -> 7
        assert len(anchors) == 3 * 7
        a0 = anchors[0]
        assert a0.readnum == 0 and a0.slicepos == 0
        assert 0 < len(a0.minhash) <= 8
        # determinism + value encoding round trip
        s = a0.value_string()
        back = anchor.SliceAnchor.from_value_string(0, 0, s)
        assert back.minhash == a0.minhash

    def test_anchor_minhash_matches_window_kmers(self, rng):
        from kmerutils_tpu.base import kmer as kmer_mod
        from kmerutils_tpu.ops.rng import wang_hash32
        import jax.numpy as jnp
        s = "".join(rng.choice(list("ACGT"), size=200))
        params = anchor.AnchorsGeneratorParameters(
            fasta_name="x.fa", window=200, nbkmer=5, kmer_size=9, overlap=0)
        anchors = anchor.compute_anchors(pack_ascii_reads([s]), params)
        a = anchors[0]
        # oracle: smallest 5 distinct wang hashes of the window's kmers
        kms = [s[p:p+9] for p in range(200 - 9 + 1)]
        vals = {kmer_mod.kmer_value_from_str(x) for x in kms}
        hashes = sorted(int(np.asarray(wang_hash32(jnp.uint32(v)))) for v in vals)
        assert [h for h, c in a.minhash] == hashes[:5]

    def test_store_and_driver(self, rng, tmp_path):
        reads = ["".join(rng.choice(list("ACGT"), size=300)) for _ in range(2)]
        p = str(tmp_path / "t.fasta")
        fastx.write_fasta(p, reads)
        params = anchor.AnchorsGeneratorParameters(
            fasta_name=p, window=100, nbkmer=4, kmer_size=11, overlap=10)
        store = anchor.AnchorStore()
        anchors = anchor.anchor_computation(p, params, store)
        assert len(anchors) == 2 * 4  # beg=0,90,180,270
        back = store.load_anchor(params, 0, 0)
        assert back is not None and back.minhash == anchors[0].minhash
        assert anchor.MINHASH_1 in store.hashes

    def test_resp_client_server_roundtrip(self):
        # the from-scratch RESP wire path alone (kvstore.py): framing,
        # redis HSET new-field semantics, nil HGET, pipelining
        from kmerutils_tpu import kvstore
        srv = kvstore.RespServer()
        try:
            c = kvstore.RespClient(port=srv.port)
            assert c.ping()
            assert c.hset("h", "f1", "v1") == 1
            assert c.hset("h", "f1", "v2") == 0    # overwrite: 0 new fields
            assert c.hget("h", "f1") == "v2"
            assert c.hget("h", "nope") is None
            assert c.hgetall("h") == {"f1": "v2"}
            assert c.pipeline([("HSET", "h", "a", "1"),
                               ("HSET", "h", "b", "2"),
                               ("HLEN", "h")]) == [1, 1, 3]
            assert "rewriting" in c.bgrewriteaof()
            c.close()
        finally:
            srv.close()

    def test_redis_anchor_store_live(self, rng, tmp_path):
        # FastaAnchors-equivalent drives a LIVE RESP client end to end
        # (anchor.rs:398-467 + redisbase.rs semantics over real TCP):
        # persisted hashes must match the in-memory store byte for byte,
        # and load_anchor must read back THROUGH the wire
        from kmerutils_tpu import kvstore
        reads = ["".join(rng.choice(list("ACGT"), size=300))
                 for _ in range(2)]
        p = str(tmp_path / "t.fasta")
        fastx.write_fasta(p, reads)
        params = anchor.AnchorsGeneratorParameters(
            fasta_name=p, window=100, nbkmer=4, kmer_size=11, overlap=10)
        srv = kvstore.RespServer()
        try:
            store = anchor.RedisAnchorStore(port=srv.port)
            anchors = anchor.anchor_computation(p, params, store)
            assert len(anchors) == 2 * 4
            # server-side state == the local mirror, for both hashes
            for key in (anchor.SLICE_ANCHOR_KEY, anchor.MINHASH_1):
                got = {f.decode(): v.decode()
                       for f, v in srv.store[key.encode()].items()}
                assert got == store.hashes[key]
            # reload through the wire, not the mirror
            store.hashes.clear()
            back = store.load_anchor(params, 1, 90)
            want = [a for a in anchors
                    if a.readnum == 1 and a.slicepos == 90][0]
            assert back is not None and back.minhash == want.minhash
            store.close()
        finally:
            srv.close()


class TestUtilsAnn:
    def test_make_equal_groups(self, rng):
        sizes = rng.integers(1, 100, size=400).tolist()
        fronts = utils.make_equal_groups(sizes, 20)
        assert fronts[0] == 0 and fronts[-1] == 400
        assert sum(sizes) == sum(
            sum(sizes[fronts[i]:fronts[i+1]]) for i in range(len(fronts)-1))

    def test_brute_force_neighbors(self, rng):
        sigs = rng.integers(0, 50, size=(20, 64), dtype=np.uint64)
        sigs[7] = sigs[3]  # identical pair
        nn, sim = ann.brute_force_neighbors(sigs, 3)
        assert nn[3, 0] == 7 and nn[7, 0] == 3
        assert sim[3, 0] == 1.0

    def test_neighbor_dump_roundtrip(self, rng, tmp_path):
        nn = rng.integers(0, 100, size=(10, 4)).astype(np.uint32)
        sim = rng.random((10, 4)).astype(np.float32)
        p = str(tmp_path / "ann.bin")
        ann.write_neighbor_dump(p, nn, sim)
        n2, s2 = ann.read_neighbor_dump(p)
        assert (n2 == nn).all() and np.allclose(s2, sim)


class TestNativeQualityPath:
    def test_native_matches_python_fallback(self, tmp_path):
        from kmerutils_tpu.io import fastx, native
        if not (native.available()
                and hasattr(native._load(), "ktp_next_block_qual")):
            pytest.skip("native qual parser not built")
        rng = np.random.default_rng(3)
        reads = ["".join(rng.choice(list("ACGT"), size=int(n)))
                 for n in rng.integers(30, 120, 10)]
        quals = ["".join(chr(int(q)) for q in rng.integers(0x21, 0x4B, len(r)))
                 for r in reads]
        p = str(tmp_path / "q.fastq")
        fastx.write_fastq(p, reads, quals)
        via_native = Q.load_quality_wm(p)
        # force the python path
        expected = [np.frombuffer(q.encode(), np.uint8) for q in quals]
        assert len(via_native) == len(expected)
        for wm, exp in zip(via_native, expected):
            got = wm.decompress().qseq
            assert (got == Q.remap_quality8(exp)).all()

    def test_native_qual_blocks_carry_overflow(self, tmp_path):
        # a block that fills mid-record must carry the consumed record's
        # quality to the next call instead of failing (long-read files)
        from kmerutils_tpu.io import fastx, native
        if not (native.available()
                and hasattr(native._load(), "ktp_next_block_qual")):
            pytest.skip("native qual parser not built")
        rng = np.random.default_rng(8)
        reads = ["".join(rng.choice(list("ACGT"), size=1000))
                 for _ in range(20)]
        quals = ["".join(chr(int(q)) for q in rng.integers(0x21, 0x4B, 1000))
                 for _ in reads]
        p = str(tmp_path / "long.fastq")
        fastx.write_fastq(p, reads, quals)
        got = []
        # cap fits ~2.5 reads -> forces the pending carry repeatedly
        for q, off in native.iter_quality_blocks(p, block_reads=100,
                                                 cap_bytes=2500):
            for r in range(len(off) - 1):
                got.append(bytes(q[off[r]: off[r + 1]]))
        assert got == [q.encode() for q in quals]
