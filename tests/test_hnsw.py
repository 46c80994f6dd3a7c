"""Native HNSW index: recall vs exact brute force, persistence round-trip,
threaded insert determinism of size — the ANN handoff role of
datasketcher.rs:156-195,263-309,326-354."""

import numpy as np
import pytest

from kmerutils_tpu import hnsw
from kmerutils_tpu.ann import brute_force_neighbors

pytestmark = pytest.mark.skipif(not hnsw.available(),
                                reason="native toolchain unavailable")


def make_sigs(rng, n, m, n_clusters=32):
    """Clustered u32 signatures: cluster center + per-read slot noise."""
    centers = rng.integers(0, 2**32, size=(n_clusters, m), dtype=np.uint32)
    who = rng.integers(0, n_clusters, size=n)
    sigs = centers[who].copy()
    noise = rng.random((n, m)) < 0.3
    sigs[noise] = rng.integers(0, 2**32, size=int(noise.sum()), dtype=np.uint32)
    return sigs


class TestHnsw:
    def test_recall_vs_brute_force(self, rng):
        n, m, k = 2000, 64, 10
        sigs = make_sigs(rng, n, m)
        index = hnsw.Hnsw(dim=m, capacity=n, max_nb_connection=24,
                          ef_construction=200)
        index.parallel_insert(sigs, n_threads=4)
        assert len(index) == n
        ids, dists = index.search(sigs[:200], k=k, ef_search=128)
        nn_exact, _ = brute_force_neighbors(sigs, nbng=k)
        # self is always found (distance 0) -> drop it, compare the rest
        recall = 0.0
        for q in range(200):
            got = set(int(i) for i in ids[q] if i >= 0 and i != q)
            want = set(int(i) for i in nn_exact[q][: k - 1])
            recall += len(got & want) / max(len(want), 1)
        recall /= 200
        assert recall > 0.85, recall
        # distances are the hamming fraction, ascending
        assert (np.diff(dists, axis=1) >= 0).all()
        assert dists.min() == 0.0  # self match

    def test_save_load_roundtrip(self, rng, tmp_path):
        n, m = 500, 32
        sigs = make_sigs(rng, n, m, n_clusters=8)
        index = hnsw.Hnsw(dim=m, capacity=n)
        index.parallel_insert(sigs, n_threads=2)
        ids0, d0 = index.search(sigs[:50], k=5, ef_search=64, n_threads=1)
        path = str(tmp_path / "graph.hnsw")
        index.file_dump(path)
        loaded = hnsw.Hnsw.load(path)
        assert len(loaded) == n
        assert loaded.dim == m and loaded.dist == "hamming"
        ids1, d1 = loaded.search(sigs[:50], k=5, ef_search=64, n_threads=1)
        assert (ids0 == ids1).all()
        assert (d0 == d1).all()

    def test_l2(self, rng):
        n, m = 400, 16
        pts = rng.normal(size=(n, m)).astype(np.float32)
        index = hnsw.Hnsw(dim=m, capacity=n, dist="l2")
        index.parallel_insert(pts, n_threads=2)
        ids, d = index.search(pts[:20], k=3, ef_search=64)
        # nearest neighbor of a stored point is itself at distance 0
        assert (ids[:, 0] == np.arange(20)).all()
        assert np.allclose(d[:, 0], 0.0)

    def test_capacity_overflow(self, rng):
        index = hnsw.Hnsw(dim=8, capacity=10)
        sigs = rng.integers(0, 2**32, size=(10, 8), dtype=np.uint32)
        index.parallel_insert(sigs)
        with pytest.raises(RuntimeError):
            index.insert(sigs[0])

    def test_empty_search(self):
        index = hnsw.Hnsw(dim=8, capacity=4)
        ids, d = index.search(np.zeros((2, 8), np.uint32), k=3)
        assert (ids == -1).all()
