"""Native HNSW graph index over sketch signatures (ctypes bindings).

Role twin of the reference's hnsw_rs integration
(/root/reference/src/bin/datasketcher.rs:156-195,263-309,326-354):
``Hnsw`` holds signatures in a native C++ Malkov-Yashunin graph
(native/hnsw.cpp), supports threaded ``parallel_insert`` and k-NN
``search``, and persists with ``file_dump`` / ``Hnsw.load`` (the graph file
role of hnsw_rs's file_dump; the byte format is this package's own — the
hnsw_rs on-disk format lives in an external crate that is not part of the
reference snapshot).

Distance 'hamming' = fraction of unequal u32 slots (DistHamming on
signatures, and the Probability-Jaccard distance of DistBlockSketched,
seqblocksketch.rs:417-440).  'l2' = squared euclidean on f32 vectors.

For small corpora or when the native toolchain is unavailable, use
ann.brute_force_neighbors (exact, device-side).
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

from .io.native import _load as _load_lib

_DIST = {"hamming": 0, "l2": 1}
_configured = False


def _lib():
    global _configured
    lib = _load_lib()
    if lib is None:
        raise RuntimeError(
            "native library unavailable (run `make -C native`)")
    if not _configured:
        c = ctypes
        u32p = np.ctypeslib.ndpointer(np.uint32, flags="C_CONTIGUOUS")
        lib.hnsw_create.restype = c.c_void_p
        lib.hnsw_create.argtypes = [c.c_int32, c.c_int32, c.c_int64,
                                    c.c_int32, c.c_int32, c.c_uint64]
        lib.hnsw_free.argtypes = [c.c_void_p]
        lib.hnsw_size.restype = c.c_int64
        lib.hnsw_size.argtypes = [c.c_void_p]
        lib.hnsw_insert_batch.restype = c.c_int64
        lib.hnsw_insert_batch.argtypes = [c.c_void_p, u32p, c.c_int64,
                                          c.c_int32]
        lib.hnsw_search.argtypes = [
            c.c_void_p, u32p, c.c_int64, c.c_int32, c.c_int32,
            np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
            c.c_int32]
        lib.hnsw_save.restype = c.c_int32
        lib.hnsw_save.argtypes = [c.c_void_p, c.c_char_p]
        lib.hnsw_load.restype = c.c_void_p
        lib.hnsw_load.argtypes = [c.c_char_p]
        _configured = True
    return lib


def available() -> bool:
    try:
        _lib()
        return True
    except RuntimeError:
        return False


def _as_rows(x, dist: str):
    dt = np.float32 if dist == "l2" else np.uint32
    a = np.ascontiguousarray(np.asarray(x), dtype=dt)
    if a.ndim == 1:
        a = a[None, :]
    # the C side works on 4-byte cells; view f32 rows as u32 for the ABI
    return a.view(np.uint32) if dt is np.float32 else a


class Hnsw:
    """HNSW index.  dim = signature length (sketch_size).

    Parameters mirror the reference's usage (datasketcher.rs:169-170:
    max_nb_connection=24, ef_construction=400).
    """

    def __init__(self, dim: int, capacity: int, dist: str = "hamming",
                 max_nb_connection: int = 24, ef_construction: int = 400,
                 seed: int = 0, _handle=None):
        if dist not in _DIST:
            raise ValueError(f"unknown distance {dist!r}")
        self.dim = int(dim)
        self.capacity = int(capacity)
        self.dist = dist
        lib = _lib()
        if _handle is not None:
            self._h = _handle
        else:
            self._h = lib.hnsw_create(
                _DIST[dist], self.dim, self.capacity,
                int(max_nb_connection), int(ef_construction), int(seed))
            if not self._h:
                raise ValueError("bad HNSW parameters")

    def __len__(self):
        return int(_lib().hnsw_size(self._h))

    def __del__(self):
        h = getattr(self, "_h", None)
        if h:
            try:
                _lib().hnsw_free(h)
            except Exception:
                pass
            self._h = None

    def parallel_insert(self, vecs, n_threads: int | None = None) -> int:
        """Insert rows of ``vecs``; returns total element count.
        Twin of hnsw_rs parallel_insert (datasketcher.rs:267-270)."""
        a = _as_rows(vecs, self.dist)
        if a.shape[1] != self.dim:
            raise ValueError(f"dim mismatch: {a.shape[1]} != {self.dim}")
        if n_threads is None:
            n_threads = min(8, os.cpu_count() or 1)
        out = _lib().hnsw_insert_batch(self._h, a, a.shape[0],
                                       int(n_threads))
        if out < 0:
            raise RuntimeError("HNSW capacity exceeded")
        return int(out)

    def insert(self, vec) -> int:
        return self.parallel_insert(vec, n_threads=1)

    def search(self, queries, k: int, ef_search: int = 64,
               n_threads: int | None = None):
        """k nearest neighbors: returns (ids int64[nq, k] (-1 pad),
        dists float32[nq, k])."""
        q = _as_rows(queries, self.dist)
        if q.shape[1] != self.dim:
            raise ValueError(f"dim mismatch: {q.shape[1]} != {self.dim}")
        nq = q.shape[0]
        ids = np.empty(nq * k, dtype=np.int64)
        d = np.empty(nq * k, dtype=np.float32)
        if n_threads is None:
            n_threads = min(8, os.cpu_count() or 1)
        _lib().hnsw_search(self._h, q, nq, int(k), int(ef_search), ids, d,
                           int(n_threads))
        return ids.reshape(nq, k), d.reshape(nq, k)

    def file_dump(self, path: str) -> None:
        """Persist the graph + vectors (role of hnsw_rs file_dump)."""
        if _lib().hnsw_save(self._h, path.encode()) != 0:
            raise OSError(f"cannot write {path}")

    @classmethod
    def load(cls, path: str) -> "Hnsw":
        lib = _lib()
        h = lib.hnsw_load(path.encode())
        if not h:
            raise OSError(f"cannot load HNSW from {path}")
        # re-read the header for dim/capacity/dist
        with open(path, "rb") as f:
            head = np.frombuffer(f.read(28), dtype=np.uint32)
        dist = {v: k for k, v in _DIST.items()}[int(head[2])]
        obj = cls.__new__(cls)
        obj.dim = int(head[3])
        obj.dist = dist
        obj._h = h
        with open(path, "rb") as f:
            f.seek(28 + 8)
            obj.capacity = int(np.frombuffer(f.read(8), dtype=np.int64)[0])
        return obj
