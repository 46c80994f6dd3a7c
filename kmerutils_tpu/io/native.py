"""ctypes bindings for the native C++ FASTA/FASTQ parser (native/fastx.cpp).

Builds lazily with make on first use; falls back silently to the pure-python
parser when the toolchain or zlib is unavailable (callers check
``available()``).
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libktpnative.so")

_lib = None
_tried = False


def _load():
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                           capture_output=True)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    lib.ktp_open.restype = ctypes.c_void_p
    lib.ktp_open.argtypes = [ctypes.c_char_p]
    lib.ktp_close.argtypes = [ctypes.c_void_p]
    lib.ktp_next_block.restype = ctypes.c_long
    lib.ktp_next_block.argtypes = [
        ctypes.c_void_p,
        np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS"),
        ctypes.c_long,
        np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
        ctypes.c_long,
        np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
    ]
    try:
        lib.ktp_next_block_packed.restype = ctypes.c_long
        lib.ktp_next_block_packed.argtypes = [
            ctypes.c_void_p,
            np.ctypeslib.ndpointer(np.uint32, flags="C_CONTIGUOUS"),
            ctypes.c_long,
            np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
            ctypes.c_long,
            np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
            ctypes.c_int32,
        ]
    except AttributeError:
        pass  # stale .so without the packed entry point
    try:
        lib.ktp_next_block_qual.restype = ctypes.c_long
        lib.ktp_next_block_qual.argtypes = [
            ctypes.c_void_p,
            np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS"),
            ctypes.c_long,
            np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
            ctypes.c_long,
        ]
    except AttributeError:
        pass  # stale .so without the qual entry point
    try:
        lib.ktp_wavelet_build.restype = ctypes.c_long
        lib.ktp_wavelet_build.argtypes = [
            np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS"),
            ctypes.c_long,
            ctypes.c_int,
            np.ctypeslib.ndpointer(np.uint64, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.uint16, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.uint32, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
        ]
    except AttributeError:
        pass  # stale .so without the wavelet entry point
    _lib = lib
    return _lib


def wavelet_build(vals: np.ndarray, bit_len: int):
    """Build wavelet-matrix levels natively (native/wavelet.cpp).

    vals: uint8[n] symbols < 2**bit_len.  Returns
    (words u64[bit_len, nw], sub u16[bit_len, nw], sup u32[bit_len, nsup+1],
    zeros i64[bit_len]) in the _BitVecRank layout, or None when the native
    library (or its wavelet entry point) is unavailable.
    """
    lib = _load()
    if lib is None or not hasattr(lib, "ktp_wavelet_build"):
        return None
    vals = np.ascontiguousarray(vals, dtype=np.uint8)
    n = vals.size
    nw = (n + 63) // 64
    nsup = (nw + 7) // 8
    words = np.empty((bit_len, nw), dtype=np.uint64)
    sub = np.empty((bit_len, nw), dtype=np.uint16)
    sup = np.empty((bit_len, nsup + 1), dtype=np.uint32)
    zeros = np.empty(bit_len, dtype=np.int64)
    rc = lib.ktp_wavelet_build(vals, n, int(bit_len),
                               words.reshape(-1), sub.reshape(-1),
                               sup.reshape(-1), zeros)
    if rc != 0:
        return None
    return words, sub, sup, zeros


def iter_quality_blocks(path: str, block_reads: int = 10000,
                        cap_bytes: int = 64 << 20):
    """Yield (qual_bytes uint8[...], offsets int64[n+1]) blocks of RAW
    quality lines for EVERY read (no non-ACGT dropping — read numbering
    matches a full-file scan, the quality.rs:157-210 contract).  Requires
    the native parser with the qual entry point."""
    lib = _load()
    if lib is None or not hasattr(lib, "ktp_next_block_qual"):
        raise RuntimeError("native qual parser unavailable")
    h = lib.ktp_open(path.encode())
    if not h:
        raise OSError(f"cannot open {path}")
    try:
        quals = np.empty(cap_bytes, dtype=np.uint8)
        offsets = np.empty(block_reads + 1, dtype=np.int64)
        while True:
            n = lib.ktp_next_block_qual(h, quals, cap_bytes, offsets,
                                        block_reads)
            if n == 0:
                return
            if n < 0:
                raise ValueError(f"{path}: native quality parse failed "
                                 "(overflow or non-FASTQ)")
            yield quals[: offsets[n]].copy(), offsets[: n + 1].copy()
    finally:
        lib.ktp_close(h)


def available() -> bool:
    return _load() is not None


class NativeFastxReader:
    """Streaming reader yielding (codes uint8 concatenated, offsets int64)."""

    def __init__(self, path: str, block_reads: int = 10000,
                 block_bases: int = 1 << 26):
        lib = _load()
        if lib is None:
            raise RuntimeError("native parser unavailable")
        self._lib = lib
        self._h = lib.ktp_open(path.encode())
        if not self._h:
            raise FileNotFoundError(path)
        self.block_reads = block_reads
        self.block_bases = block_bases
        self.stats = np.zeros(4, dtype=np.int64)  # bases, bad_bases, bad_reads, records

    def __iter__(self):
        codes = np.empty(self.block_bases, dtype=np.uint8)
        offsets = np.empty(self.block_reads + 1, dtype=np.int64)
        while True:
            n = self._lib.ktp_next_block(
                self._h, codes, codes.size, offsets, self.block_reads,
                self.stats)
            if n < 0:
                raise RuntimeError("native parser error (bad format or "
                                   "single read larger than block_bases)")
            if n == 0:
                break
            yield codes[: offsets[n]].copy(), offsets[: n + 1].copy()
        self.close()

    def packed_blocks(self, n_threads: int | None = None):
        """Yield (words uint32 flat, word_offsets int64[n+1], lengths
        int32[n]) — reads already in the device 16-bases-per-u32 word
        layout (ReadBatch rows minus the per-batch padding), encoded by
        ``n_threads`` C++ threads.  Dropped (non-ACGT) reads never appear.
        """
        lib = self._lib
        if not hasattr(lib, "ktp_next_block_packed"):
            raise RuntimeError("native library lacks the packed entry "
                               "point; rebuild with `make -C native`")
        if n_threads is None:
            n_threads = min(8, os.cpu_count() or 1)
        cap_words = self.block_bases // 16 + self.block_reads  # per-read pad
        words = np.empty(cap_words, dtype=np.uint32)
        woff = np.empty(self.block_reads + 1, dtype=np.int64)
        lens = np.empty(self.block_reads, dtype=np.int32)
        while True:
            n = lib.ktp_next_block_packed(
                self._h, words, cap_words, woff, lens, self.block_reads,
                self.stats, int(n_threads))
            if n < 0:
                raise RuntimeError("native parser error (bad format or "
                                   "single read larger than block_bases)")
            if n == 0:
                break
            yield (words[: woff[n]].copy(), woff[: n + 1].copy(),
                   lens[:n].copy())
        self.close()

    def close(self):
        if self._h:
            self._lib.ktp_close(self._h)
            self._h = None


def iter_clean_read_codes(path: str, block_reads: int = 10000):
    """Yield per-read 2-bit code arrays via the native parser."""
    r = NativeFastxReader(path, block_reads)
    for codes, offsets in r:
        for i in range(len(offsets) - 1):
            yield codes[offsets[i] : offsets[i + 1]]
