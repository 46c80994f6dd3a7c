"""Quality handling: Phred remap to 3 bits + wavelet-matrix storage.

Capability twin of /root/reference/src/quality/quality.rs:

* ``remap_quality8`` — the exact remap (quality.rs:34-43): q > 0x37 -> 7,
  q < 0x25 -> 0, else 1 + floor((q - 0x25) * 6 / 18);
* ``quality_to_proba`` (quality.rs:19-21);
* :class:`WaveletMatrix` — succinct rank/access structure over the 3-bit
  remapped symbols (the reference uses the wavelet-matrix crate; memory is
  ~3 bits/symbol + o(n) rank directories vs 8 bits raw — the 0.56x figure,
  quality.rs:4-5).  Implemented from scratch over numpy uint64 blocks.
* :class:`QSequenceWM` / :class:`QSequenceRaw` with interconversion
  (quality.rs:74-155) and the FASTQ quality loader ``load_quality_wm``
  (quality.rs:157-210).
"""

from __future__ import annotations

import dataclasses

import numpy as np


def quality_to_proba(q, qmin: int = 0x25):
    """Probability of error from quality byte (quality.rs:19-21)."""
    q = np.asarray(q, dtype=np.float64)
    return np.power(10.0, (qmin - q) / 10.0)


def _remap_lut() -> np.ndarray:
    q = np.arange(256, dtype=np.int32)
    mid = 1 + ((np.minimum(q, 0x37) - 0x25) * 6 // 18)
    return np.where(q > 0x37, 7, np.where(q < 0x25, 0, mid)).astype(np.uint8)


_REMAP_LUT = _remap_lut()


def remap_quality8(q) -> np.ndarray:
    """Vectorized exact twin of quality.rs:34-43 (256-entry table; the
    arithmetic form ran at ~18 MB/s through numpy's int32 floor-divide)."""
    return _REMAP_LUT[np.asarray(q, dtype=np.uint8)]


class _BitVecRank:
    """Bit vector with O(1) rank1 via a two-level directory: u32 cumulative
    count per 8-word (512-bit) superblock + u16 within-superblock prefix per
    word — ~1.19 bits of overhead per data bit (the compactness behind the
    reference's 0.56x memory figure, quality.rs:4-5)."""

    __slots__ = ("n", "words", "sup", "sub")

    def __init__(self, bits: np.ndarray):
        # bits: bool[n]
        self.n = bits.size
        pad = (-bits.size) % 64
        b = np.concatenate([bits, np.zeros(pad, dtype=bool)])
        w = np.packbits(b.reshape(-1, 8)[:, ::-1], axis=1)  # LSB-first per byte
        self.words = w.reshape(-1, 8).view(np.uint64).ravel()
        pops = self._popcounts(self.words)
        nw = self.words.size
        nsup = -(-nw // 8)
        padded = np.zeros(nsup * 8, dtype=np.int64)
        padded[:nw] = pops
        per_sup = padded.reshape(nsup, 8)
        within = np.cumsum(per_sup, axis=1) - per_sup  # prefix before word
        # the prefix within a 512-bit superblock reaches 7*64 = 448: u16
        # (u8 overflowed at dense blocks — ranks silently wrapped mod 256)
        self.sub = within.astype(np.uint16).ravel()[:nw]
        sup_tot = per_sup.sum(axis=1)
        self.sup = np.concatenate([[0], np.cumsum(sup_tot)]).astype(np.uint32)

    @classmethod
    def _from_parts(cls, n: int, words: np.ndarray, sup: np.ndarray,
                    sub: np.ndarray) -> "_BitVecRank":
        """Adopt directories built elsewhere (native/wavelet.cpp)."""
        bv = cls.__new__(cls)
        bv.n = n
        bv.words = words
        bv.sup = sup
        bv.sub = sub
        return bv

    @staticmethod
    def _popcounts(words):
        x = words.copy()
        x = x - ((x >> np.uint64(1)) & np.uint64(0x5555555555555555))
        x = (x & np.uint64(0x3333333333333333)) + ((x >> np.uint64(2)) & np.uint64(0x3333333333333333))
        x = (x + (x >> np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
        return ((x * np.uint64(0x0101010101010101)) >> np.uint64(56)).astype(np.int64)

    def rank1(self, pos) -> np.ndarray:
        """#ones in [0, pos) — vectorized over pos."""
        pos = np.asarray(pos, dtype=np.int64)
        wi = pos >> 6
        off = pos & 63
        in_range = wi < len(self.words)
        wic = np.minimum(wi, len(self.words) - 1)
        head = self.sup[np.minimum(wi >> 3, len(self.sup) - 1)].astype(np.int64) \
            + self.sub[wic]
        # NB: both np.where branches evaluate, so the shift amount must stay
        # in [0, 63] even when off == 0 — a shift BY 64 is C-level UB whose
        # result varies with numpy's SIMD/scalar dispatch (it made this rank
        # depend on heap alignment, i.e. on whatever ran earlier in the
        # process)
        shift = (np.uint64(64) - off.astype(np.uint64)) & np.uint64(63)
        mask = np.where(off == 0, np.uint64(0), (~np.uint64(0)) >> shift)
        partial = self._popcounts(np.atleast_1d(self.words[wic] & mask))
        # sup[-1] is the cumulative popcount over all words == total ones;
        # pos at/most n with an out-of-range word index means "count everything"
        total = int(self.sup[-1]) if len(self.words) else 0
        return np.where(in_range, head + partial, total)

    def get(self, pos) -> np.ndarray:
        pos = np.asarray(pos, dtype=np.int64)
        return ((self.words[pos >> 6] >> (pos & 63).astype(np.uint64)) & np.uint64(1)).astype(bool)


class WaveletMatrix:
    """Wavelet matrix over small-alphabet symbols (default 3 bits).

    Supports access(i), rank(symbol, pos), len — the operations the quality
    server needs (quality.rs:106-117 decompress via lookup; rank kept for
    parity with the wavelet-matrix crate's API).
    """

    # below this the numpy build's fixed overhead beats the ctypes round trip
    _NATIVE_MIN = 1 << 14

    def __init__(self, values, bit_len: int = 3):
        v = np.asarray(values)
        self.n = v.size
        self._bit_len = bit_len
        self.levels: list[_BitVecRank] = []
        self.zeros: list[int] = []
        if v.size >= self._NATIVE_MIN and bit_len <= 8:
            from ..io import native
            parts = native.wavelet_build(
                v if v.dtype == np.uint8 else v.astype(np.uint8), bit_len)
            if parts is not None:
                words, sub, sup, zeros = parts
                for d in range(bit_len):
                    self.levels.append(_BitVecRank._from_parts(
                        v.size, words[d], sup[d], sub[d]))
                    self.zeros.append(int(zeros[d]))
                return
        cur = v.astype(np.uint64)
        for lvl in range(bit_len - 1, -1, -1):
            bits = ((cur >> np.uint64(lvl)) & np.uint64(1)).astype(bool)
            bv = _BitVecRank(bits)
            self.levels.append(bv)
            self.zeros.append(int((~bits).sum()))
            # stable partition: zeros first, ones after
            cur = np.concatenate([cur[~bits], cur[bits]])

    def __len__(self):
        return self.n

    def bit_len(self) -> int:
        return self._bit_len

    def lookup(self, idx) -> np.ndarray:
        """access: symbol at position(s) idx."""
        idx = np.atleast_1d(np.asarray(idx, dtype=np.int64)).copy()
        out = np.zeros(idx.shape, dtype=np.uint64)
        for d, bv in enumerate(self.levels):
            bit = bv.get(idx)
            out |= bit.astype(np.uint64) << np.uint64(self._bit_len - 1 - d)
            r1 = bv.rank1(idx)
            idx = np.where(bit, self.zeros[d] + r1, idx - r1)
        return out

    def access_all(self) -> np.ndarray:
        return self.lookup(np.arange(self.n))

    def rank(self, symbol: int, pos: int) -> int:
        """#occurrences of symbol in [0, pos)."""
        lo, hi = 0, int(pos)
        for d, bv in enumerate(self.levels):
            bit = (symbol >> (self._bit_len - 1 - d)) & 1
            rlo = int(np.ravel(bv.rank1(lo))[0])
            rhi = int(np.ravel(bv.rank1(hi))[0])
            if bit:
                lo = self.zeros[d] + rlo
                hi = self.zeros[d] + rhi
            else:
                lo = lo - rlo
                hi = hi - rhi
        return hi - lo

    def memory_bits(self) -> int:
        return sum(bv.words.size * 64 + bv.sup.size * 32 + bv.sub.size * 16
                   for bv in self.levels)


@dataclasses.dataclass
class QSequenceRaw:
    """quality.rs:129-143."""
    read_num: int
    qseq: np.ndarray  # remapped u8 values

    def to_wm(self) -> "QSequenceWM":
        return QSequenceWM(self.read_num, raw_remapped=self.qseq)


class QSequenceWM:
    """quality.rs:74-122: wavelet-matrix compressed quality of one read."""

    def __init__(self, read_num: int, qv=None, raw_remapped=None):
        self.read_num = read_num
        if raw_remapped is None:
            raw_remapped = remap_quality8(np.asarray(qv, dtype=np.uint8))
        self.qseq = WaveletMatrix(raw_remapped, bit_len=3)

    def __len__(self):
        return len(self.qseq)

    def decompress(self) -> QSequenceRaw:
        return QSequenceRaw(self.read_num, self.qseq.access_all().astype(np.uint8))

    def bit_len(self) -> int:
        return self.qseq.bit_len()


class _StoreReadQseq:
    """Adapter giving one read of a :class:`QualityStore` the same lookup
    surface as a per-read WaveletMatrix (what QualityServer uses)."""

    __slots__ = ("_store", "_base", "_n")

    def __init__(self, store: "QualityStore", base: int, n: int):
        self._store = store
        self._base = base
        self._n = n

    def __len__(self):
        return self._n

    def lookup(self, idx):
        idx = np.asarray(idx, dtype=np.int64)
        return self._store.wm.lookup(idx + self._base)

    def bit_len(self):
        return self._store.wm.bit_len()


class _StoreReadView:
    """Duck-type of :class:`QSequenceWM` backed by a QualityStore slice."""

    __slots__ = ("read_num", "qseq", "_n")

    def __init__(self, store: "QualityStore", read_num: int):
        base = int(store.offsets[read_num])
        self._n = int(store.offsets[read_num + 1]) - base
        self.read_num = read_num
        self.qseq = _StoreReadQseq(store, base, self._n)

    def __len__(self):
        return self._n

    def decompress(self) -> QSequenceRaw:
        return QSequenceRaw(
            self.read_num,
            self.qseq.lookup(np.arange(self._n)).astype(np.uint8))

    def bit_len(self):
        return self.qseq.bit_len()


class QualityStore:
    """ALL reads' remapped qualities in ONE wavelet matrix + offsets.

    Batched alternative to a list of per-read :class:`QSequenceWM` (the
    reference holds one WaveletMatrix per read, quality.rs:74-122): the
    build is a single vectorized pass over the whole file's symbols
    instead of ~20 tiny numpy calls per read, and rank directories
    amortize across reads.  Index it like the per-read list — views expose
    the same decompress()/qseq.lookup surface, so QualityServer works
    unchanged.
    """

    def __init__(self, remapped: np.ndarray, offsets: np.ndarray):
        self.wm = WaveletMatrix(remapped, bit_len=3)
        self.offsets = np.asarray(offsets, np.int64)

    def __len__(self):
        return len(self.offsets) - 1

    def __getitem__(self, read_num: int) -> _StoreReadView:
        if not 0 <= read_num < len(self):
            raise IndexError(read_num)
        return _StoreReadView(self, read_num)

    def memory_bits(self) -> int:
        return self.wm.memory_bits() + self.offsets.size * 64


def load_quality_store(fname: str, max_reads: int | None = None
                       ) -> QualityStore:
    """FASTQ -> :class:`QualityStore` (batched twin of
    :func:`load_quality_wm`; one wavelet build over the concatenated
    remapped qualities)."""
    from ..io import fastx, native
    chunks = []
    lens = [0]
    if native.available() and hasattr(native._load(), "ktp_next_block_qual"):
        try:
            done = False
            for quals, offsets in native.iter_quality_blocks(fname):
                take = len(offsets) - 1
                if max_reads is not None:
                    take = min(take, max_reads - (len(lens) - 1))
                    done = take < len(offsets) - 1
                chunks.append(remap_quality8(quals[:offsets[take]]))
                lens.extend(np.diff(offsets[:take + 1]).tolist())
                if done:
                    break
            return QualityStore(
                np.concatenate(chunks) if chunks else np.zeros(0, np.uint8),
                np.cumsum(np.asarray(lens, np.int64)))
        except ValueError:
            chunks, lens = [], [0]    # wrapped/odd FASTQ: python fallback
    for i, (_rid, _seq, qual) in enumerate(fastx.iter_fastx(fname)):
        if qual is None:
            raise ValueError("FASTA file has no qualities")
        q = np.frombuffer(qual, dtype=np.uint8)
        chunks.append(remap_quality8(q))
        lens.append(q.size)
        if max_reads is not None and i + 1 >= max_reads:
            break
    return QualityStore(
        np.concatenate(chunks) if chunks else np.zeros(0, np.uint8),
        np.cumsum(np.asarray(lens, np.int64)))


def load_quality_wm(fname: str, max_reads: int | None = None):
    """FASTQ quality loader (quality.rs:157-210): remap + wavelet compress
    every read's quality string.

    Uses the native C++ parser's quality path when built (4-line FASTQ,
    which is what the native parser handles); wrapped records fall back to
    the python parser.
    """
    from ..io import fastx, native
    out = []
    if native.available() and hasattr(native._load(), "ktp_next_block_qual"):
        try:
            for quals, offsets in native.iter_quality_blocks(fname):
                for r in range(len(offsets) - 1):
                    out.append(QSequenceWM(
                        len(out), qv=quals[offsets[r]: offsets[r + 1]]))
                    if max_reads is not None and len(out) >= max_reads:
                        return out
            return out
        except ValueError:
            out = []          # wrapped/odd FASTQ: python fallback below
    for i, (_rid, _seq, qual) in enumerate(fastx.iter_fastx(fname)):
        if qual is None:
            raise ValueError("FASTA file has no qualities")
        out.append(QSequenceWM(i, qv=np.frombuffer(qual, dtype=np.uint8)))
        if max_reads is not None and len(out) >= max_reads:
            break
    return out
