"""Read statistics: length distribution + per-percent base composition.

Capability twin of /root/reference/src/statutils.rs (ReadBaseDistribution):

* a read-length histogram (the reference uses hdrhistogram with precision
  1..5; here exact int64 bincounts — a strict upgrade with the same dump),
* the 101 x 4 matrix: row = percentage 0..100, column = A/C/G/T, cell = the
  number (normalized to fraction) of reads whose base b occupies round(100 *
  count_b / len) percent of the read (statutils.rs:241-251),
* ascii dumps "bases.histo" (101 lines of 4 values, statutils.rs:84-113) and
  "readlen.histo" (quantile points, :118-190) consumed by the Julia
  companion.

Computation is batched on device: base counts via one segmented one-hot sum
per batch; merging across batches is plain addition (the rayon reduction of
get_base_count_par, :276-347).
"""

from __future__ import annotations

import dataclasses
import functools

import numpy as np
import jax
import jax.numpy as jnp

from .base.sequence import ReadBatch
from .base import alphabet


@jax.jit
def _batch_base_counts(words, lengths):
    """One fused device program per batch shape: unpack + masked one-hot
    base counts.  Dispatching this eagerly op-by-op costs seconds per batch
    on a remote-attached device; jitted it is one round trip.  Lengths ride
    along as a 5th column so the host needs ONE fetch per batch, not two."""
    batch = ReadBatch(words=words, lengths=lengths)
    counts = alphabet.base_counts(batch.codes(), batch.valid_mask())
    return jnp.concatenate(
        [counts, lengths[:, None].astype(counts.dtype)], axis=1)


@dataclasses.dataclass
class ReadBaseDistribution:
    acgt_distribution: np.ndarray  # [101, 4] float64 (counts until normalize)
    read_lengths: np.ndarray       # growing int64 histogram over lengths
    upper_histo: int
    histo_out: int = 0
    non_acgt: int = 0
    n_reads: int = 0
    # device results not yet folded into the host accumulators: record_batch
    # consumes with a one-batch LAG so the host fetch reads an already-
    # finished result instead of draining the device pipeline behind the
    # current batch (in-order execution would stall every queued fold)
    _pending: list = dataclasses.field(default_factory=list, repr=False)

    @staticmethod
    def new(readmaxsize: int = 10_000_000) -> "ReadBaseDistribution":
        return ReadBaseDistribution(
            acgt_distribution=np.zeros((101, 4), dtype=np.float64),
            read_lengths=np.zeros(0, dtype=np.int64),
            upper_histo=readmaxsize)

    # ------------------------------------------------------------------
    def record_batch(self, batch: ReadBatch) -> None:
        self._pending.append(_batch_base_counts(batch.words, batch.lengths))
        if len(self._pending) > 1:
            self._consume(self._pending.pop(0))

    def finish(self) -> "ReadBaseDistribution":
        """Drain pending device results; call after the last record_batch
        (the dumps and normalized_distribution do so themselves)."""
        while self._pending:
            self._consume(self._pending.pop(0))
        return self

    def _consume(self, dev) -> None:
        fetched = np.asarray(dev)
        counts, lengths = fetched[:, :4], fetched[:, 4]
        real = lengths > 0            # zero-length rows are batch padding
        counts, lengths = counts[real], lengths[real]
        if lengths.size == 0:
            return
        self.n_reads += len(lengths)
        # length histogram
        lmax = int(lengths.max(initial=0))
        over = lengths > self.upper_histo
        self.histo_out += int(over.sum())
        keep = lengths[~over]
        if keep.size:
            if self.read_lengths.size <= lmax:
                grown = np.zeros(lmax + 1, dtype=np.int64)
                grown[: self.read_lengths.size] = self.read_lengths
                self.read_lengths = grown
            np.add.at(self.read_lengths, keep, 1)
        # per-percent base occupancy (statutils.rs:245-250)
        pct = np.rint(100.0 * counts / np.maximum(lengths, 1)[:, None]).astype(int)
        pct = np.clip(pct, 0, 100)
        for j in range(4):
            np.add.at(self.acgt_distribution[:, j], pct[:, j], 1.0)

    def merge(self, other: "ReadBaseDistribution") -> None:
        self.finish()
        other.finish()
        self.acgt_distribution += other.acgt_distribution
        self.histo_out += other.histo_out
        self.non_acgt += other.non_acgt
        self.n_reads += other.n_reads
        L = max(self.read_lengths.size, other.read_lengths.size)
        grown = np.zeros(L, dtype=np.int64)
        grown[: self.read_lengths.size] += self.read_lengths
        grown[: other.read_lengths.size] += other.read_lengths
        self.read_lengths = grown

    # ------------------------------------------------------------------
    def normalized_distribution(self) -> np.ndarray:
        """Fractions-of-reads matrix (the end state after get_base_count_par's
        normalization by #reads, statutils.rs:276-347)."""
        self.finish()
        if self.n_reads == 0:
            return self.acgt_distribution.copy()
        return self.acgt_distribution / self.n_reads

    def ascii_dump_acgt_distribution(self, name: str) -> None:
        m = self.normalized_distribution()
        with open(name, "w") as f:
            for i in range(m.shape[0]):
                f.write(f"{m[i, 0]} {m[i, 1]}  {m[i, 2]}  {m[i, 3]} \n")

    def ascii_dump_readlen_distribution(self, name: str,
                                        nb_points: int = 1000) -> None:
        """Quantile-sampled (length, nb_reads) points (statutils.rs:118-190)."""
        self.finish()
        total = int(self.read_lengths.sum())
        if total == 0:
            raise ValueError("empty read-length histogram")
        nbslot = max(total // 100, 1)
        cum = np.cumsum(self.read_lengths)
        # value_at_quantile(q): smallest length whose cumulative count >= q*total
        qs = np.arange(nbslot + 1) / nbslot
        readsize = np.searchsorted(cum, qs * total, side="left")
        readsize = np.clip(readsize, 0, self.read_lengths.size - 1)
        lines = []
        first_i = 0
        current_i = 0
        for j in range(nb_points):
            threshold = (total * j) // nb_points
            while current_i < nbslot and readsize[current_i] < threshold:
                current_i += 1
            if current_i < nbslot and current_i > first_i:
                nb_in_slot = ((current_i - first_i) * total) // nbslot
                lines.append((int(readsize[current_i]), nb_in_slot))
            first_i = current_i
        with open(name, "w") as f:
            for absc, nb in lines:
                f.write(f"{absc}  {nb} \n")


def get_base_count(batches, readmaxsize: int = 10_000_000) -> ReadBaseDistribution:
    """Driver over an iterable of ReadBatch — the get_base_count_par role."""
    dist = ReadBaseDistribution.new(readmaxsize)
    for b in batches:
        dist.record_batch(b)
    return dist.finish()
