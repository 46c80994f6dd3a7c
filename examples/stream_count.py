"""Library-API example: stream a FASTQ through the device-resident count
table and print the most frequent canonical 16-mers.

The CLI equivalent is ``python -m kmerutils_tpu.cli.parsefastq -f <file>
kmer --count -s 16``; this shows the pieces (reference workflow:
/root/reference/src/bin/parsefastq.rs:214-248 + kmercount.rs:881-974).

Usage: python examples/stream_count.py <fastq> [k]
"""

import sys

import numpy as np

import kmerutils_tpu  # noqa: F401  (x64 + compilation cache)
import jax

from kmerutils_tpu.io import fastx
from kmerutils_tpu.count import stream


def main():
    path = sys.argv[1]
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    folder = stream.StagedFolder(
        stream.StreamCountTable.create(1 << 22, wide=k > 16, coords=False))
    prep = jax.jit(stream.batch_entries, static_argnames=("k", "coords"))
    st = fastx.IngestStats()
    offset = 0
    for batch, idx in fastx.read_batches_overlapped(path, stats=st,
                                                    bucket=False,
                                                    to_device=True):
        arrs, live = prep(batch, k=k, read_num_offset=offset, coords=False)
        folder.push(arrs, live)
        offset += len(idx)
    keys, counts, _, _, dropped = stream.finalize(folder.flush(),
                                                  min_count=2)
    print(f"{st.n_reads} reads, {st.n_bases} bases, "
          f"{len(keys)} kmers with count >= 2"
          + (f" ({dropped} entries dropped — raise capacity)" if dropped
             else ""))
    top = np.argsort(counts)[::-1][:10]
    from kmerutils_tpu.base.kmertypes import Kmer16b32bit
    for i in top:
        v = int(keys[i])
        s = (Kmer16b32bit(v).get_uncompressed_kmer().decode()
             if k == 16 else hex(v))
        print(f"  {s}  x{int(counts[i])}")


if __name__ == "__main__":
    main()
