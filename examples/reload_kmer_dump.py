"""Reload a multiple-kmer dump — twin of the reference's
examples/reloadkmermulti.rs:36-73 (KmerCountReload::load_multiple_kmers_from_file).

Usage: python examples/reload_kmer_dump.py <file.multi_kmer.bin>
"""

import sys

from kmerutils_tpu.io import formats


def main(path):
    k, counts = formats.read_multiple_kmer_dump(path)
    print(f"kmer size {k}, {len(counts)} multiple kmers")
    hist = {}
    for c in counts.values():
        hist[c] = hist.get(c, 0) + 1
    for c in sorted(hist)[:20]:
        print(f"  count {c}: {hist[c]} kmers")


if __name__ == "__main__":
    main(sys.argv[1])
