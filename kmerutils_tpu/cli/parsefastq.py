"""parsefastq CLI — base statistics + kmer counting / unicity.

Capability twin of /root/reference/src/bin/parsefastq.rs:45-256, same flag
vocabulary:

    parsefastq -f <file> [-b nb_bits] kmer (--count | --unique)
               [-s kmer_size] [-t n_threads] [-c counter_size]
    parsefastq -f <file> ret -b <base>

Always computes base/readlen statistics ("bases.histo", "readlen.histo",
statutils.rs dumps).  Counting writes <file>.multi_kmer.bin in the
reference's multiple-kmer format; unicity writes <file>.once_kmer.bin with
coordinates.  ``-t`` is accepted for interface parity (device batching
replaces host threads).
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np


def build_parser():
    p = argparse.ArgumentParser(prog="parsefastq")
    p.add_argument("-f", "--file", required=True, dest="filename")
    p.add_argument("-b", "--bits", type=int, default=2, dest="nb_bits",
                   help="bits per base for in-memory packing (2|4|8)")
    p.add_argument("--batch-reads", type=int, default=10000)
    sub = p.add_subparsers(dest="cmd")
    km = sub.add_parser("kmer", help="kmer counting")
    g = km.add_mutually_exclusive_group(required=True)
    g.add_argument("--count", action="store_true")
    g.add_argument("--unique", action="store_true")
    km.add_argument("-s", "--size", type=int, default=16, dest="kmer_size")
    km.add_argument("-t", "--threads", type=int, default=1,
                    help="accepted for parity; batching replaces threads")
    km.add_argument("-c", "--counter", type=int, default=8, dest="counter_size",
                    help="bits per count in the dump (8 or 16)")
    km.add_argument("--capacity", type=int, default=1 << 25,
                    help="device count-table capacity in distinct kmers "
                         "(the reference's cuckoo capacity role, "
                         "kmercount.rs:297-307)")
    ret = sub.add_parser("ret", help="return times (reserved)")
    ret.add_argument("-b", "--base", type=str, default="A")
    return p


def main(argv=None):
    import kmerutils_tpu  # noqa: F401
    from ..io import fastx
    from ..count import exact
    from ..io import formats
    from .. import stats

    args = build_parser().parse_args(argv)
    t0 = time.time()
    st = fastx.IngestStats()
    dist = stats.ReadBaseDistribution.new()

    if args.cmd == "kmer":
        k = args.kmer_size
        if k == 15 or k > 32:
            print(f"kmer size {k} unsupported (14-max u32 / 16 / 17..32)",
                  file=sys.stderr)
            return 1
        import jax
        # device-resident streaming accumulation: batches merge on device,
        # records transfer to host once (parse-fastq's cuckoo-capacity role)
        import jax.numpy as jnp
        # 32-bit table keys for k <= 16 (canonical kmers fit u32): the
        # capacity-sized table sorts run ~1.4x faster than u64-keyed
        key_dtype = jnp.uint32 if k <= 16 else jnp.uint64
        table = exact.DeviceCountTable.create(args.capacity, key_dtype)
        inputs_fn = jax.jit(exact.batch_table_inputs, static_argnames=("k",))
        offset = 0
        for batch, idx in fastx.read_batches(args.filename,
                                             batch_reads=args.batch_reads,
                                             stats=st, bucket=False):
            dist.record_batch(batch)
            keys, counts, coord = inputs_fn(batch, k=k,
                                            read_num_offset=offset)
            table = exact.table_update(table, keys, counts, coord)
            offset += len(idx)  # real reads only (batch may be shape-padded)
        dropped = int(np.asarray(table.n_dropped))
        if dropped:
            print(f"WARNING: table capacity {args.capacity} exceeded; "
                  f"{dropped} distinct kmers dropped (raise --capacity)",
                  file=sys.stderr)
        if args.count:
            keys, counts, frn, fps = exact.table_finalize(table, min_count=2)
            order = np.argsort((frn.astype(np.uint64) << np.uint64(32))
                               | fps, kind="stable")  # scan order
            out = args.filename + ".multi_kmer.bin"
            bpc = 1 if args.counter_size <= 8 else 2
            n = formats.write_multiple_kmer_dump(
                out, k, keys[order], counts[order], bytes_per_count=bpc)
            print(f"dumped {n} multiple kmers to {out}")
        else:
            keys, counts, frn, fps = exact.table_finalize(table, 1, 1)
            order = np.argsort((frn.astype(np.uint64) << np.uint64(32))
                               | fps, kind="stable")
            out = args.filename + ".once_kmer.bin"
            formats.write_unique_kmer_dump(out, k, keys[order], frn[order],
                                           fps[order])
            print(f"dumped {len(keys)} unique kmers to {out}")
    else:
        for batch, idx in fastx.read_batches(args.filename,
                                             batch_reads=args.batch_reads,
                                             stats=st, bucket=False):
            dist.record_batch(batch)

    dist.non_acgt = st.nb_bad_bases
    dist.ascii_dump_acgt_distribution("bases.histo")
    try:
        dist.ascii_dump_readlen_distribution("readlen.histo")
    except ValueError:
        pass
    print(f"reads: {st.n_reads}  bases: {st.n_bases}  "
          f"bad reads dropped: {st.nb_bad_read}  elapsed: {time.time()-t0:.1f}s")
    return 0


if __name__ == "__main__":
    sys.exit(main())
