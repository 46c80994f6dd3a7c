"""North-star benchmark: per-read ProbMinHash signatures (k=8, 200 sketches
per read) over an ONT-like read set — the workload the reference times at
51 s / 4.38 Gbases on an 8-core laptop (README.md:45, BASELINE.md).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "Mbases/s", "vs_baseline": N/85.9}

vs_baseline is the speedup over the reference's derived 85.9 Mbases/s.

The measured step is the full on-device pipeline: packed words -> canonical
8-mers -> wang hash -> per-read multiplicities -> ProbMinHash signatures
(200 slots) — steady state (post-compile), on whatever backend JAX selects
(the real TPU chip under the driver).
"""

import json
import sys
import time

import numpy as np

import kmerutils_tpu  # noqa: F401  (enables x64)
import jax

from kmerutils_tpu.base.sequence import pack_codes
from kmerutils_tpu.sketch.jaccard import hashed_kmers
from kmerutils_tpu.sketch import probminhash

BASELINE_MBASES_PER_S = 85.9  # 4.38 Gbases / 51 s (reference README.md:45)

K = 8
M = 200
READ_LEN = 6000       # FAB49164 mean read length ~5.9 kb
N_READS = 1024       # per batch
HEAVY_CAP = 1024  # legacy knob (kept for interface stability; kernel is exact)


def make_batch(rng):
    codes = rng.integers(0, 4, size=(N_READS, READ_LEN), dtype=np.uint8)
    lengths = np.full(N_READS, READ_LEN, dtype=np.int32)
    return pack_codes(codes, lengths)


def step(words, lengths):
    from kmerutils_tpu.base.sequence import ReadBatch
    batch = ReadBatch(words=words, lengths=lengths)
    items, valid = hashed_kmers(batch, K)
    sig, _, ovf = probminhash.probminhash_from_items(
        items, valid, M, heavy_cap=HEAVY_CAP)
    return sig, ovf


def bench_sketch(rng):
    batch = make_batch(rng)
    jstep = jax.jit(step)
    # compile + warmup; NB: on the tunneled axon backend block_until_ready
    # does not actually block, so completion is forced by host fetches
    sig, ovf = jstep(batch.words, batch.lengths)
    assert not bool(np.asarray(ovf).any()), "heavy_cap overflow in bench"
    _ = int(np.asarray(sig[0, 0]))

    # measure the one-element fetch latency so it can be subtracted
    t0 = time.perf_counter()
    _ = int(np.asarray(sig[0, 0]))
    t_fetch = time.perf_counter() - t0

    n_iter = 20
    t0 = time.perf_counter()
    for _ in range(n_iter):
        sig, _ = jstep(batch.words, batch.lengths)
    _ = int(np.asarray(sig[0, 0]))  # forces all queued steps to complete
    dt = (time.perf_counter() - t0 - t_fetch) / n_iter
    return N_READS * READ_LEN / dt / 1e6


def bench_stream_count(rng):
    """Device-side streaming counting rate (kmers/s and Mbases/s) through
    the Pallas merge-fold table — VERDICT #2's first missing metric.
    Synthetic genome-with-coverage batches (so folds see realistic
    duplicate mixes), batch shape = the CLI's quantized 1024x8192, table
    in the CLI's `--count` large-file configuration (no coords, 2^28
    capacity => LSM staging depth 2; round-1/early-round-2 versions of
    this metric used coords=True at 2^26, which is ~2x slower per fold —
    the `--unique` flavor)."""
    from kmerutils_tpu.count import stream

    K = 16
    genome = rng.integers(0, 4, size=20 << 20, dtype=np.uint8)  # 20 Mbase
    n_reads, rl = 1024, 8192
    starts = rng.integers(0, genome.size - rl, size=n_reads)
    codes = np.stack([genome[s : s + rl] for s in starts])
    batch = pack_codes(codes, np.full(n_reads, rl, np.int32))

    cap = 1 << 28
    prep = jax.jit(stream.batch_entries, static_argnames=("k", "coords"))
    # warmup: one full staged cycle (compiles prep, both stage-merge
    # shapes, the fold, and its compact branch)
    folder = stream.StagedFolder(
        stream.StreamCountTable.create(cap, wide=False, coords=False))
    for i in range(1 << folder.depth):
        arrs, live = prep(batch, k=K, read_num_offset=i * n_reads,
                          coords=False)
        folder.push(arrs, live)
    _ = int(np.asarray(folder.flush().used))

    folder = stream.StagedFolder(
        stream.StreamCountTable.create(cap, wide=False, coords=False))
    n_iter = 3 * (1 << folder.depth)      # whole staged cycles
    t0 = time.perf_counter()
    off = 0
    pending = []          # lag-1 sync per fold (the CLI's hint-fetch
    #                       pattern): bounds queued fold outputs in HBM
    for _ in range(n_iter):
        arrs, live = prep(batch, k=K, read_num_offset=off, coords=False)
        if folder.push(arrs, live):
            pending.append(folder.table.used)
            if len(pending) > 1:
                int(np.asarray(pending.pop(0)))
        off += n_reads
    used = int(np.asarray(folder.flush().used))  # forces completion
    dt = (time.perf_counter() - t0) / n_iter
    assert used > 0
    kmers = n_reads * (rl - K + 1)
    return kmers / dt / 1e6, n_reads * rl / dt / 1e6


def bench_e2e_file_sketch(rng):
    """End-to-end on-disk FASTQ -> per-read signatures, host ingest
    overlapped with device compute (VERDICT #2's second missing metric).
    A ~190 MB FASTQ is generated once and cached in /tmp."""
    import os
    from kmerutils_tpu.io import fastx
    from kmerutils_tpu.sketch.jaccard import Sketcher
    from kmerutils_tpu.sketch.params import (SeqSketcherParams, SketchAlgo,
                                             DataType)

    path = "/tmp/kmerutils_bench_e2e.fastq"
    n_reads, rl = 16000, 6000
    if not (os.path.exists(path)
            and os.path.getsize(path) > n_reads * rl * 2):
        bases = np.frombuffer(b"ACGT", np.uint8)[
            rng.integers(0, 4, size=(n_reads, rl))]
        with open(path, "wb") as f:
            qual = b"I" * rl
            for i in range(n_reads):
                f.write(b"@r%d\n" % i)
                f.write(bases[i].tobytes())
                f.write(b"\n+\n")
                f.write(qual)
                f.write(b"\n")
    params = SeqSketcherParams(kmer_size=K, sketch_size=M,
                               algo=SketchAlgo.PROB3A, data_t=DataType.DNA)
    sk = Sketcher(params=params)
    # warmup compile on one batch shape
    it = fastx.read_batches(path, batch_reads=1024, bucket=False)
    b0, _ = next(it)
    _ = np.asarray(sk.sketch_batch(b0))[0, 0]
    del it

    t0 = time.perf_counter()
    st = fastx.IngestStats()
    last = None
    for batch, idx in fastx.read_batches_overlapped(
            path, batch_reads=1024, stats=st, bucket=False,
            to_device=True):
        last = sk.sketch_batch(batch)
    _ = np.asarray(last)[0, 0]
    dt = time.perf_counter() - t0
    return st.n_bases / dt / 1e6


def bench_e2e_file_count(rng):
    """End-to-end on-disk FASTQ -> whole-file exact counts through the
    streaming table (the `parsefastq --count` pipeline), ingest
    overlapped.  A ~100 MB coverage FASTQ (reads sampled from a 20 Mbase
    genome) is generated once and cached in /tmp."""
    import os
    from kmerutils_tpu.io import fastx
    from kmerutils_tpu.count import stream

    path = "/tmp/kmerutils_bench_cov19.fastq"
    # ~19x coverage of a 5 Mbase genome: the dump (~5 M distinct) stays
    # small relative to the input, like real ONT counting — the result
    # transfer is part of the measured end-to-end time either way
    n_reads, rl = 16000, 6000
    if not (os.path.exists(path)
            and os.path.getsize(path) > n_reads * rl * 2):
        genome = rng.integers(0, 4, size=5 << 20, dtype=np.uint8)
        lut = np.frombuffer(b"ACGT", np.uint8)
        with open(path, "wb") as f:
            qual = b"I" * rl
            for i in range(n_reads):
                s = int(rng.integers(0, genome.size - rl))
                f.write(b"@r%d\n" % i)
                f.write(lut[genome[s : s + rl]].tobytes())
                f.write(b"\n+\n")
                f.write(qual)
                f.write(b"\n")
    K = 16
    cap = 1 << 26     # what the CLI auto-sizes for this ~100 MB file
    prep = jax.jit(stream.batch_entries, static_argnames=("k", "coords"))
    # warmup compile on the first batch shape
    folder = stream.StagedFolder(
        stream.StreamCountTable.create(cap, wide=False, coords=False))
    it = fastx.read_batches(path, bucket=False)
    b0, _ = next(it)
    arrs, live = prep(b0, k=K, read_num_offset=0, coords=False)
    folder.push(arrs, live)
    # warm the finalize program too (same static lo/hi/clamp + table
    # shape): cold, its aggregate graph compiles/loads INSIDE the timed
    # region and dominates the measurement
    stream.finalize(folder.flush(), min_count=2, count_clamp=255)
    del it
    folder = stream.StagedFolder(
        stream.StreamCountTable.create(cap, wide=False, coords=False))

    t0 = time.perf_counter()
    st = fastx.IngestStats()
    pending = []
    n_folds = 0
    for batch, idx in fastx.read_batches_overlapped(path, stats=st,
                                                    bucket=False,
                                                    to_device=True):
        arrs, live = prep(batch, k=K, read_num_offset=0, coords=False)
        if folder.push(arrs, live):
            # capacity is fixed here (no grow hints to sample) — the host
            # fetch only bounds queued fold outputs in HBM.  Each tunnel
            # fetch costs ~40 ms RTT, so sample every 4th fold with lag
            # (<= 8 live tables x 0.54 GB at 2^26)
            n_folds += 1
            pending.append(folder.table.used)
            if n_folds % 4 == 0:
                int(np.asarray(pending.pop(0)))
                pending = pending[-1:]
    # count_clamp=255 matches the CLI's default counter_size=8 dump
    # (saturating u8 counts, kmercount.rs counter_size) and ships counts
    # at 1 byte/record — the record transfer is finalize's main cost
    keys, counts, _, _, dropped = stream.finalize(folder.flush(),
                                                  min_count=2,
                                                  count_clamp=255)
    dt = time.perf_counter() - t0
    assert len(keys) > 0 and dropped == 0
    return st.n_bases / dt / 1e6


def bench_link_bandwidth():
    """Host<->device link bandwidth probe (MB/s up, down).  The e2e file
    metrics are bound by this link, which on the tunneled axon backend
    drifts 5-10x between sessions (measured 7-50 MB/s); reporting it lets
    a reader normalize the e2e numbers against infra drift.  Device-side
    rates (sketch/stream_count) are unaffected."""
    mb = 16
    a = np.zeros((mb << 20) // 4, np.int32)
    d = jax.device_put(a)          # warm the path
    _ = int(np.asarray(d[0]))
    t0 = time.perf_counter()
    d = jax.device_put(a)
    _ = int(np.asarray(d[0]))      # device_put is async; force arrival
    up = mb / (time.perf_counter() - t0)
    t0 = time.perf_counter()
    _ = np.asarray(d)
    down = mb / (time.perf_counter() - t0)
    return up, down


def main():
    rng = np.random.default_rng(42)
    link_up, link_down = bench_link_bandwidth()
    mbases_s = bench_sketch(rng)
    count_kmers_s, count_mbases_s = bench_stream_count(rng)
    e2e_mbases_s = bench_e2e_file_sketch(rng)
    e2e_count_mbases_s = bench_e2e_file_count(rng)
    out = {
        "metric": "probminhash_sketch_throughput_k8_m200",
        "value": round(mbases_s, 2),
        "unit": "Mbases/s",
        "vs_baseline": round(mbases_s / BASELINE_MBASES_PER_S, 3),
        "extra": {
            "stream_count_mkmers_s": round(count_kmers_s, 2),
            "stream_count_mbases_s": round(count_mbases_s, 2),
            "e2e_file_sketch_mbases_s": round(e2e_mbases_s, 2),
            "e2e_vs_baseline": round(e2e_mbases_s / BASELINE_MBASES_PER_S,
                                     3),
            "e2e_file_count_mbases_s": round(e2e_count_mbases_s, 2),
            "link_up_mb_s": round(link_up, 1),
            "link_down_mb_s": round(link_down, 1),
        },
    }
    print(json.dumps(out))


if __name__ == "__main__":
    sys.exit(main())
