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


def main():
    rng = np.random.default_rng(42)
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

    bases = N_READS * READ_LEN
    mbases_s = bases / dt / 1e6
    out = {
        "metric": "probminhash_sketch_throughput_k8_m200",
        "value": round(mbases_s, 2),
        "unit": "Mbases/s",
        "vs_baseline": round(mbases_s / BASELINE_MBASES_PER_S, 3),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    sys.exit(main())
