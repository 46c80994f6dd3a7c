"""Phase breakdown of the end-to-end file->counts pipeline (bench.py's
e2e_file_count workload): where does wall time go between host parse,
upload, prep+fold dispatch, sync stalls, and finalize?

Run:  PYTHONPATH=/root/repo:$PYTHONPATH python tools/profile_e2e_count.py
(uses the cached /tmp/kmerutils_bench_cov48.fastq; generate by running
bench.py once).
"""

import time

import numpy as np

import kmerutils_tpu  # noqa: F401
import jax

from kmerutils_tpu.io import fastx
from kmerutils_tpu.count import stream

PATH = "/tmp/kmerutils_bench_cov48.fastq"
K = 16
CAP = 1 << 26


def run(label, overlapped):
    prep = jax.jit(stream.batch_entries, static_argnames=("k", "coords"))
    folder = stream.StagedFolder(
        stream.StreamCountTable.create(CAP, wide=False, coords=False))
    # warm compile on first batch
    it = fastx.read_batches(PATH, bucket=False)
    b0, _ = next(it)
    arrs, live = prep(b0, k=K, read_num_offset=0, coords=False)
    folder.push(arrs, live)
    _ = int(np.asarray(folder.flush().used))
    del it

    folder = stream.StagedFolder(
        stream.StreamCountTable.create(CAP, wide=False, coords=False))
    st = fastx.IngestStats()
    t0 = time.perf_counter()
    t_ingest = t_put = t_dispatch = t_sync = 0.0
    n_batches = 0
    pending = []
    src = (fastx.read_batches_overlapped(PATH, stats=st, bucket=False)
           if overlapped else fastx.read_batches(PATH, stats=st,
                                                 bucket=False))
    t = time.perf_counter()
    for batch, idx in src:
        t2 = time.perf_counter(); t_ingest += t2 - t
        batch = jax.device_put(batch)
        t3 = time.perf_counter(); t_put += t3 - t2
        arrs, live = prep(batch, k=K, read_num_offset=0, coords=False)
        s0 = 0.0
        if folder.push(arrs, live):
            pending.append(folder.table.used)
            if len(pending) > 2:
                t4 = time.perf_counter()
                int(np.asarray(pending.pop(0)))
                s0 = time.perf_counter() - t4
                t_sync += s0
        t_dispatch += time.perf_counter() - t3 - s0
        n_batches += 1
        t = time.perf_counter()
    t5 = time.perf_counter()
    keys, counts, _, _, dropped = stream.finalize(folder.flush(),
                                                  min_count=2,
                                                  count_clamp=255)
    t_final = time.perf_counter() - t5
    dt = time.perf_counter() - t0
    print(f"{label}: {st.n_bases/dt/1e6:7.2f} Mb/s  total {dt:6.2f}s  "
          f"batches {n_batches}")
    print(f"  ingest-wait {t_ingest:6.2f}s  device_put {t_put:6.2f}s  "
          f"dispatch {t_dispatch:6.2f}s  sync {t_sync:6.2f}s  "
          f"finalize {t_final:6.2f}s  "
          f"(records {len(keys)}, dropped {dropped})")


def main():
    run("sequential", overlapped=False)
    run("overlapped", overlapped=True)


if __name__ == "__main__":
    main()
