"""Stage-by-stage profile of the streaming-count fold on the live TPU.

Times (queued iterations + one-element fetch, per CLAUDE.md timing rules):
  prep_canon   canonical_kmers alone
  prep_sort    batch_entries (canonical + flat sort)
  fold_empty   fold into a near-empty table (dead-tile skip regime)
  fold_60pct   fold at realistic occupancy (includes auto-compact if the
               headroom threshold is crossed)
  compact      aggregate_fold_i32 at that occupancy
  legacy_merge the retired generic merge (merge_sorted_u32) at comparable
               shapes, for A/B context

Run:  python tools/profile_stream.py [capacity_log2=26]
"""

import sys
import time

import numpy as np

import kmerutils_tpu  # noqa: F401
import jax

from kmerutils_tpu.base.sequence import pack_codes
from kmerutils_tpu.base import kmer as kmer_mod
from kmerutils_tpu.count import stream
from kmerutils_tpu.ops.merge_pallas import merge_sorted_u32, \
    aggregate_fold_i32

K = 16
N_READS, RL = 1024, 8192
CAPL = int(sys.argv[1]) if len(sys.argv) > 1 else 26
CAP = 1 << CAPL


def timeit(fn, fetch, n_iter=10):
    """fn() -> result; fetch(result) must read ONE element of it.  The
    axon backend's block_until_ready does not block, so completion of the
    queued loop is forced by fetching from the LAST iteration's output
    (fetching a pre-loop result would return instantly and time only
    dispatch)."""
    r = fn()  # warm (compile)
    _ = fetch(r)
    t0 = time.perf_counter()
    _ = fetch(r)
    t_f = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(n_iter):
        r = fn()
    _ = fetch(r)
    return (time.perf_counter() - t0 - t_f) / n_iter


def main():
    rng = np.random.default_rng(7)
    genome = rng.integers(0, 4, size=20 << 20, dtype=np.uint8)
    starts = rng.integers(0, genome.size - RL, size=N_READS)
    codes = np.stack([genome[s : s + RL] for s in starts])
    batch = jax.device_put(pack_codes(codes, np.full(N_READS, RL, np.int32)))
    nb = N_READS * RL

    # --- prep stages ---
    canon = jax.jit(lambda b: kmer_mod.canonical_kmers(b, K))
    dt = timeit(lambda: canon(batch), lambda r: int(np.asarray(r[0][0, 0])))
    print(f"prep_canon   {dt*1e3:8.2f} ms   {nb/dt/1e6:8.1f} Mb/s")

    prep = jax.jit(stream.batch_entries, static_argnames=("k", "coords"))
    arrs, live = prep(batch, k=K, read_num_offset=0, coords=True)
    dt = timeit(lambda: prep(batch, k=K, read_num_offset=0, coords=True),
                lambda r: int(np.asarray(r[0][0][0])))
    print(f"prep_sort    {dt*1e3:8.2f} ms   {nb/dt/1e6:8.1f} Mb/s")

    # --- fold at low occupancy (dead-tile skip regime) ---
    # folds DONATE the table's buffers (round 4): re-folding one table
    # object is an invalid-buffer error, so the fold stages CHAIN state
    # (occupancy drifts +8.4M per fold; n_iter kept small so the chain
    # stays below the auto-compact trigger at 2^26)
    state = {"t": stream.StreamCountTable.create(CAP, wide=False,
                                                 coords=True)}

    def fold_chain():
        state["t"] = stream.fold(state["t"], arrs, live)
        return state["t"]

    dt = timeit(fold_chain, lambda r: int(np.asarray(r.used)), n_iter=2)
    print(f"fold_empty   {dt*1e3:8.2f} ms   {nb/dt/1e6:8.1f} Mb/s")

    # --- build up occupancy (target ~60% of capacity; bounded folds) ---
    # fill batches are FRESH UNIFORM-RANDOM reads (near-all-distinct kmers)
    # so occupancy genuinely grows: genome-sampled reads would cap `used`
    # at the genome's distinct-kmer count after every auto-compaction and
    # a while-occupancy loop could never exit
    t = state["t"]          # continue from the fold_empty chain's table
    target = int(CAP * 0.6)
    off = 0
    max_folds = -(-target // (N_READS * (RL - K + 1))) + 4
    for _ in range(max_folds):
        if int(np.asarray(t.used)) >= target:
            break
        codes = rng.integers(0, 4, size=(N_READS, RL), dtype=np.uint8)
        fb = jax.device_put(pack_codes(codes, np.full(N_READS, RL, np.int32)))
        a2, l2 = prep(fb, k=K, read_num_offset=off, coords=True)
        t = stream.fold(t, a2, l2)
        off += N_READS
    used = int(np.asarray(t.used))
    print(f"  [occupancy {used/1e6:.1f} M / {CAP/1e6:.1f} M]")

    state = {"t": t}

    def fold_chain60():
        state["t"] = stream.fold(state["t"], arrs, live)
        return state["t"]

    dt = timeit(fold_chain60, lambda r: int(np.asarray(r.used)), n_iter=2)
    t = state["t"]
    print(f"fold_60pct   {dt*1e3:8.2f} ms   {nb/dt/1e6:8.1f} Mb/s   "
          f"(incl. auto-compacts; occupancy drifts)")

    # --- depth-2 staged cycle at the same occupancy (4 preps + 3 stage
    # merges + 1 table fold), per-batch cost for A/B with prep+fold above ---
    folder = stream.StagedFolder(t, depth=2)

    def staged_cycle():
        for _ in range(4):
            a2, l2 = prep(batch, k=K, read_num_offset=0, coords=True)
            folder.push(a2, l2)
        return folder.table

    dt = timeit(staged_cycle, lambda r: int(np.asarray(r.used)), n_iter=5)
    print(f"staged/batch {dt/4*1e3:8.2f} ms   {nb/(dt/4)/1e6:8.1f} Mb/s   "
          f"(incl. prep; depth 2)")

    # --- compact at the same occupancy ---
    # the staged folds above donated the old `t`; use the folder's LIVE
    # table (aggregate itself does not donate, so re-running it is fine)
    t = folder.table
    used = int(np.asarray(t.used))
    dt = timeit(lambda: aggregate_fold_i32(t.arrs, t.used, kw=1, coords=True,
                                           capacity=CAP, window=t.window),
                lambda r: int(np.asarray(r[1])))
    print(f"compact      {dt*1e3:8.2f} ms   (used {used/1e6:.1f}M x "
          f"{len(t.arrs)} arrays)")

    # --- legacy generic merge at comparable shapes, for context ---
    # (cmp pair = sorted keys + all-zeros second word — lexicographically
    # sorted as merge_sorted_u32 requires; the other 2 arrays are payloads)
    A = (jax.device_put(np.sort(
            rng.integers(1, 2**32 - 16, used, dtype=np.uint64)
            .astype(np.uint32))),
         jax.device_put(np.zeros(used, np.uint32)))
    A = A + tuple(jax.device_put(
        rng.integers(0, 2**32, used, dtype=np.uint64).astype(np.uint32))
        for _ in range(2))
    dt = timeit(lambda: merge_sorted_u32(A, arrs, ncmp=2, window=1 << 17),
                lambda r: int(np.asarray(r[0][0])))
    print(f"legacy_merge {dt*1e3:8.2f} ms   ({used/1e6:.0f}M + "
          f"{nb/1e6:.1f}M, 4 arrays)")


if __name__ == "__main__":
    main()
