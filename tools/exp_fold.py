"""One-off experiments for the streaming-fold cost model (round 2 tuning).

Times, on the live TPU:
  sort_u32       plain u32 key sort of one batch (no-coords prep)
  sort_u64       packed (key,idx) u64 sort (coords prep)
  batch_merge    merge_sorted_u32 of two 8.4M-entry batch runs (4 arrays)
  fold_w16       merge_fold_i32 at window 2^16 (current narr=4 default)
  fold_w17       merge_fold_i32 at window 2^17 (VMEM permitting)

Run:  python tools/exp_fold.py
"""

import time

import numpy as np

import kmerutils_tpu  # noqa: F401
import jax
import jax.numpy as jnp

from kmerutils_tpu.base.sequence import pack_codes
from kmerutils_tpu.count import stream
from kmerutils_tpu.ops.merge_pallas import merge_sorted_u32, merge_fold_i32

K = 16
N_READS, RL = 1024, 8192
CAP = 1 << 26


def timeit(fn, fetch, n_iter=10):
    r = fn()
    _ = fetch(r)
    t0 = time.perf_counter()
    _ = fetch(r)
    t_f = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(n_iter):
        r = fn()
    _ = fetch(r)
    return (time.perf_counter() - t0 - t_f) / n_iter


def make_batch(rng):
    codes = rng.integers(0, 4, size=(N_READS, RL), dtype=np.uint8)
    return jax.device_put(pack_codes(codes, np.full(N_READS, RL, np.int32)))


def main():
    rng = np.random.default_rng(3)
    batch = make_batch(rng)
    nb = N_READS * RL

    prep_nc = jax.jit(stream.batch_entries, static_argnames=("k", "coords"))
    dt = timeit(lambda: prep_nc(batch, k=K, read_num_offset=0, coords=False),
                lambda r: int(np.asarray(r[0][0][0])))
    print(f"sort_u32     {dt*1e3:8.2f} ms   {nb/dt/1e6:8.1f} Mb/s")

    dt = timeit(lambda: prep_nc(batch, k=K, read_num_offset=0, coords=True),
                lambda r: int(np.asarray(r[0][0][0])))
    print(f"sort_u64     {dt*1e3:8.2f} ms   {nb/dt/1e6:8.1f} Mb/s")

    # two sorted batch runs (coords layout: key,cnt,chi,clo), generic merge
    a1, l1 = prep_nc(batch, k=K, read_num_offset=0, coords=True)
    b2 = make_batch(rng)
    a2, l2 = prep_nc(b2, k=K, read_num_offset=N_READS, coords=True)
    dt = timeit(lambda: merge_sorted_u32(a1, a2, ncmp=1, window=1 << 17),
                lambda r: int(np.asarray(r[0][0])))
    print(f"batch_merge  {dt*1e3:8.2f} ms   ({2*nb/1e6:.1f}M entries, "
          f"4 arrays)")

    # fill a table to ~60% with random batches, then time folds at both
    # windows (the table layout is window-specific, so build one per window)
    for wlog in (16, 17):
        w = 1 << wlog
        tab = stream.StreamCountTable.create(CAP, wide=False, coords=True)
        if tab.window != w:
            # rebuild with forced window
            import dataclasses
            T = w - 2 * 1024
            n_tiles = -(-CAP // T)
            lp = (n_tiles + 2) * T
            tab = dataclasses.replace(
                tab,
                arrs=tuple(jnp.full(lp, np.int32(0x7FFFFFFF), jnp.int32)
                           for _ in tab.arrs),
                window=w)
        off = 0
        while int(np.asarray(tab.used)) < int(CAP * 0.6):
            fb = make_batch(rng)
            aa, ll = prep_nc(fb, k=K, read_num_offset=off, coords=True)
            tab = stream.fold(tab, aa, ll)
            off += N_READS
        used = int(np.asarray(tab.used))
        dt = timeit(lambda: stream.fold(tab, a1, l1),
                    lambda r: int(np.asarray(r.used)))
        print(f"fold_w{wlog}     {dt*1e3:8.2f} ms   {nb/dt/1e6:8.1f} Mb/s"
              f"   [used {used/1e6:.1f}M]")


if __name__ == "__main__":
    main()
