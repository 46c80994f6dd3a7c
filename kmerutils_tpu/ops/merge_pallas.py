"""Hierarchical merge of two sorted arrays — Pallas TPU kernel.

The streaming count table folds a sorted batch into a sorted capacity-sized
table (count/stream.py).  An XLA ``lax.sort`` of capacity+batch costs the
full O(n log^2 n) comparator network (measured 991 ms at 42M x 3 operands on
v5e); an XLA roll-based bitonic MERGE is O(n log n) compares but each of its
log n stages round-trips HBM (measured 3.2 s — see the retired ops/merge.py
note).  The merge only wins when the whole stage stack runs in VMEM:

  1. XLA prologue: merge-path partition (Green et al.) — a vectorized binary
     search finds, for every output tile of T elements, how many come from A
     and how many from B.  Each tile's work is then INDEPENDENT and exactly T.
  2. Pallas kernel, grid over output tiles: DMA the two segments (<= T each)
     from HBM at dynamic offsets, run ONE elementwise half-cleaner of the
     bitonic sequence [A_seg asc | reversed B_seg] — after which the low half
     holds the T real elements and is itself bitonic — then log2(T)
     compare-exchange stages via static lane/sublane rolls, all VMEM-resident.

Total traffic: one HBM read + one write per element, plus ~log2(T) VPU ops —
two orders of magnitude less HBM traffic than the XLA alternatives.

Array model: every operand is uint32.  The first ``ncmp`` (1 or 2) arrays are
compare keys (lexicographic, unsigned); the rest ride as payloads.  64-bit
keys travel as (hi, lo) u32 pairs with ncmp=2.  Mosaic has no unsigned
compares, so keys are XOR-flipped into signed i32 order outside the kernel.

The reference counterpart of the consumer is the cuckoo+bloom fold of
/root/reference/src/base/kmercount.rs:241-267; this file is pure machinery.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

I32 = jnp.int32
U32 = jnp.uint32
SENT32 = np.uint32(0xFFFFFFFF)
_FLIP = np.uint32(0x80000000)
_IMAX = np.int32(0x7FFFFFFF)


def _interpret() -> bool:
    """Mosaic kernels run for real only on TPU; the CPU test mesh (and any
    other backend) uses the Pallas interpreter (SURVEY.md §4 strategy)."""
    return jax.default_backend() != "tpu"


def _flip_s(x):
    """uint32 -> int32 preserving unsigned order (sign-bit flip)."""
    return (jnp.asarray(x, U32) ^ _FLIP).astype(I32)


def _unflip_s(x):
    return (jnp.asarray(x).astype(U32) ^ _FLIP).astype(U32)


def merge_path_partition(a_packed, b_packed, T: int, n_tiles: int):
    """a_start[t] for every output tile boundary: the stable (A-first) merge
    of a_packed and b_packed assigns elements [t*T, (t+1)*T) of the output
    the A-range [a_start[t], a_start[t+1]) and the B-range holding the rest.

    a_packed/b_packed: 1-D ascending arrays of one comparable dtype (pack
    (hi, lo) pairs into uint64 before calling).  Returns int32 [n_tiles+1].
    """
    na = a_packed.shape[0]
    nb = b_packed.shape[0]
    d = jnp.arange(n_tiles + 1, dtype=I32) * I32(T)
    if na == 0 or nb == 0:
        return jnp.minimum(d, I32(na))
    lo = jnp.maximum(d - I32(nb), 0)
    hi = jnp.minimum(d, I32(na))
    iters = max(int(na).bit_length(), 1)
    # P(x) = "x elements of A may precede": a[x-1] <= b[d-x], edges true.
    # P is monotone (true ... true false ... false); find the largest true.
    for _ in range(iters):
        mid = (lo + hi + I32(1)) >> 1
        av = jnp.take(a_packed, jnp.clip(mid - 1, 0, na - 1), mode="clip")
        bv = jnp.take(b_packed, jnp.clip(d - mid, 0, nb - 1), mode="clip")
        ok = (mid <= lo) | (d - mid >= nb) | (av <= bv)
        lo = jnp.where(ok, mid, lo)
        hi = jnp.where(ok, hi, mid - 1)
    return lo


def _cmp_lt(ak, bk, ncmp):
    """Lexicographic (b < a) on the first ncmp arrays (signed domain)."""
    if ncmp == 1:
        return bk[0] < ak[0]
    return (bk[0] < ak[0]) | ((bk[0] == ak[0]) & (bk[1] < ak[1]))


def _bitonic_stages(arrs, ncmp, R):
    """Sort a bitonic [R, 128] sequence ascending (flat row-major order):
    log2(R*128) compare-exchange stages, strides materialized as static
    rolls (sublane rolls on axis 0, lane rolls on axis 1) — no gathers, no
    sub-tile reshapes."""
    T = R * 128
    row = jax.lax.broadcasted_iota(I32, (R, 128), 0)
    col = jax.lax.broadcasted_iota(I32, (R, 128), 1)
    s = T // 2
    while s >= 1:
        if s >= 128:
            axis, amt = 0, s // 128
            high = (row & I32(s // 128)) != 0   # bit test: row // m odd
        else:
            axis, amt = 1, s
            high = (col & I32(s)) != 0
        pk = [jnp.where(high, jnp.roll(x, amt, axis=axis),
                        jnp.roll(x, -amt, axis=axis)) for x in arrs]
        self_gt = _cmp_lt(arrs, pk, ncmp)       # partner < self
        part_gt = _cmp_lt(pk, arrs, ncmp)       # self < partner
        # logical combine, not where(bool, bool, bool) — Mosaic cannot
        # truncate the i8 select result back to i1
        take = (high & part_gt) | (~high & self_gt)
        arrs = [jnp.where(take, p, x) for x, p in zip(arrs, pk)]
        s //= 2
    return arrs


_Q = 1024   # Mosaic DMA alignment for i32 HBM slices (one (8,128) tile)
_IMIN = np.int32(-0x80000000)


def _rotate_flat(x, nf, R):
    """Left-rotate the row-major flattening of x [R, 128] by nf (dynamic,
    0 <= nf < R*128): out[flat] = x[flat + nf].  Two row-rolls blended at
    the lane seam (a flat rotation is not a single 2-D rotation)."""
    r0 = nf >> I32(7)
    c0 = nf & I32(127)
    y1 = pltpu.roll(x, (I32(R) - r0) & I32(R - 1), axis=0)
    y2 = pltpu.roll(x, (I32(R) - r0 - 1) & I32(R - 1), axis=0)
    lane_shift = (I32(128) - c0) & I32(127)
    z1 = pltpu.roll(y1, lane_shift, axis=1)
    z2 = pltpu.roll(y2, lane_shift, axis=1)
    col = jax.lax.broadcasted_iota(I32, (R, 128), 1)
    return jnp.where(col < I32(128) - c0, z1, z2)


def _merge_tile_math(av, bf, ka0, ka1, kb0, kb1, out_refs, *, narr, ncmp,
                     P):
    """The per-tile merge network shared by :func:`_merge_kernel` and
    :func:`_merge_fold_kernel`: mask the loaded windows into one bitonic
    sequence (-inf fakes ahead of the exact A-range, +inf after it; the
    mirrored masks on the REVERSED B window), run the half-cleaner +
    bitonic stages, rotate the fakes out, and store the T merged elements.

    av/bf: lists of (R, 128) i32 window views (A ascending, B reversed);
    ka0/ka1 and kb0/kb1: exact element ranges within the aligned windows.
    """
    T = P - 2 * _Q
    R = P // 128
    row = jax.lax.broadcasted_iota(I32, (R, 128), 0)
    col = jax.lax.broadcasted_iota(I32, (R, 128), 1)
    flat = row * I32(128) + col
    for j in range(ncmp):
        # av: [-inf fakes | reals ascending | +inf] — still ascending
        av[j] = jnp.where(flat < ka0, _IMIN,
                          jnp.where(flat >= ka1, _IMAX, av[j]))
        # bf is reversed: forward position q sits at P-1-q, so the window
        # prefix (q < kb0 -> -inf) masks the BACK and the suffix
        # (q >= kb1 -> +inf) masks the FRONT — still descending
        bf[j] = jnp.where(flat < I32(P) - kb1, _IMAX,
                          jnp.where(flat >= I32(P) - kb0, _IMIN, bf[j]))
    # half-cleaner of [A asc | B desc]: partner pairs are elementwise
    # between A and reversed B; the low half holds the P smallest —
    # nf fakes + all T reals — and is itself bitonic
    take_b = _cmp_lt(av, bf, ncmp)              # strict: tie keeps A (stable)
    low = [jnp.where(take_b, b, a) for a, b in zip(av, bf)]
    merged = _bitonic_stages(low, ncmp, R)
    nf = ka0 + kb0
    for j in range(narr):
        rot = _rotate_flat(merged[j], nf, R)
        # first T elements = the first T/128 full rows (row-major layout)
        out_refs[j][:] = rot[: T // 128, :].reshape(T)


def _merge_kernel(astart_ref, *refs, narr, ncmp, P, nb_p):
    """One output tile of T = P - 2*_Q merged elements.

    Exact merge-path splits are element-granular but HBM DMA offsets must
    be _Q-aligned, so each side loads a P-element window starting at its
    exact split rounded DOWN to _Q.  In-kernel masks shape each window into
    a monotone sequence: positions BEFORE the exact range become -inf
    fakes (they stay at the front and are rotated away at the end —
    callers guarantee no real entry compares equal to all-zeros, so fakes
    sort STRICTLY below every real entry and never displace one), and
    positions AFTER it become +inf (discarded with the high half).  B refs
    hold the B arrays REVERSED (Mosaic has no in-kernel ``rev``): the
    forward window [y, y+P) is the reversed-array slice starting at
    nb_p - y and arrives exactly as the descending tail the bitonic
    half-cleaner wants.
    """
    T = P - 2 * _Q
    R = P // 128
    a_refs = refs[:narr]
    b_refs = refs[narr : 2 * narr]
    out_refs = refs[2 * narr : 3 * narr]
    scr = refs[3 * narr : 5 * narr]          # a scratch x narr, b scratch x narr
    sems = refs[5 * narr]
    t = pl.program_id(0)
    d0 = t * I32(T)
    x0 = astart_ref[t]
    x1 = astart_ref[t + 1]
    y0 = d0 - x0
    y1_ = d0 + I32(T) - x1
    xq = (x0 >> I32(10)) << I32(10)          # aligned a-window start
    yq = (y0 >> I32(10)) << I32(10)          # aligned b-window start
    a_off = pl.multiple_of(xq, _Q)
    b_off = pl.multiple_of(I32(nb_p) - yq, _Q)   # reversed-array offset

    copies = []
    for j in range(narr):
        c = pltpu.make_async_copy(a_refs[j].at[pl.ds(a_off, P)], scr[j],
                                  sems.at[j])
        c.start()
        copies.append(c)
        c = pltpu.make_async_copy(b_refs[j].at[pl.ds(b_off, P)], scr[narr + j],
                                  sems.at[narr + j])
        c.start()
        copies.append(c)
    for c in copies:
        c.wait()

    av = [scr[j][:].reshape(R, 128) for j in range(narr)]
    bf = [scr[narr + j][:].reshape(R, 128) for j in range(narr)]
    # exact element ranges within the aligned windows
    _merge_tile_math(av, bf, x0 - xq, x1 - xq, y0 - yq, y1_ - yq, out_refs,
                     narr=narr, ncmp=ncmp, P=P)


@functools.partial(jax.jit, static_argnames=("ncmp", "window"))
def merge_sorted_u32(a_arrs, b_arrs, ncmp: int = 1, window: int = 1 << 18):
    """Merge sorted A-arrays with sorted B-arrays (stable, A first on ties).

    a_arrs, b_arrs: tuples of 1-D uint32 arrays (equal lengths within each
    side).  The first ``ncmp`` arrays of each side are the compare keys in
    lexicographic unsigned order (pad tails with all-ones sentinels — they
    sort last); the remaining arrays are payloads.  ``window`` is the
    power-of-two per-tile VMEM window; each tile emits window - 2048
    merged elements.  Returns a tuple of uint32 arrays of length
    n_tiles * (window - 2048) >= len_a + len_b; slots past the real
    merged length carry sentinel keys.

    CONSTRAINT: no real entry may compare equal to all-zeros across the
    ncmp compare words (the alignment-window fakes sit at unsigned zero
    and must sort strictly below every real entry).  Count tables satisfy
    this with counts >= 1 in the compare pair or a +1 key bias.
    """
    assert 1 <= ncmp <= 2 and len(a_arrs) == len(b_arrs)
    narr = len(a_arrs)
    P = window
    T = P - 2 * _Q
    a_arrs = [jnp.asarray(x, U32) for x in a_arrs]
    b_arrs = [jnp.asarray(x, U32) for x in b_arrs]
    na, nb = a_arrs[0].shape[0], b_arrs[0].shape[0]
    na_al = -(-na // _Q) * _Q            # DMA offsets must be _Q-aligned
    n_tiles = -(-(na_al + nb) // T)
    nb_p = n_tiles * T - na_al           # b padded length (multiple of _Q)

    def prep(x, is_cmp, total, rev):
        fill = SENT32 if is_cmp else np.uint32(0)
        x = jnp.concatenate([x, jnp.full((total + P - x.shape[0],), fill,
                                         U32)])
        x = _flip_s(x) if is_cmp else x.astype(I32)
        return x[::-1] if rev else x

    a_in = [prep(x, j < ncmp, na_al, False) for j, x in enumerate(a_arrs)]
    # B travels reversed (Mosaic cannot lower rev inside the kernel); the
    # kernel slices windows from the back
    b_in = [prep(x, j < ncmp, nb_p, True) for j, x in enumerate(b_arrs)]

    # partition over the aligned-padded key arrays (sentinel pads are
    # elements too; they sort last and surface as dead slots)
    if ncmp == 2:
        ap = ((_unflip_s(a_in[0][:na_al]).astype(jnp.uint64) << np.uint64(32))
              | _unflip_s(a_in[1][:na_al]))
        bp = ((_unflip_s(b_in[0][::-1][:nb_p]).astype(jnp.uint64)
               << np.uint64(32)) | _unflip_s(b_in[1][::-1][:nb_p]))
    else:
        ap = _unflip_s(a_in[0][:na_al])
        bp = _unflip_s(b_in[0][::-1][:nb_p])
    a_starts = merge_path_partition(ap, bp, T, n_tiles).astype(I32)

    kern = functools.partial(_merge_kernel, narr=narr, ncmp=ncmp, P=P,
                             nb_p=nb_p)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * (2 * narr),
        out_specs=[pl.BlockSpec((T,), lambda i, astart: (i,),
                                memory_space=pltpu.VMEM)] * narr,
        scratch_shapes=[pltpu.VMEM((P,), I32)] * (2 * narr)
        + [pltpu.SemaphoreType.DMA((2 * narr,))],
    )
    with jax.enable_x64(False):
        outs = pl.pallas_call(
            kern,
            grid_spec=grid_spec,
            out_shape=[jax.ShapeDtypeStruct((n_tiles * T,), I32)] * narr,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",)),
            interpret=_interpret(),
        )(a_starts, *a_in, *b_in)
    return tuple(_unflip_s(o) if j < ncmp else o.astype(U32)
                 for j, o in enumerate(outs))


# ---------------------------------------------------------------------------
# persistent-layout fold merge (count/stream.py's hot path)
# ---------------------------------------------------------------------------

def merge_path_partition_dyn(a_arrs, b_arrs, na, nb: int, d, iters: int):
    """Merge-path split points at output boundaries ``d`` with a TRACED
    a-side length ``na`` (live prefix of a persistent table — positions
    >= na may hold garbage and are never sampled).  Compares the first
    1 or 2 i32 words lexicographically (signed domain = flipped unsigned),
    gathering words directly instead of packing u64 keys (saves a full
    O(na) pack pass per fold)."""
    ncmp = len(a_arrs)
    lo = jnp.maximum(d - I32(nb), 0)
    hi = jnp.minimum(d, na)

    def take(arr, idx, n):
        return jnp.take(arr, jnp.clip(idx, 0, n - 1), mode="clip")

    for _ in range(iters):
        mid = (lo + hi + I32(1)) >> 1
        # P(mid) = "mid elements of A may precede": a[mid-1] <= b[d-mid]
        a0 = take(a_arrs[0], mid - 1, na)
        b0 = take(b_arrs[0], d - mid, nb)
        if ncmp == 1:
            le = a0 <= b0
        else:
            a1 = take(a_arrs[1], mid - 1, na)
            b1 = take(b_arrs[1], d - mid, nb)
            le = (a0 < b0) | ((a0 == b0) & (a1 <= b1))
        ok = (mid <= lo) | (d - mid >= nb) | le
        lo = jnp.where(ok, mid, lo)
        hi = jnp.where(ok, hi, mid - 1)
    return lo


def _merge_fold_kernel(scal_ref, *refs, narr, ncmp, P, nb_p):
    """Fold-merge tile: identical merge math to :func:`_merge_kernel`, plus
    (a) inputs/outputs already in the persistent flipped-i32 layout,
    (b) an O(live) launch envelope — the grid is DYNAMICALLY bounded to
    the live output tiles (round 4; scal_ref[0] carries the live merged
    length), so dead tiles are never dispatched at all: no input DMA, no
    merge network, no output DMA — outputs live in ANY memory space and
    each live tile copies its own block out, so a fold's HBM traffic AND
    grid dispatch are O(live tiles), not O(capacity).  Dead regions keep
    whatever the (donated) buffer held; every consumer masks by ``used``
    (the in-kernel d0 < end guard remains as a final-partial-tile
    belt-and-braces) — and
    (c) double-buffered input DMA: each live tile prefetches the NEXT live
    tile's windows while computing, hiding the load latency.  The two
    buffer sets are selected STATICALLY by tile parity (pl.when on t&1) —
    cheaper for Mosaic than dynamically-indexed VMEM slots."""
    T = P - 2 * _Q
    R = P // 128
    a_refs = refs[:narr]
    b_refs = refs[narr : 2 * narr]
    out_refs = refs[2 * narr : 3 * narr]
    scr = refs[3 * narr : 7 * narr]     # [set0: a x narr, b x narr | set1]
    ost = refs[7 * narr : 8 * narr]     # output staging (T,) x narr
    sems = refs[8 * narr]               # (5*narr,): 4*narr input + narr out
    it = pl.program_id(0)
    # BACKWARD tile order: iteration 0 processes the LAST live tile.  The
    # output buffers ALIAS the a-side table buffers (in-place fold, round
    # 4 — jit-level donation could not alias through the custom call and
    # degenerated into an O(capacity) copy per fold, measured 310 GB/s of
    # pure copy).  Merging back-to-front is the classic in-place-safe
    # order: tile t writes output [d0, d0+T) and every LATER iteration
    # (tile < t) reads a-positions < x_{t} <= d0; window tails that do
    # reach past d0 cover a-positions >= the reader's x1 boundary, which
    # its merge math clips away — so no write ever lands on bytes a later
    # tile consumes.
    t = pl.num_programs(0) - 1 - it
    d0 = t * I32(T)
    end = scal_ref[0]                  # used + batch_live (scal[0]; the
    #                                    grid is DYNAMIC, so the end slot
    #                                    lives at a fixed index up front)

    def tile_copies(tt, s):
        """Copy descriptors loading tile tt's windows into buffer set s."""
        x0 = scal_ref[1 + tt]
        y0 = tt * I32(T) - x0
        xq = (x0 >> I32(10)) << I32(10)
        yq = (y0 >> I32(10)) << I32(10)
        a_off = pl.multiple_of(xq, _Q)
        b_off = pl.multiple_of(I32(nb_p) - yq, _Q)
        base = 2 * narr * s
        cs = []
        for j in range(narr):
            cs.append(pltpu.make_async_copy(
                a_refs[j].at[pl.ds(a_off, P)], scr[base + j],
                sems.at[base + j]))
            cs.append(pltpu.make_async_copy(
                b_refs[j].at[pl.ds(b_off, P)], scr[base + narr + j],
                sems.at[base + narr + j]))
        return cs

    def live_body(s):
        @pl.when(it == 0)
        def _first():
            for c in tile_copies(t, s):
                c.start()

        @pl.when(t > 0)
        def _prefetch():
            for c in tile_copies(t - 1, 1 - s):
                c.start()

        for c in tile_copies(t, s):
            c.wait()

        x0 = scal_ref[1 + t]
        x1 = scal_ref[t + 2]
        y0 = d0 - x0
        y1_ = d0 + I32(T) - x1
        xq = (x0 >> I32(10)) << I32(10)
        yq = (y0 >> I32(10)) << I32(10)
        base = 2 * narr * s
        av = [scr[base + j][:].reshape(R, 128) for j in range(narr)]
        bf = [scr[base + narr + j][:].reshape(R, 128) for j in range(narr)]
        _merge_tile_math(av, bf, x0 - xq, x1 - xq, y0 - yq, y1_ - yq,
                         ost, narr=narr, ncmp=ncmp, P=P)
        # copy this tile's block out (d0 is a multiple of T, T a multiple
        # of _Q, so the HBM offset stays DMA-aligned); waited immediately —
        # T*narr words per live tile, negligible next to the input windows
        ocs = []
        for j in range(narr):
            c = pltpu.make_async_copy(
                ost[j], out_refs[j].at[pl.ds(pl.multiple_of(d0, _Q), T)],
                sems.at[4 * narr + j])
            c.start()
            ocs.append(c)
        for c in ocs:
            c.wait()

    @pl.when((d0 < end) & ((it & I32(1)) == 0))
    def _live_even():
        live_body(0)

    @pl.when((d0 < end) & ((it & I32(1)) == 1))
    def _live_odd():
        live_body(1)


@functools.partial(jax.jit,
                   static_argnames=("ncmp", "capacity", "window"))
def merge_fold_i32(a_arrs, b_arrs, used, batch_live, *, ncmp: int,
                   capacity: int, window: int = 1 << 17):
    """Fold sorted batch entries into a persistent-layout table.

    a_arrs: i32 arrays of physical length >= n_tiles*T + window, holding the
      table in KERNEL-NATIVE form: the first ``ncmp`` arrays are sign-flipped
      compare words ascending over the live prefix [0, used); everything at
      or past ``used`` is unread garbage (masked by the partition clip).
    b_arrs: i32 arrays of physical length nb_p + window, REVERSED, flipped
      compare words, front-padded with _IMAX sentinels (see
      count/stream.py's _batch_to_kernel).
    used, batch_live: traced scalars — live prefix lengths of each side.

    Returns i32 arrays of the same physical shape as a_arrs: positions
    [0, min(used+batch_live, capacity)) hold the merged live entries,
    positions from there to the end of the LAST LIVE TILE hold _IMAX
    sentinels in compare words, and everything past that live tile is
    UNSPECIFIED (dead tiles skip their output DMA entirely — fold HBM
    traffic is O(live), not O(capacity); every consumer masks by the live
    length).  Merged entries past ``capacity`` (the largest keys) land in
    the overhang/garbage region — the caller accounts drops as
    max(used + batch_live - capacity, 0).

    CONSTRAINT: no live entry's flipped compare words may equal _IMIN
    (all-zeros unsigned) — callers bias keys by +1 before flipping.
    """
    narr = len(a_arrs)
    assert len(b_arrs) == narr and 1 <= ncmp <= 2
    P = window
    T = P - 2 * _Q
    n_tiles = -(-capacity // T)
    Lp = (n_tiles + 2) * T
    assert 2 * T >= P and a_arrs[0].shape[0] == Lp
    nb_p = b_arrs[0].shape[0] - P
    used = jnp.asarray(used, I32)
    end_total = jnp.minimum(used + jnp.asarray(batch_live, I32),
                            I32(n_tiles * T))
    # output-boundary diagonals, clamped so boundaries past the live merged
    # length stay consistent (tiles there are skipped / emit sentinels)
    d = jnp.minimum(jnp.arange(n_tiles + 1, dtype=I32) * I32(T),
                    used + I32(nb_p))
    # the search bracket per boundary is at most min(capacity, nb) wide,
    # so bit_length(min(...)) iterations always converge
    a_starts = merge_path_partition_dyn(
        a_arrs[:ncmp], [b[::-1] for b in b_arrs[:ncmp]], used, nb_p, d,
        iters=max(min(int(capacity), nb_p).bit_length(), 1))
    scal = jnp.concatenate([end_total[None], a_starts])

    # DYNAMIC grid: launch only the live output tiles (ceil(end/T)) — dead
    # tiles previously cost ~2-4 us of grid dispatch each, which made a
    # 2^28-capacity fold 2.2x a 2^26 one at EQUAL live count
    # (tools/kernel_bench.py); with the dynamic bound, fold cost is
    # O(live) in dispatch as well as DMA
    live_tiles = jnp.minimum((end_total + I32(T - 1)) // I32(T),
                             I32(n_tiles))
    kern = functools.partial(_merge_fold_kernel, narr=narr, ncmp=ncmp, P=P,
                             nb_p=nb_p)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(live_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * (2 * narr),
        # ANY outputs + manual per-live-tile copy-out: dead tiles past the
        # merged length issue NO output DMA, so fold HBM traffic scales
        # with occupancy, not capacity (their regions keep old/garbage
        # data; consumers mask by `used` — count/stream.py layout contract)
        out_specs=[pl.BlockSpec(memory_space=pl.ANY)] * narr,
        scratch_shapes=[pltpu.VMEM((P,), I32)] * (4 * narr)
        + [pltpu.VMEM((T,), I32)] * narr
        + [pltpu.SemaphoreType.DMA((5 * narr,))],
    )
    with jax.enable_x64(False):
        outs = pl.pallas_call(
            kern,
            grid_spec=grid_spec,
            out_shape=[jax.ShapeDtypeStruct((Lp,), I32)] * narr,
            # table buffers fold IN PLACE (operand 1+j is a_arrs[j]; 0 is
            # the scal prefetch).  Composed with the callers' jit-level
            # donation this makes a fold ZERO-copy — without the aliasing
            # declaration XLA cannot alias through the custom call and
            # inserts a full O(capacity) copy of every donated table
            # buffer (measured: fold 9.1 ms vs 2.3 ms at 2^28, pure copy
            # at ~310 GB/s).  Dead regions now literally keep the donated
            # buffer's bytes, which is the documented layout contract.
            input_output_aliases={1 + j: j for j in range(narr)},
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",)),
            interpret=_interpret(),
        )(scal, *a_arrs, *b_arrs)
    return tuple(outs)


def _flat_shift_right(x, s: int, fill, R):
    """out[i] = x[i - s] for static s >= 1 (row-major flat order), filling
    the first s positions."""
    T = R * 128
    rot = _rotate_flat(x, I32((T - s) % T), R)
    flat = (jax.lax.broadcasted_iota(I32, (R, 128), 0) * I32(128)
            + jax.lax.broadcasted_iota(I32, (R, 128), 1))
    return jnp.where(flat < s, fill, rot)


def _flat_shift_left(x, s: int, fill, R):
    """out[i] = x[i + s] for static s >= 1, filling the last s positions."""
    T = R * 128
    rot = _rotate_flat(x, I32(s), R)
    flat = (jax.lax.broadcasted_iota(I32, (R, 128), 0) * I32(128)
            + jax.lax.broadcasted_iota(I32, (R, 128), 1))
    return jnp.where(flat >= T - s, fill, rot)


def _scalar_sum_i32(v):
    """Full i32 reduction to a scalar inside a kernel.  jnp.sum straight
    to rank-0 makes Mosaic manufacture 64-bit temporaries when the process
    has x64 enabled (enable_x64(False) around pallas_call does not reach
    the kernel trace); two keepdims stages plus a [0,0] extract lower
    cleanly."""
    s1 = jnp.sum(v, axis=1, keepdims=True, promote_integers=False)
    return jnp.sum(s1, axis=0, keepdims=True,
                   promote_integers=False)[0, 0]


def _sat_add_u32(a, b):
    """Saturating unsigned add on u32-as-i32 values."""
    c = a + b                                   # two's-complement wrap
    ovf = (c ^ _IMIN) < (a ^ _IMIN)             # unsigned c < a
    return jnp.where(ovf, I32(-1), c)


def _ult(a, b):
    """Unsigned a < b on u32-as-i32 values."""
    return (a ^ _IMIN) < (b ^ _IMIN)


def _butterfly_concentrate(arrs, live_i32, dest, flat, row, col, R, T):
    """Move entries with live flag to their dest ranks (monotone) — the
    butterfly concentrator shared by the compaction kernels."""
    s = 1
    while s < T:
        if s >= 128:
            axis, amt = 0, s // 128
            high = (row & I32(s // 128)) != 0
        else:
            axis, amt = 1, s
            high = (col & I32(s)) != 0

        def partner(x):
            return jnp.where(high, jnp.roll(x, amt, axis=axis),
                             jnp.roll(x, -amt, axis=axis))

        want = live_i32 * (((flat ^ dest) & I32(s)) != 0).astype(I32)
        swap = (want + partner(want)) != 0
        arrs = [jnp.where(swap, partner(x), x) for x in arrs]
        dest = jnp.where(swap, partner(dest), dest)
        live_i32 = jnp.where(swap, partner(live_i32), live_i32)
        s *= 2
    return arrs


# ---------------------------------------------------------------------------
# fused aggregation + filter + compaction (one pass, SMEM run carry)
# ---------------------------------------------------------------------------

def _agg_tile_compute(a, live, carry, *, narr, kw, T, lo, hi, coords, nokey,
                      flat, row, col, R):
    """The pure-compute core of one aggregation tile, shared by the raw
    (:func:`_aggcompact_kernel`) and persistent (:func:`_aggfold_kernel`)
    kernels: run detection against the SMEM carry, segmented scans (counts
    saturating-sum, coords lexicographic min), end detection, count-range
    filter, emit ranking, and butterfly concentration.

    Returns (vals, cnt, chi_clo, tile_emits, c_emit, carry_from_last) —
    the caller stages vals into the output and updates the SMEM carry.
    ``nokey`` is a fill that matches no LIVE entry's first key word
    (word-0 inequality is what breaks eq_prev).
    """
    c_live = carry[narr + 1] != 0
    # previous-element key (element 0 sees the carry key)
    eq_prev = jnp.ones((R, 128), bool)
    for w in range(kw):
        pk = _flat_shift_right(a[w], 1, nokey, R)
        pk = jnp.where(flat == 0,
                       jnp.where(c_live, carry[w], nokey), pk)
        eq_prev = eq_prev & (a[w] == pk)
    new_run = live & ~eq_prev
    f = new_run.astype(I32)

    cnt = jnp.where(live, a[kw], 0)
    # inject the carried partial run into element 0 when its key continues
    # (scalar via masked reduction — Mosaic dislikes vector element extracts)
    at0 = flat == 0
    inject = c_live & (_scalar_sum_i32(
        jnp.where(at0 & eq_prev & live, I32(1), I32(0))) > 0)
    cnt = jnp.where(at0 & inject, _sat_add_u32(cnt, carry[kw]), cnt)
    if coords:
        chi = jnp.where(live, a[kw + 1], I32(-1))
        clo = jnp.where(live, a[kw + 2], I32(-1))
        tk_c = _ult(carry[kw + 1], chi) | \
            ((carry[kw + 1] == chi) & _ult(carry[kw + 2], clo))
        chi = jnp.where(at0 & inject & tk_c, carry[kw + 1], chi)
        clo = jnp.where(at0 & inject & tk_c, carry[kw + 2], clo)

    # segmented inclusive forward scan (Hillis-Steele with boundary flags)
    s = 1
    while s < T:
        pf = _flat_shift_right(f, s, I32(1), R)
        pc = _flat_shift_right(cnt, s, I32(0), R)
        absorb = f == 0
        cnt = jnp.where(absorb, _sat_add_u32(pc, cnt), cnt)
        if coords:
            phi = _flat_shift_right(chi, s, I32(-1), R)
            plo = _flat_shift_right(clo, s, I32(-1), R)
            take = _ult(phi, chi) | ((phi == chi) & _ult(plo, clo))
            chi = jnp.where(absorb & take, phi, chi)
            clo = jnp.where(absorb & take, plo, clo)
        f = f | pf
        s *= 2

    # run ends: next element starts a new run or is dead; the LAST element
    # is never an end here (its run goes to the carry — the input's dead
    # padding guarantees every real run ends before the final tile)
    nxt_new = _flat_shift_left(new_run.astype(I32), 1, I32(0), R) != 0
    nxt_live = _flat_shift_left(live.astype(I32), 1, I32(1), R) != 0
    is_end = live & (nxt_new | ~nxt_live) & (flat != I32(T - 1))
    carry_from_last = live & (flat == I32(T - 1))

    in_range = jnp.full((R, 128), True)
    if lo > 1:
        in_range = ~_ult(cnt, I32(np.uint32(lo).astype(np.int32)))
    if hi is not None:
        in_range = in_range & ~_ult(I32(np.uint32(hi).astype(np.int32)), cnt)
    e = is_end & in_range
    e_i32 = e.astype(I32)

    # local exclusive rank of emits (plain inclusive scan, then - e)
    r_inc = e_i32
    s = 1
    while s < T:
        r_inc = r_inc + _flat_shift_right(r_inc, s, I32(0), R)
        s *= 2
    rank = r_inc - e_i32
    tile_emits = _scalar_sum_i32(e_i32)

    # carried-run completion: previous run ends here without continuation
    completed = c_live & ~inject
    c_cnt = carry[kw]
    c_ok = completed
    if lo > 1:
        c_ok = c_ok & ~_ult(c_cnt, I32(np.uint32(lo).astype(np.int32)))
    if hi is not None:
        c_ok = c_ok & ~_ult(I32(np.uint32(hi).astype(np.int32)), c_cnt)
    c_emit = jnp.where(c_ok, I32(1), I32(0))

    # emitted entry words (at end positions); everything else dead
    vals = [jnp.where(e, a[w], I32(-1)) for w in range(kw)]
    vals.append(jnp.where(e, cnt, I32(-1)))
    if coords:
        vals.append(jnp.where(e, chi, I32(-1)))
        vals.append(jnp.where(e, clo, I32(-1)))

    dest = jnp.where(e, rank, flat)
    vals = _butterfly_concentrate(vals, e_i32, dest, flat, row, col, R, T)
    chi_clo = (chi, clo) if coords else None
    return (vals, cnt, chi_clo, tile_emits, c_emit, carry_from_last)


def _agg_staged_append(out_refs, scr, rb, sems, carry, vals, c_emit, *,
                       narr, T, R):
    """Append ``c_emit`` carry entry + the concentrated ``vals`` emits to
    the outputs at running offset carry[narr], via an aligned 2T write
    window whose leading partial block is read back first (the sequential
    grid + in-kernel waits order the DMAs).  Returns the emit offset."""
    off = carry[narr]
    base = pl.multiple_of((off >> I32(10)) << I32(10), _Q)
    gap = off & I32(_Q - 1)

    rb_copies = []
    for j in range(narr):
        c = pltpu.make_async_copy(out_refs[j].at[pl.ds(base, _Q)], rb[j],
                                  sems.at[narr + j])
        c.start()
        rb_copies.append(c)
    for c in rb_copies:
        c.wait()

    R2 = 2 * R
    flat2 = (jax.lax.broadcasted_iota(I32, (R2, 128), 0) * I32(128)
             + jax.lax.broadcasted_iota(I32, (R2, 128), 1))
    sent_rows = jnp.full((R, 128), I32(-1))
    shift = gap + c_emit
    copies = []
    for j in range(narr):
        padded = jnp.concatenate([vals[j], sent_rows], axis=0)
        rot = _rotate_flat(padded, (I32(2 * T) - shift) & I32(2 * T - 1), R2)
        rb_parts = [rb[j][:].reshape(_Q // 128, 128)]
        if R2 > _Q // 128:
            rb_parts.append(jnp.zeros((R2 - _Q // 128, 128), I32))
        rb_rows = jnp.concatenate(rb_parts, axis=0)
        combined = jnp.where(flat2 < gap, rb_rows,
                             jnp.where((flat2 == gap) & (c_emit > 0),
                                       carry[j], rot))
        scr[j][:] = combined.reshape(2 * T)
        c = pltpu.make_async_copy(scr[j], out_refs[j].at[pl.ds(base, 2 * T)],
                                  sems.at[j])
        c.start()
        copies.append(c)
    for c in copies:
        c.wait()
    return off


def _agg_update_carry(carry, nlive_ref, a, cnt, chi_clo, vals_off, tile_emits,
                      c_emit, carry_from_last, flat, *, narr, kw, T, coords):
    """SMEM carry + live-count updates for the next tile (shared tail of
    both aggregation kernels)."""
    def lastv(x):
        return _scalar_sum_i32(jnp.where(flat == I32(T - 1), x, 0))

    new_c_live = _scalar_sum_i32(
        jnp.where(carry_from_last, I32(1), I32(0)))
    for w in range(kw):
        carry[w] = jnp.where(new_c_live > 0, lastv(a[w]), I32(-1))
    carry[kw] = jnp.where(new_c_live > 0, lastv(cnt), I32(-1))
    if coords:
        carry[kw + 1] = jnp.where(new_c_live > 0, lastv(chi_clo[0]), I32(-1))
        carry[kw + 2] = jnp.where(new_c_live > 0, lastv(chi_clo[1]), I32(-1))
    carry[narr] = vals_off + tile_emits + c_emit
    carry[narr + 1] = new_c_live
    nlive_ref[0] = vals_off + tile_emits + c_emit


def _aggcompact_kernel(*refs, narr, kw, T, lo, hi, coords):
    """Aggregate duplicate-key runs (sum counts saturating, min coords),
    filter by count range, and compact — in ONE pass over the table.

    The XLA formulation needs ~log2(n) full HBM passes per 64-bit scan
    chain (measured ~0.5 s at 2^26 with coords); here every scan runs in
    VMEM per tile and runs crossing tile boundaries ride an SMEM carry
    (the grid is sequential).  A run is emitted by the tile containing its
    END; a run carried past a tile whose first key no longer matches is
    emitted as one extra leading entry of that tile.

    Entry layout: kw key words, count word, then 2 coord words if coords.
    Input must be sorted by key with all dead (all-ones) entries in a
    trailing block, padded with >= 1 dead tile so the final run flushes.
    """
    R = T // 128
    in_refs = refs[:narr]
    out_refs = refs[narr : 2 * narr]
    nlive_ref = refs[2 * narr]
    scr = refs[2 * narr + 1 : 3 * narr + 1]      # (2T,) write staging
    rb = refs[3 * narr + 1 : 4 * narr + 1]       # (_Q,) readback
    carry = refs[4 * narr + 1]                   # SMEM: narr vals + off + live
    sems = refs[4 * narr + 2]
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _init():
        for j in range(narr):
            carry[j] = I32(-1)
        carry[narr] = I32(0)          # out_off
        carry[narr + 1] = I32(0)      # carry_live

    row = jax.lax.broadcasted_iota(I32, (R, 128), 0)
    col = jax.lax.broadcasted_iota(I32, (R, 128), 1)
    flat = row * I32(128) + col
    a = [r[:].reshape(R, 128) for r in in_refs]
    live = a[0] != I32(-1)

    (vals, cnt, chi_clo, tile_emits, c_emit,
     carry_from_last) = _agg_tile_compute(
        a, live, carry, narr=narr, kw=kw, T=T, lo=lo, hi=hi, coords=coords,
        nokey=I32(-2), flat=flat, row=row, col=col, R=R)
    off = _agg_staged_append(out_refs, scr, rb, sems, carry, vals, c_emit,
                             narr=narr, T=T, R=R)
    _agg_update_carry(carry, nlive_ref, a, cnt, chi_clo, off, tile_emits,
                      c_emit, carry_from_last, flat,
                      narr=narr, kw=kw, T=T, coords=coords)


@functools.partial(jax.jit,
                   static_argnames=("kw", "coords", "lo", "hi", "tile"))
def aggregate_compact_u32(arrs, kw: int = 1, coords: bool = False,
                          lo: int = 1, hi: int | None = None,
                          tile: int = 1 << 15):
    """One-pass aggregate+filter+compact of a sorted entry table.

    arrs: (key words x kw, count, [coord_hi, coord_lo]) uint32 arrays,
    sorted by key, dead (all-ones) entries in a trailing block.  Returns
    (arrs', n_live): one entry per distinct key with lo <= count <= hi
    (counts saturate at 2^32-1; coords take the lexicographic min — the
    global first occurrence), stably compacted, dead-filled tail.
    """
    narr = len(arrs)
    assert narr == kw + 1 + (2 if coords else 0)
    arrs = [jnp.asarray(x, U32) for x in arrs]
    m = arrs[0].shape[0]
    # shrink the tile for small tables: fewer in-kernel stages, far
    # smaller (interpret-mode/CPU) compile
    T = min(tile, max(_Q, 1 << (m - 1).bit_length()))
    assert T >= _Q and T & (T - 1) == 0
    # >= 1 full dead tile of padding so the final run always flushes
    n_tiles = -(-m // T) + 1
    pad = n_tiles * T - m
    arrs = [jnp.concatenate([x, jnp.full((pad,), SENT32, U32)])
            for x in arrs]
    a_i32 = [jax.lax.bitcast_convert_type(x, I32) for x in arrs]
    M = n_tiles * T

    kern = functools.partial(_aggcompact_kernel, narr=narr, kw=kw, T=T,
                             lo=lo, hi=hi, coords=coords)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(n_tiles,),
        in_specs=[pl.BlockSpec((T,), lambda i: (i,),
                               memory_space=pltpu.VMEM)] * narr,
        out_specs=[pl.BlockSpec(memory_space=pl.ANY)] * narr
        + [pl.BlockSpec(memory_space=pltpu.SMEM)],
        scratch_shapes=[pltpu.VMEM((2 * T,), I32)] * narr
        + [pltpu.VMEM((_Q,), I32)] * narr
        + [pltpu.SMEM((narr + 2,), I32)]
        + [pltpu.SemaphoreType.DMA((2 * narr,))],
    )
    with jax.enable_x64(False):
        outs = pl.pallas_call(
            kern,
            grid_spec=grid_spec,
            out_shape=[jax.ShapeDtypeStruct((M + 2 * T,), I32)] * narr
            + [jax.ShapeDtypeStruct((1,), I32)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",)),
            interpret=_interpret(),
        )(*a_i32)
    n_live = outs[narr][0]
    idx = jnp.arange(m, dtype=I32)
    res = tuple(jnp.where(idx < n_live,
                          jax.lax.bitcast_convert_type(o[:m], U32), SENT32)
                for o in outs[:narr])
    return res, n_live


def _aggfold_kernel(scal_ref, *refs, narr, kw, T, lo, hi, coords):
    """Persistent-layout twin of :func:`_aggcompact_kernel` for the
    streaming table's kernel-native form (count/stream.py):

    - inputs/outputs are sign-flipped i32 (sentinel = _IMAX) in HBM; input
      tiles are DMAed manually because the physical length (a multiple of
      the MERGE tile) is not a multiple of this kernel's tile,
    - liveness is POSITIONAL: entries [0, used) are live (a fold's merged
      prefix is contiguous), everything after is sentinel/garbage and never
      read as data,
    - tiles wholly past ``used`` with no pending carry are skipped — no
      DMA, no scans — so compaction costs O(used), not O(capacity).
    """
    R = T // 128
    in_refs = refs[:narr]
    out_refs = refs[narr : 2 * narr]
    nlive_ref = refs[2 * narr]
    scr = refs[2 * narr + 1 : 3 * narr + 1]      # (2T,) write staging
    rb = refs[3 * narr + 1 : 4 * narr + 1]       # (_Q,) readback
    rd = refs[4 * narr + 1 : 5 * narr + 1]       # (T,) input read scratch
    carry = refs[5 * narr + 1]                   # SMEM: narr vals + off + live
    sems = refs[5 * narr + 2]
    t = pl.program_id(0)
    used_end = scal_ref[0]
    d0 = t * I32(T)

    @pl.when(t == 0)
    def _init():
        for j in range(narr):
            carry[j] = I32(-1)
        carry[narr] = I32(0)          # out_off
        carry[narr + 1] = I32(0)      # carry_live
        nlive_ref[0] = I32(0)         # empty-table result if every tile skips

    @pl.when((d0 < used_end) | (carry[narr + 1] != 0))
    def _active():
        cps = []
        in_off = pl.multiple_of(d0, _Q)
        for j in range(narr):
            c = pltpu.make_async_copy(in_refs[j].at[pl.ds(in_off, T)], rd[j],
                                      sems.at[2 * narr + j])
            c.start()
            cps.append(c)
        for c in cps:
            c.wait()

        row = jax.lax.broadcasted_iota(I32, (R, 128), 0)
        col = jax.lax.broadcasted_iota(I32, (R, 128), 1)
        flat = row * I32(128) + col
        a = [rd[j][:].reshape(R, 128) for j in range(narr)]
        live = (flat + d0) < used_end

        # nokey = _IMAX: live entries' first key word never takes the
        # sentinel pattern (canonical kmers are biased +1 and < all-ones —
        # see count/stream.py's layout contract)
        (vals, cnt, chi_clo, tile_emits, c_emit,
         carry_from_last) = _agg_tile_compute(
            a, live, carry, narr=narr, kw=kw, T=T, lo=lo, hi=hi,
            coords=coords, nokey=_IMAX, flat=flat, row=row, col=col, R=R)
        off = _agg_staged_append(out_refs, scr, rb, sems, carry, vals,
                                 c_emit, narr=narr, T=T, R=R)
        _agg_update_carry(carry, nlive_ref, a, cnt, chi_clo, off, tile_emits,
                          c_emit, carry_from_last, flat,
                          narr=narr, kw=kw, T=T, coords=coords)


@functools.partial(jax.jit,
                   static_argnames=("kw", "coords", "lo", "hi", "capacity",
                                    "window", "tile"))
def aggregate_fold_i32(arrs, used, *, kw: int, coords: bool,
                       capacity: int, window: int,
                       lo: int = 1, hi: int | None = None,
                       tile: int = 1 << 15):
    """One-pass aggregate+filter+compact of a persistent-layout table
    (the kernel-native form produced by :func:`merge_fold_i32`; see
    count/stream.py).  arrs are i32, physical length (n_tiles+2)*T_merge
    with live entries in [0, used); returns (arrs', n_live) in the SAME
    physical layout — positions >= n_live are unspecified (downstream
    consumers mask by the live length, so no O(capacity) sentinel-fill
    epilogue is paid)."""
    narr = len(arrs)
    assert narr == kw + 1 + (2 if coords else 0)
    Tm = window - 2 * _Q
    n_tiles_m = -(-capacity // Tm)
    Lp = (n_tiles_m + 2) * Tm
    assert arrs[0].shape[0] == Lp and arrs[0].dtype == jnp.int32
    s_phys = n_tiles_m * Tm
    # tile must be a pow2 multiple of _Q no larger than the merge tile
    # (so manual reads [t*T, t*T+T) stay within Lp even for the +1 flush
    # tile: s_phys + 2*T <= s_phys + 2*Tm <= Lp)
    T = min(tile, 1 << (Tm.bit_length() - 1))
    assert T >= _Q and T & (T - 1) == 0
    n_tiles = -(-s_phys // T) + 1
    used = jnp.asarray(used, I32)

    # DYNAMIC grid: the data tiles covering [0, used) plus ONE flush tile
    # (a pending carry can only extend one tile past the data — the same
    # bound the static +1 grid encoded); dead tiles beyond never launch
    live_tiles = jnp.minimum((used + I32(T - 1)) // I32(T) + I32(1),
                             I32(n_tiles))
    kern = functools.partial(_aggfold_kernel, narr=narr, kw=kw, T=T,
                             lo=lo, hi=hi, coords=coords)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(live_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * narr,
        out_specs=[pl.BlockSpec(memory_space=pl.ANY)] * narr
        + [pl.BlockSpec(memory_space=pltpu.SMEM)],
        scratch_shapes=[pltpu.VMEM((2 * T,), I32)] * narr
        + [pltpu.VMEM((_Q,), I32)] * narr
        + [pltpu.VMEM((T,), I32)] * narr
        + [pltpu.SMEM((narr + 2,), I32)]
        + [pltpu.SemaphoreType.DMA((3 * narr,))],
    )
    with jax.enable_x64(False):
        outs = pl.pallas_call(
            kern,
            grid_spec=grid_spec,
            out_shape=[jax.ShapeDtypeStruct((Lp,), I32)] * narr
            + [jax.ShapeDtypeStruct((1,), I32)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",)),
            interpret=_interpret(),
        )(used[None], *arrs)
    return tuple(outs[:narr]), outs[narr][0]


# ---------------------------------------------------------------------------
# stable compaction: butterfly concentrator + dynamic-offset output DMA
# ---------------------------------------------------------------------------

def _compact_kernel(off_ref, *refs, narr, T):
    """Move live entries (key != sentinel) of each T-tile stably to the
    front, then DMA the tile to the output at its global live offset.

    Local routing is a butterfly concentrator: log2(T) stages of stride
    2^b pair-swaps, LSB first.  A pair swaps when either occupant's
    destination (its global live rank) disagrees with its current position
    in bit b; for a monotone rank assignment this is conflict-free (the
    classic banyan concentration property — validated by exhaustive
    simulation in tests).  O(log T) work instead of a local sort's
    O(log^2 T).

    Output DMA offsets must be _Q-aligned, so each tile writes a 2T-element
    window at align_down(off[t]): the first off[t] - base positions are
    READ BACK from the output (the previous tile's partial trailing block —
    the sequential grid plus in-kernel waits order the DMAs), the tile's
    live entries follow, and the garbage tail is overwritten by the next
    tile's window.  The caller masks the final tail.
    """
    R = T // 128
    in_refs = refs[:narr]
    rank_ref = refs[narr]
    out_refs = refs[narr + 1 : 2 * narr + 1]
    scr = refs[2 * narr + 1 : 3 * narr + 1]           # (2T,) write staging
    rb = refs[3 * narr + 1 : 4 * narr + 1]            # (_Q,) readback
    sems = refs[4 * narr + 1]
    t = pl.program_id(0)
    off = off_ref[t]
    base = pl.multiple_of((off >> I32(10)) << I32(10), _Q)
    gap = off & I32(_Q - 1)

    rb_copies = []
    for j in range(narr):
        c = pltpu.make_async_copy(out_refs[j].at[pl.ds(base, _Q)], rb[j],
                                  sems.at[narr + j])
        c.start()
        rb_copies.append(c)

    row = jax.lax.broadcasted_iota(I32, (R, 128), 0)
    col = jax.lax.broadcasted_iota(I32, (R, 128), 1)
    flat = row * I32(128) + col
    arrs = [r[:].reshape(R, 128) for r in in_refs]
    live = (arrs[0] != I32(-1)).astype(I32)     # i32 flag: bool rolls/selects
    #                                             don't lower in Mosaic
    dest = jnp.where(live != 0, rank_ref[:].reshape(R, 128) - off, flat)
    arrs = _butterfly_concentrate(arrs, live, dest, flat, row, col, R, T)

    for c in rb_copies:
        c.wait()
    R2 = 2 * R
    flat2 = (jax.lax.broadcasted_iota(I32, (R2, 128), 0) * I32(128)
             + jax.lax.broadcasted_iota(I32, (R2, 128), 1))
    sent_rows = jnp.full((R, 128), I32(-1))
    copies = []
    for j in range(narr):
        padded = jnp.concatenate([arrs[j], sent_rows], axis=0)
        rot = _rotate_flat(padded, (I32(2 * T) - gap) & I32(2 * T - 1), R2)
        rb_parts = [rb[j][:].reshape(_Q // 128, 128)]
        if R2 > _Q // 128:
            rb_parts.append(jnp.zeros((R2 - _Q // 128, 128), I32))
        rb_rows = jnp.concatenate(rb_parts, axis=0)
        combined = jnp.where(flat2 < gap, rb_rows, rot)
        scr[j][:] = combined.reshape(2 * T)
        c = pltpu.make_async_copy(scr[j], out_refs[j].at[pl.ds(base, 2 * T)],
                                  sems.at[j])
        c.start()
        copies.append(c)
    for c in copies:
        c.wait()


@functools.partial(jax.jit, static_argnames=("tile",))
def compact_live_u32(arrs, tile: int = 1 << 15):
    """Stable compaction of sentinel-holed arrays.

    arrs: tuple of 1-D uint32 arrays; an entry is DEAD iff arrs[0] ==
    0xFFFFFFFF (canonical kmer keys / key-high-words never take the
    all-ones value).  Returns (compacted_arrs, n_live): live entries moved
    to the front preserving order; slots >= n_live carry all-ones in
    every array.
    """
    narr = len(arrs)
    arrs = [jnp.asarray(x, U32) for x in arrs]
    m = arrs[0].shape[0]
    T = min(tile, max(_Q, 1 << (m - 1).bit_length()))
    assert T >= _Q and T & (T - 1) == 0, "tile must be a pow2 >= 1024"
    n_tiles = -(-m // T)
    pad = n_tiles * T - m
    if pad:
        arrs = [jnp.concatenate([x, jnp.full((pad,), SENT32, U32)])
                for x in arrs]
    M = n_tiles * T
    a_i32 = [jax.lax.bitcast_convert_type(x, I32) for x in arrs]
    live = a_i32[0] != I32(-1)
    rank = jnp.cumsum(live.astype(I32)) - live.astype(I32)   # exclusive
    per_tile = live.reshape(n_tiles, T).sum(axis=1, dtype=I32)
    off = jnp.concatenate([jnp.zeros((1,), I32),
                           jnp.cumsum(per_tile, dtype=I32)])

    kern = functools.partial(_compact_kernel, narr=narr, T=T)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[pl.BlockSpec((T,), lambda i, off: (i,),
                               memory_space=pltpu.VMEM)] * narr
        + [pl.BlockSpec((T,), lambda i, off: (i,),
                        memory_space=pltpu.VMEM)],
        out_specs=[pl.BlockSpec(memory_space=pl.ANY)] * narr,
        scratch_shapes=[pltpu.VMEM((2 * T,), I32)] * narr
        + [pltpu.VMEM((_Q,), I32)] * narr
        + [pltpu.SemaphoreType.DMA((2 * narr,))],
    )
    with jax.enable_x64(False):
        outs = pl.pallas_call(
            kern,
            grid_spec=grid_spec,
            out_shape=[jax.ShapeDtypeStruct((M + 2 * T,), I32)] * narr,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",)),
            interpret=_interpret(),
        )(off, *a_i32, rank)
    n_live = off[-1]
    idx = jnp.arange(M, dtype=I32)
    outs = [jnp.where(idx < n_live,
                      jax.lax.bitcast_convert_type(o[:M], U32), SENT32)
            for o in outs]
    return tuple(outs), n_live
