"""Pallas TPU kernel for the ProbMinHash weighted tournament.

The hot op of the flagship sketch workload (SURVEY.md §6: per-read
ProbMinHash signatures): for every read r and sketch slot s,

    sig[r, s] = argmin over positions p of  E(p, s) = -ln(U(item_p, s)) / w_p

with ties broken by the smaller item value (keeping the sampler a pure
function of the weighted item multiset — see sketch/probminhash.py).

Kernel layout: one grid step per read.  Slots map to SUBLANES in groups of
8; positions stream along LANES in chunks, with two accumulators (best E
f32, best item u32) carried through a fori_loop — the [P, m] hash/draw grid
never exists in memory.  The output block is [m, 1] so the per-slot-group
result (a sublane vector) stores directly.  Compared with the fused-XLA
formulation this avoids the u64 key emulation and the lane padding of
m=200 -> 256 (slot groups of 8 pad nothing).

The kernel is numerically identical to the XLA path in
sketch/probminhash.py (same hash, same draw, same tie rule); tests assert
exact equality (interpret mode on CPU).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

U32 = jnp.uint32
F32 = jnp.float32

SUB = 8          # slots per group (sublanes)
LANES = 512      # positions per inner step
BIG = np.float32(np.inf)


def _tournament_kernel(slotc_ref, items_ref, winv_ref, out_ref,
                       *, iota_payload: bool = False):
    p_pad = items_ref.shape[2]
    m_pad = out_ref.shape[1]
    n_chunks = p_pad // LANES
    n_sg = m_pad // SUB

    for sg in range(n_sg):  # static unroll: slot groups
        sc = slotc_ref[pl.ds(sg * SUB, SUB), :]                    # [8, 1]

        # Comparisons run on e' = ln(u) * winv = -E (u in (0,1] so e' <= 0);
        # maximising e' minimises E, and the negation costs nothing.  Invalid
        # positions carry winv = NaN: every NaN comparison is false, so they
        # can never be selected — no where() per pair.
        #
        # fully unrolled position chunks: accumulators live in vector
        # registers for the whole sweep (a fori_loop carry would round-trip
        # them through VMEM every iteration — measured 4x slower)
        best_e = jnp.full((SUB, LANES), -BIG, F32)
        best_i = jnp.full((SUB, LANES), U32(0xFFFFFFFF), U32)
        for c in range(n_chunks):
            it = items_ref[0, pl.ds(0, 1), pl.ds(c * LANES, LANES)]  # [1, L]
            wv = winv_ref[0, pl.ds(0, 1), pl.ds(c * LANES, LANES)]
            itb = jnp.broadcast_to(it, (SUB, LANES))
            # xorshift-multiply mix (matches probminhash._hash32); the draw
            # only consumes the top 24 bits, which are fully avalanched after
            # the second multiply — no final xorshift needed
            h = itb ^ jnp.broadcast_to(sc, (SUB, LANES))
            h = h * U32(0x9E3779B1)
            h = h ^ (h >> U32(15))
            h = h * U32(0x85EBCA77)
            # Mosaic lacks u32->f32; the top-24-bit value fits i32 exactly,
            # so bitcast to i32 before the int->float convert.
            # u = (h24 + 1) * 2^-24 as a single fma (exact: h24+1 <= 2^24)
            u = (pltpu.bitcast(h >> U32(8), jnp.int32).astype(F32)
                 * F32(2.0**-24) + F32(2.0**-24))
            e = jnp.log(u) * jnp.broadcast_to(wv, (SUB, LANES))
            # payload carried with the best draw: the item itself (u32
            # items; ties -> smallest item, mirroring the XLA path's ~item
            # key) or the position (u64 items reduced on their 32-bit fold;
            # ties -> first position, the XLA wide path's rule — the caller
            # gathers the real item by position)
            if iota_payload:
                pay = (jax.lax.broadcasted_iota(U32, (SUB, LANES), 1)
                       + U32(c * LANES))
            else:
                pay = itb
            upd = (e > best_e) | ((e == best_e) & (pay < best_i))
            best_e = jnp.where(upd, e, best_e)
            best_i = jnp.where(upd, pay, best_i)
        # cross-lane reduce: max e' (= min E), ties -> min item.  Mosaic has
        # no unsigned reductions: flip the sign bit and min over i32
        # (order-preserving).
        e_best = jnp.max(best_e, axis=1, keepdims=True)            # [8, 1]
        eq = best_e == e_best
        cand = jnp.where(eq, best_i, U32(0xFFFFFFFF)) ^ U32(0x80000000)
        win_i = jnp.min(pltpu.bitcast(cand, jnp.int32), axis=1,
                        keepdims=True)                             # [8, 1]
        win = pltpu.bitcast(win_i, U32) ^ U32(0x80000000)
        out_ref[0, pl.ds(sg * SUB, SUB), 0] = win[:, 0]


@functools.partial(jax.jit,
                   static_argnames=("m", "interpret",
                                    "return_positions"))
def weighted_tournament(items32, winv, m: int, seed=0,
                        interpret: bool = False,
                        return_positions: bool = False):
    """sig u32[n, m] — items32 u32[n, P], winv f32[n, P] (<= 0 marks invalid).

    With ``return_positions`` the result holds the winning POSITION per slot
    instead of the item (ties -> first position) — the wide-item mode where
    items32 is the 32-bit fold of u64 items and the caller gathers the real
    item by position.

    m is padded to a multiple of 8 internally; P to a multiple of 512.
    Rows with no valid position return garbage (mask with your own empty
    flag — probminhash._tournament does).
    """
    items32 = jnp.asarray(items32, U32)
    winv = jnp.asarray(winv, F32)
    n, P = items32.shape
    m_pad = -(-m // SUB) * SUB
    p_pad = -(-P // LANES) * LANES
    # invalid positions (winv <= 0) become NaN: inside the kernel every
    # comparison against NaN is false, so they never win a slot
    winv = jnp.where(winv > F32(0.0), winv, jnp.float32(np.nan))
    if p_pad != P:
        items32 = jnp.pad(items32, ((0, 0), (0, p_pad - P)))
        winv = jnp.pad(winv, ((0, 0), (0, p_pad - P)),
                       constant_values=np.nan)

    from ..sketch.probminhash import _slot_consts
    slotc = _slot_consts(m_pad, seed).reshape(m_pad, 1)

    # the package enables jax x64 globally, but Mosaic cannot lower i64 loop
    # state; trace the kernel with x64 off (array dtypes are explicit anyway)
    with jax.enable_x64(False):
        out = pl.pallas_call(
            functools.partial(_tournament_kernel,
                              iota_payload=return_positions),
            grid=(n,),
            in_specs=[
                pl.BlockSpec((m_pad, 1), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, p_pad), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, p_pad), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, m_pad, 1), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n, m_pad, 1), U32),
            interpret=interpret,
        )(slotc, items32[:, None, :], winv[:, None, :])
    return out[:, :m, 0]


def _tournament_kernel_u64(slotc_ref, lo_ref, hi_ref, winv_ref, out_ref):
    """Wide-item tournament: the draw runs on the 32-bit fold lo^hi and the
    accumulators carry the item HALVES plus the position, so the winning u64
    item comes out of the kernel directly (no [n, m] gather).  Ties resolve
    to the first position — the XLA wide path's rule.  In-lane that rule is
    free (strict compare keeps the earlier chunk); cross-lane the position
    accumulator picks the winner."""
    p_pad = lo_ref.shape[2]
    m_pad = out_ref.shape[1]
    n_chunks = p_pad // LANES
    n_sg = m_pad // SUB

    for sg in range(n_sg):
        sc = slotc_ref[pl.ds(sg * SUB, SUB), :]
        best_e = jnp.full((SUB, LANES), -BIG, F32)
        best_p = jnp.full((SUB, LANES), U32(0xFFFFFFFF), U32)
        best_lo = jnp.zeros((SUB, LANES), U32)
        best_hi = jnp.zeros((SUB, LANES), U32)
        for c in range(n_chunks):
            lo = jnp.broadcast_to(
                lo_ref[0, pl.ds(0, 1), pl.ds(c * LANES, LANES)], (SUB, LANES))
            hi = jnp.broadcast_to(
                hi_ref[0, pl.ds(0, 1), pl.ds(c * LANES, LANES)], (SUB, LANES))
            wv = winv_ref[0, pl.ds(0, 1), pl.ds(c * LANES, LANES)]
            h = (lo ^ hi) ^ jnp.broadcast_to(sc, (SUB, LANES))
            h = h * U32(0x9E3779B1)
            h = h ^ (h >> U32(15))
            h = h * U32(0x85EBCA77)
            u = (pltpu.bitcast(h >> U32(8), jnp.int32).astype(F32)
                 * F32(2.0**-24) + F32(2.0**-24))
            e = jnp.log(u) * jnp.broadcast_to(wv, (SUB, LANES))
            # strict >: on equal draws the EARLIER position in this lane
            # stays, which is exactly the min-position rule within a lane
            upd = e > best_e
            pos = (jax.lax.broadcasted_iota(U32, (SUB, LANES), 1)
                   + U32(c * LANES))
            best_e = jnp.where(upd, e, best_e)
            best_p = jnp.where(upd, pos, best_p)
            best_lo = jnp.where(upd, lo, best_lo)
            best_hi = jnp.where(upd, hi, best_hi)
        # cross-lane: max e', ties -> min position; then read that lane's
        # item halves (the winning position is unique, so min-reduce works)
        e_best = jnp.max(best_e, axis=1, keepdims=True)
        eq = best_e == e_best
        pc = jnp.where(eq, best_p, U32(0xFFFFFFFF)) ^ U32(0x80000000)
        win_p = jnp.min(pltpu.bitcast(pc, jnp.int32), axis=1, keepdims=True)
        sel = eq & (pltpu.bitcast(pc, jnp.int32) == win_p)
        lo_w = jnp.min(pltpu.bitcast(
            jnp.where(sel, best_lo, U32(0xFFFFFFFF)) ^ U32(0x80000000),
            jnp.int32), axis=1, keepdims=True)
        hi_w = jnp.min(pltpu.bitcast(
            jnp.where(sel, best_hi, U32(0xFFFFFFFF)) ^ U32(0x80000000),
            jnp.int32), axis=1, keepdims=True)
        out_ref[0, pl.ds(sg * SUB, SUB), 0] = (
            pltpu.bitcast(lo_w, U32) ^ U32(0x80000000))[:, 0]
        out_ref[0, pl.ds(sg * SUB, SUB), 1] = (
            pltpu.bitcast(hi_w, U32) ^ U32(0x80000000))[:, 0]


@functools.partial(jax.jit, static_argnames=("m", "interpret"))
def weighted_tournament_u64(lo, hi, winv, m: int, seed=0,
                            interpret: bool = False):
    """Wide-item tournament: (lo, hi) u32[n, P] halves of u64 items,
    winv f32[n, P] (<= 0 invalid).  Returns (lo_win, hi_win) u32[n, m].
    Rows with no valid position return garbage — mask with your empty flag.
    """
    lo = jnp.asarray(lo, U32)
    hi = jnp.asarray(hi, U32)
    winv = jnp.asarray(winv, F32)
    n, P = lo.shape
    m_pad = -(-m // SUB) * SUB
    p_pad = -(-P // LANES) * LANES
    winv = jnp.where(winv > F32(0.0), winv, jnp.float32(np.nan))
    if p_pad != P:
        lo = jnp.pad(lo, ((0, 0), (0, p_pad - P)))
        hi = jnp.pad(hi, ((0, 0), (0, p_pad - P)))
        winv = jnp.pad(winv, ((0, 0), (0, p_pad - P)),
                       constant_values=np.nan)

    from ..sketch.probminhash import _slot_consts
    slotc = _slot_consts(m_pad, seed).reshape(m_pad, 1)

    with jax.enable_x64(False):
        out = pl.pallas_call(
            _tournament_kernel_u64,
            grid=(n,),
            in_specs=[
                pl.BlockSpec((m_pad, 1), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, p_pad), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, p_pad), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, p_pad), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, m_pad, 2), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n, m_pad, 2), U32),
            interpret=interpret,
        )(slotc, lo[:, None, :], hi[:, None, :], winv[:, None, :])
    return out[:, :m, 0], out[:, :m, 1]
