"""Measure per-op cost inside the tournament kernel by timing variants:
  base   : current kernel math (6-op hash, log draw, where-valid, 5-op update)
  nolog  : log replaced by a multiply (same op count otherwise)
  hash3  : 3-op hash instead of 6
  lean   : 3-op hash + nolog + no abs/where  (lower bound)
Run on the live TPU. Variants are NOT numerically meaningful — timing only.
"""
import time
import numpy as np
import kmerutils_tpu  # noqa: F401
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

U32, F32 = jnp.uint32, jnp.float32
SUB, LANES = 8, 512
BIG = np.float32(np.inf)
N, P, M = 1024, 6016, 200


def make_kernel(hash_ops, use_log, use_where):
    def kern(slotc_ref, items_ref, winv_ref, out_ref):
        p_pad = items_ref.shape[2]
        m_pad = out_ref.shape[1]
        for sg in range(m_pad // SUB):
            sc = slotc_ref[pl.ds(sg * SUB, SUB), :]
            best_e = jnp.full((SUB, LANES), BIG, F32)
            best_i = jnp.zeros((SUB, LANES), U32)
            for c in range(p_pad // LANES):
                it = items_ref[0, pl.ds(0, 1), pl.ds(c * LANES, LANES)]
                wv = winv_ref[0, pl.ds(0, 1), pl.ds(c * LANES, LANES)]
                itb = jnp.broadcast_to(it, (SUB, LANES))
                h = itb ^ jnp.broadcast_to(sc, (SUB, LANES))
                if hash_ops == 6:
                    h = h * U32(0x9E3779B1)
                    h = h ^ (h >> U32(15))
                    h = h * U32(0x85EBCA77)
                    h = h ^ (h >> U32(13))
                else:
                    h = h * U32(0x9E3779B1)
                    h = h ^ (h >> U32(16))
                u = (pltpu.bitcast(h >> U32(8), jnp.int32).astype(F32)
                     + F32(1.0)) * F32(2.0**-24)
                if use_log:
                    e = jnp.abs(-jnp.log(u)) * jnp.broadcast_to(wv, (SUB, LANES))
                else:
                    e = jnp.abs(-(u * F32(1.7))) * jnp.broadcast_to(wv, (SUB, LANES))
                if use_where:
                    e = jnp.where(jnp.broadcast_to(wv, (SUB, LANES)) > F32(0.0),
                                  e, BIG)
                upd = (e < best_e) | ((e == best_e) & (itb > best_i))
                best_e = jnp.where(upd, e, best_e)
                best_i = jnp.where(upd, itb, best_i)
            e_min = jnp.min(best_e, axis=1, keepdims=True)
            eq = best_e == e_min
            cand = jnp.where(eq, best_i, U32(0)) ^ U32(0x80000000)
            win_i = jnp.max(pltpu.bitcast(cand, jnp.int32), axis=1, keepdims=True)
            win = pltpu.bitcast(win_i, U32) ^ U32(0x80000000)
            out_ref[0, pl.ds(sg * SUB, SUB), 0] = win[:, 0]
    return kern


def build(hash_ops, use_log, use_where):
    m_pad = -(-M // SUB) * SUB
    from kmerutils_tpu.sketch.probminhash import _slot_consts
    slotc = np.asarray(_slot_consts(m_pad, 0)).reshape(m_pad, 1)

    @jax.jit
    def run(items, winv):
        with jax.enable_x64(False):
            out = pl.pallas_call(
                make_kernel(hash_ops, use_log, use_where),
                grid=(N,),
                in_specs=[
                    pl.BlockSpec((m_pad, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, 1, P), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, 1, P), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((1, m_pad, 1), lambda i: (i, 0, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((N, m_pad, 1), U32),
            )(jnp.asarray(slotc), items[:, None, :], winv[:, None, :])
        return out[0, :8, 0]
    return run


rng = np.random.default_rng(0)
items = jax.device_put(rng.integers(0, 2**32, size=(N, P), dtype=np.uint32))
winv = jax.device_put(np.ones((N, P), np.float32))


def timeit(fn, n=20):
    out = fn(items, winv)
    _ = np.asarray(out)[0]
    t0 = time.perf_counter()
    _ = np.asarray(out)[0]
    tf = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(items, winv)
    _ = np.asarray(out)[0]
    return (time.perf_counter() - t0 - tf) / n


for name, cfg in [("base (h6,log,where)", (6, True, True)),
                  ("nolog", (6, False, True)),
                  ("hash3", (3, True, True)),
                  ("nowhere", (6, True, False)),
                  ("lean (h3,nolog,nowhere)", (3, False, False))]:
    dt = timeit(build(*cfg))
    print(f"{name:28s}: {dt*1e3:7.2f} ms")
