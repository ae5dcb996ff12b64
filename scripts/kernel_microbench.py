"""Microbenchmark Pallas ACS kernel variants to find the slow construct.

Each variant runs the same loop structure (n_packs x bpp stages on a
(64, 128) tile) with one construct changed; compare times to attribute cost.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import functools
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N_PACKS = 66
BPP = 32
LT = 128
N_TILES = 16


def _repeat2_bcast(x):
    h, b = x.shape
    return jnp.broadcast_to(x[:, None, :], (h, 2, b)).reshape(2 * h, b)


def _repeat2_concat(x):  # WRONG result, perf probe: contiguous halves
    return jnp.concatenate([x, x], axis=0)


def _repeat2_pltpu(x):
    return pltpu.repeat(x, 2, 0)


def make_kernel(variant):
    def kernel(rs_ref, out_ref):
        def pack_body(p, carry):
            pm, pp = carry

            def run_stage(s, pm, pp):
                rt = rs_ref[p, s]
                r0 = rt[0:1, :]
                r1 = rt[1:2, :]
                bmA = r0 + r1  # simplified BM
                if variant == "no_acs":
                    pm = pm + bmA
                    pp = pp + 1
                    return pm, pp
                if variant == "concat":
                    rep = _repeat2_concat
                elif variant == "pltpu_repeat":
                    rep = _repeat2_pltpu
                else:
                    rep = _repeat2_bcast
                pm_lo = rep(pm[:32])
                pm_hi = rep(pm[32:])
                cand0 = pm_lo + bmA
                cand1 = pm_hi - bmA
                dec = cand1 > cand0
                pm = jnp.where(dec, cand1, cand0)
                if variant == "no_pp":
                    pp = pp + 1
                else:
                    pp_sel = jnp.where(dec, rep(pp[32:]), rep(pp[:32]))
                    pp = (pp_sel << 1) | dec.astype(jnp.int32)
                return pm, pp

            for s in range(BPP):
                pm, pp = run_stage(s, pm, pp)
            return pm, pp

        zeros = jnp.zeros((64, LT), jnp.int32)
        pm, pp = jax.lax.fori_loop(0, N_PACKS, pack_body, (zeros, zeros))
        out_ref[:] = pm + pp

    return kernel


def run_variant(variant, rs):
    kernel = make_kernel(variant)
    f = pl.pallas_call(
        kernel,
        grid=(N_TILES,),
        in_specs=[pl.BlockSpec((N_PACKS, BPP, 2, LT), lambda i: (0, 0, 0, i),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((64, LT), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((64, N_TILES * LT), jnp.int32),
    )
    g = jax.jit(lambda x: jnp.sum(f(x)))
    np.asarray(g(rs))  # compile
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(g(rs))
        ts.append(time.perf_counter() - t0)
    t = min(ts) - 0.033  # subtract relay floor
    stages = N_TILES * N_PACKS * BPP
    print(f"{variant:14s}: {min(ts)*1e3:7.1f} ms raw, "
          f"~{max(t,1e-9)*1e9/stages:8.0f} ns/stage/tile", flush=True)


def main():
    gen = jax.jit(lambda k: jax.random.randint(
        k, (N_PACKS, BPP, 2, N_TILES * LT), -100, 101, dtype=jnp.int32))
    rs = gen(jax.random.PRNGKey(0))
    jax.block_until_ready(rs)
    for v in ["no_acs", "concat", "no_pp", "bcast", "pltpu_repeat"]:
        try:
            run_variant(v, rs)
        except Exception as e:
            print(f"{v:14s}: FAILED {type(e).__name__}: {str(e)[:200]}",
                  flush=True)


if __name__ == "__main__":
    main()
