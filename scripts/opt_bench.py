"""Optimization experiments on the E/O ACS kernel:
  i32      - current formulation (baseline)
  i32_split- carry (lo,hi)/(pl,ph) halves, no 64-row concat
  i16      - int16 pm+pp (2x if Mosaic packs 16-bit lanes)
  i16_pm   - int16 pm, int32 pp
  lt256    - LANE_TILE=256
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N_PACKS = 66
BPP = 32


def merge(a, b):
    h, w = a.shape
    return jnp.stack([a, b], axis=1).reshape(2 * h, w)


def make_kernel(variant, lt):
    pm_dtype = jnp.int16 if variant.startswith("i16") else jnp.int32
    pp_dtype = jnp.int16 if variant == "i16" else jnp.int32

    def kernel(rs_ref, out_ref):
        def stage(s, p, lo, hi, pl_, ph_):
            rt = rs_ref[p, s]
            bm = (rt[0:1, :] + rt[1:2, :]).astype(pm_dtype)
            c0e = lo + bm
            c1e = hi - bm
            dec_e = c1e > c0e
            e_new = jnp.where(dec_e, c1e, c0e)
            c0o = lo - bm
            c1o = hi + bm
            dec_o = c1o > c0o
            o_new = jnp.where(dec_o, c1o, c0o)
            lo2 = merge(e_new[:16], o_new[:16])
            hi2 = merge(e_new[16:], o_new[16:])
            de = dec_e.astype(pp_dtype)
            do = dec_o.astype(pp_dtype)
            pe = (jnp.where(dec_e, ph_, pl_) << 1) | de
            po = (jnp.where(dec_o, ph_, pl_) << 1) | do
            pl2 = merge(pe[:16], po[:16])
            ph2 = merge(pe[16:], po[16:])
            return lo2, hi2, pl2, ph2

        def pack_body(p, carry):
            lo, hi, pl_, ph_ = carry
            for s in range(BPP):
                lo, hi, pl_, ph_ = stage(s, p, lo, hi, pl_, ph_)
            return lo, hi, pl_, ph_

        z16 = jnp.zeros((32, lt), pm_dtype)
        zpp = jnp.zeros((32, lt), pp_dtype)
        lo, hi, pl_, ph_ = jax.lax.fori_loop(
            0, N_PACKS, pack_body, (z16, z16, zpp, zpp))
        out_ref[:32, :] = (lo + pl_.astype(pm_dtype)).astype(jnp.int32)
        out_ref[32:, :] = (hi + ph_.astype(pm_dtype)).astype(jnp.int32)

    return kernel


def run(variant, lt, n_tiles, rs):
    f = pl.pallas_call(
        make_kernel(variant, lt),
        grid=(n_tiles,),
        in_specs=[pl.BlockSpec((N_PACKS, BPP, 2, lt), lambda i: (0, 0, 0, i),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((64, lt), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((64, n_tiles * lt), jnp.int32),
    )
    g = jax.jit(lambda x: jnp.sum(f(x)))
    np.asarray(g(rs))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(g(rs))
        ts.append(time.perf_counter() - t0)
    t = min(ts) - 0.030
    denom = n_tiles * N_PACKS * BPP
    print(f"{variant:10s} lt={lt:3d}: {min(ts)*1e3:7.1f} ms raw  "
          f"~{max(t,1e-12)*1e9/denom:6.1f} ns/stage/tile "
          f"(bits/s={(n_tiles*lt*N_PACKS*BPP)/max(t,1e-9)/1e9:6.1f}G)",
          flush=True)


def main():
    lanes_total = 4096
    gen = jax.jit(lambda k: jax.random.randint(
        k, (N_PACKS, BPP, 2, lanes_total), -100, 101, dtype=jnp.int32))
    rs = gen(jax.random.PRNGKey(0))
    jax.block_until_ready(rs)
    for variant, lt in [("i32_split", 128), ("i16", 128), ("i16_pm", 128),
                        ("i32_split", 256), ("i16", 256),
                        ("i32_split", 512), ("i16", 512)]:
        try:
            run(variant, lt, lanes_total // lt, rs)
        except Exception as e:
            print(f"{variant:10s} lt={lt}: FAILED {type(e).__name__}: "
                  f"{str(e)[:140]}", flush=True)


if __name__ == "__main__":
    main()
