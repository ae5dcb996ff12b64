"""Isolate costs in the ACS kernel: which construct eats the 305 ns/stage?

Variants (perf probes; some produce wrong decodes by design):
  full      - current production formulation (4 bcast interleaves + pp RE)
  pp_noshuf - pm interleaves real; pp select WITHOUT interleave (isolates
              whether pp's shuffles or its shift/or ALU ops dominate)
  eo        - E/O half-space ACS: per stage two (16->32) merges for pm-halves
              and two for pp-halves (half-width interleaves)
  decbits   - E/O pm + decision-bit packs keyed by fixed state labels: NO pp
              shuffle at all (traceback cost measured separately)
  bit_tb    - bit-granular traceback loop alone (one-hot gather per stage)
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
LT = 128
N_TILES = 16
STAGES = N_PACKS * BPP


def merge(a, b):
    """interleave rows: [a0,b0,a1,b1,...]"""
    h, w = a.shape
    return jnp.stack([a, b], axis=1).reshape(2 * h, w)


def rep2(x):
    h, b = x.shape
    return jnp.broadcast_to(x[:, None, :], (h, 2, b)).reshape(2 * h, b)


def make_fwd_kernel(variant):
    def kernel(rs_ref, out_ref):
        def pack_body(p, carry):
            pm, pp = carry  # in 'eo'/'decbits': pm=(E,O) packed as (64,LT)

            def stage_full(s, pm, pp, shuffle_pp):
                rt = rs_ref[p, s]
                bmA = rt[0:1, :] + rt[1:2, :]
                pm_lo = rep2(pm[:32])
                pm_hi = rep2(pm[32:])
                cand0 = pm_lo + bmA
                cand1 = pm_hi - bmA
                dec = cand1 > cand0
                pm = jnp.where(dec, cand1, cand0)
                if shuffle_pp:
                    pp_sel = jnp.where(dec, rep2(pp[32:]), rep2(pp[:32]))
                else:
                    pp_sel = jnp.where(dec, pp, pp)
                pp = (pp_sel << 1) | dec.astype(jnp.int32)
                return pm, pp

            def stage_eo(s, pm, pp, exchange_pp):
                # pm holds (L | H) halves; compute E',O' then re-merge
                rt = rs_ref[p, s]
                bmE = rt[0:1, :] + rt[1:2, :]     # (1, LT) stand-in
                L, H = pm[:32], pm[32:]
                e_new = jnp.maximum(L + bmE, H - bmE)
                o_new = jnp.maximum(L - bmE, H + bmE)
                dec_e = (H - bmE) > (L + bmE)
                dec_o = (H + bmE) > (L - bmE)
                pm = jnp.concatenate(
                    [merge(e_new[:16], o_new[:16]),
                     merge(e_new[16:], o_new[16:])], axis=0)
                if exchange_pp:
                    pl_, ph_ = pp[:32], pp[32:]
                    pe = (jnp.where(dec_e, ph_, pl_) << 1) | dec_e.astype(jnp.int32)
                    po = (jnp.where(dec_o, ph_, pl_) << 1) | dec_o.astype(jnp.int32)
                    pp = jnp.concatenate(
                        [merge(pe[:16], po[:16]),
                         merge(pe[16:], po[16:])], axis=0)
                else:
                    # decision packs keyed by fixed labels: no shuffle
                    dec64 = jnp.concatenate([dec_e, dec_o], axis=0)
                    pp = (pp << 1) | dec64.astype(jnp.int32)
                return pm, pp

            for s in range(BPP):
                if variant == "full":
                    pm, pp = stage_full(s, pm, pp, True)
                elif variant == "pp_noshuf":
                    pm, pp = stage_full(s, pm, pp, False)
                elif variant == "eo":
                    pm, pp = stage_eo(s, pm, pp, True)
                elif variant == "decbits":
                    pm, pp = stage_eo(s, pm, pp, False)
            return pm, pp

        zeros = jnp.zeros((64, LT), jnp.int32)
        pm, pp = jax.lax.fori_loop(0, N_PACKS, pack_body, (zeros, zeros))
        out_ref[:] = pm + pp

    return kernel


def make_tb_kernel():
    def kernel(rs_ref, out_ref):
        states = jax.lax.broadcasted_iota(jnp.int32, (64, 1), 0)

        def body(t, carry):
            state, acc = carry
            surv = rs_ref[t % N_PACKS, t % BPP]   # (2, LT) source data
            surv64 = jnp.broadcast_to(surv[0:1, :], (64, LT))
            onehot = states == state
            pack = jnp.sum(jnp.where(onehot, surv64, 0), axis=0,
                           keepdims=True)
            d = (pack >> (31 - (t % 32))) & 1
            state = (state >> 1) | (d << 5)
            return state, acc + pack

        state, acc = jax.lax.fori_loop(
            0, STAGES, body,
            (jnp.zeros((1, LT), jnp.int32), jnp.zeros((1, LT), jnp.int32)))
        out_ref[:] = jnp.broadcast_to(acc + state, (64, LT))

    return kernel


def run(kernel, rs, label, denom):
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
    np.asarray(g(rs))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(g(rs))
        ts.append(time.perf_counter() - t0)
    t = min(ts) - 0.030
    print(f"{label:10s}: {min(ts)*1e3:7.1f} ms raw  "
          f"~{max(t,1e-12)*1e9/denom:7.0f} ns/stage/tile", flush=True)


def main():
    gen = jax.jit(lambda k: jax.random.randint(
        k, (N_PACKS, BPP, 2, N_TILES * LT), -100, 101, dtype=jnp.int32))
    rs = gen(jax.random.PRNGKey(0))
    jax.block_until_ready(rs)
    denom = N_TILES * STAGES
    for v in ["full", "pp_noshuf", "eo", "decbits"]:
        try:
            run(make_fwd_kernel(v), rs, v, denom)
        except Exception as e:
            print(f"{v:10s}: FAILED {type(e).__name__}: {str(e)[:150]}",
                  flush=True)
    try:
        run(make_tb_kernel(), rs, "bit_tb", denom)
    except Exception as e:
        print(f"bit_tb    : FAILED {type(e).__name__}: {str(e)[:150]}",
              flush=True)


if __name__ == "__main__":
    main()
