"""Benchmark + correctness-check candidate lowerings of the sublane
interleave (the perfect-shuffle step of the ACS) inside a Pallas kernel.

Target op: merge two (32, 128) arrays E, O into (64, 128) I with
I[2q] = E[q], I[2q+1] = O[q].
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

LT = 128
REPS = 16384    # interleaves per kernel program
N_TILES = 8


def merge_bcast(e, o):
    x = jnp.stack([e, o], axis=1)          # (32, 2, LT)
    return x.reshape(64, LT)


def merge_concat_wrong(e, o):              # perf floor probe (wrong result)
    return jnp.concatenate([e, o], axis=0)


def merge_rolled(e, o):
    # place E in even target rows / O in odd rows via arithmetic select on
    # a row-parity mask after "spreading" each source with a reshape-free
    # trick: X = concat(E, O); row r of I comes from X[(r>>1) + 32*(r&1)].
    # Not expressible without a shuffle; use masked adds of two tiles with
    # pltpu.roll to align: I = sel(parity, tile(O, shifted), tile(E, ...)).
    # tile(E,2)[r] = E[r mod 32]; we need E[r>>1]: not a roll. -> unused.
    raise NotImplementedError


def merge_scratch(e, o, scratch):
    # two strided sublane stores into VMEM scratch, then one read
    scratch[pl.Slice(0, 32, 2), :] = e
    scratch[pl.Slice(1, 32, 2), :] = o
    return scratch[:]


def make_kernel(variant):
    def kernel(x_ref, o_ref, scratch):
        e = x_ref[:32, :]
        o = x_ref[32:, :]

        def body(i, carry):
            e, o = carry
            if variant == "bcast":
                m = merge_bcast(e, o)
            elif variant == "concat":
                m = merge_concat_wrong(e, o)
            elif variant == "scratch":
                m = merge_scratch(e, o, scratch)
            e2 = m[:32, :] + 1
            o2 = m[32:, :] + 1
            return e2, o2

        e, o = jax.lax.fori_loop(0, REPS, body, (e, o))
        o_ref[:32, :] = e
        o_ref[32:, :] = o

    return kernel


def run_variant(variant, x):
    f = pl.pallas_call(
        make_kernel(variant),
        grid=(N_TILES,),
        in_specs=[pl.BlockSpec((64, LT), lambda i: (0, i),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((64, LT), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((64, N_TILES * LT), jnp.int32),
        scratch_shapes=[pltpu.VMEM((64, LT), jnp.int32)],
    )
    g = jax.jit(lambda v: jnp.sum(f(v)))
    np.asarray(g(x))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(g(x))
        ts.append(time.perf_counter() - t0)
    t = min(ts) - 0.030
    per = max(t, 1e-12) * 1e9 / (REPS * N_TILES)
    print(f"{variant:10s}: {min(ts)*1e3:7.1f} ms raw  ~{per:7.0f} ns/interleave/tile",
          flush=True)


def check_correct(variant):
    """single-rep correctness vs numpy"""
    def kernel(x_ref, o_ref, scratch):
        e = x_ref[:32, :]
        o = x_ref[32:, :]
        if variant == "bcast":
            m = merge_bcast(e, o)
        elif variant == "scratch":
            m = merge_scratch(e, o, scratch)
        else:
            m = merge_concat_wrong(e, o)
        o_ref[:] = m

    x = jnp.arange(64 * LT, dtype=jnp.int32).reshape(64, LT)
    out = pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((64, LT), jnp.int32),
        scratch_shapes=[pltpu.VMEM((64, LT), jnp.int32)],
    )(x)
    o = np.asarray(out)
    xn = np.asarray(x)
    want = np.empty_like(xn)
    want[0::2] = xn[:32]
    want[1::2] = xn[32:]
    ok = np.array_equal(o, want)
    print(f"{variant:10s}: correct={ok}", flush=True)
    return ok


def main():
    gen = jax.jit(lambda k: jax.random.randint(
        k, (64, N_TILES * LT), -100, 101, dtype=jnp.int32))
    x = gen(jax.random.PRNGKey(0))
    jax.block_until_ready(x)
    for v in ["bcast", "scratch", "concat"]:
        try:
            check_correct(v)
        except Exception as e:
            print(f"{v:10s}: check FAILED {type(e).__name__}: {str(e)[:150]}",
                  flush=True)
    for v in ["bcast", "scratch", "concat"]:
        try:
            run_variant(v, x)
        except Exception as e:
            print(f"{v:10s}: FAILED {type(e).__name__}: {str(e)[:150]}",
                  flush=True)


if __name__ == "__main__":
    main()
