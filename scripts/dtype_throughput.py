"""VPU dtype-throughput probe: does Mosaic on this backend run 16-bit
vector ops at 2x rate (packed (16,128,2) vregs), and do they compile at all?

Runs a Pallas kernel per dtype: fori_loop of STEPS iterations, each an
unrolled batch of UNROLL dependent add/max pairs on a (32, LT) array.
Reports ns per (32,128)-op; int32 is the 4-vreg baseline (~4.25 ns @940MHz
if issue-limited at 1 vreg-op/cycle).
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

LT = 128
ROWS = 32
STEPS = 2000
UNROLL = 16          # ops per loop iter = 2*UNROLL (add + max)


def make_kernel(dtype):
    def kernel(x_ref, out_ref):
        c = x_ref[1:2, :].astype(dtype)          # (1, LT) broadcast operand

        def body(i, a):
            for _ in range(UNROLL):
                a = a + c
                a = jnp.maximum(a, c - a)
            return a

        a0 = x_ref[...].astype(dtype)
        a = jax.lax.fori_loop(0, STEPS, body, a0)
        out_ref[...] = a.astype(jnp.int32)
    return kernel


def run(dtype_name):
    dtype = dict(int32=jnp.int32, int16=jnp.int16, bf16=jnp.bfloat16,
                 fp16=jnp.float16, fp32=jnp.float32, int8=jnp.int8)[dtype_name]
    xs = [jnp.asarray(np.random.default_rng(i).integers(0, 7, (ROWS, LT)),
                      dtype=jnp.int32) for i in range(4)]
    f = pl.pallas_call(
        make_kernel(dtype),
        out_shape=jax.ShapeDtypeStruct((ROWS, LT), jnp.int32),
    )
    g = jax.jit(lambda x: jnp.sum(f(x)))
    nul = jax.jit(lambda x: jnp.sum(x[0]))
    try:
        np.asarray(g(xs[0]))          # compile + first run
    except Exception as e:
        print(f"{dtype_name:6s}: COMPILE FAILED {type(e).__name__}: "
              f"{str(e)[:200]}", flush=True)
        return
    np.asarray(nul(xs[0]))
    floors, ts = [], []
    for x in xs:
        t0 = time.perf_counter(); np.asarray(nul(x))
        floors.append(time.perf_counter() - t0)
    for x in xs[1:]:
        t0 = time.perf_counter(); np.asarray(g(x))
        ts.append(time.perf_counter() - t0)
    t = min(ts) - min(floors)
    n_ops = STEPS * UNROLL * 2
    print(f"{dtype_name:6s}: {t*1e3:7.2f} ms total, "
          f"{t/n_ops*1e9:6.2f} ns per (32,{LT}) op  "
          f"(raw {[f'{x*1e3:.1f}' for x in ts]}, floor {min(floors)*1e3:.1f})",
          flush=True)


if __name__ == "__main__":
    names = sys.argv[1:] or ["int32", "fp32", "bf16", "fp16", "int16", "int8"]
    for n in names:
        run(n)
