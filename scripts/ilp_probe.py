"""VPU issue-rate probe: int32 (32,128) ops/cycle with 1 vs 4 independent
dependency chains.  If the VPU can issue >1 vreg-op/cycle given ILP, the
4-chain variant runs faster per op; if issue-limited at 1/cycle both match
~4.25 ns per (32,128) op (4 vregs @ 940 MHz)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

LT = 128
ROWS = 32
STEPS = 60000
UNROLL = 8           # dependent (add,max) pairs per chain per iter


def make_kernel(n_chains):
    def kernel(x_ref, out_ref):
        c = x_ref[1:2, :]

        def body(i, accs):
            accs = list(accs)
            for _ in range(UNROLL):
                for k in range(n_chains):
                    accs[k] = accs[k] + c
                    accs[k] = jnp.maximum(accs[k], c - accs[k])
            return tuple(accs)

        a0 = x_ref[...]
        accs = tuple(a0 + k for k in range(n_chains))
        accs = jax.lax.fori_loop(0, STEPS, body, accs)
        out = accs[0]
        for a in accs[1:]:
            out = out + a
        out_ref[...] = out
    return kernel


def run(n_chains):
    xs = [jnp.asarray(np.random.default_rng(i).integers(0, 7, (ROWS, LT)),
                      dtype=jnp.int32) for i in range(4)]
    f = pl.pallas_call(
        make_kernel(n_chains),
        out_shape=jax.ShapeDtypeStruct((ROWS, LT), jnp.int32),
    )
    g = jax.jit(lambda x: jnp.sum(f(x)))
    nul = jax.jit(lambda x: jnp.sum(x[0]))
    np.asarray(g(xs[0]))
    np.asarray(nul(xs[0]))
    floors, ts = [], []
    for x in xs:
        t0 = time.perf_counter(); np.asarray(nul(x))
        floors.append(time.perf_counter() - t0)
    for x in xs[1:]:
        t0 = time.perf_counter(); np.asarray(g(x))
        ts.append(time.perf_counter() - t0)
    t = min(ts) - min(floors)
    n_ops = STEPS * UNROLL * 2 * n_chains
    print(f"chains={n_chains}: {t*1e3:7.2f} ms, {t/n_ops*1e9:6.3f} ns per "
          f"(32,{LT}) int32 op = {t/n_ops*0.94e9/4:5.2f} cyc/vreg-op",
          flush=True)


if __name__ == "__main__":
    for n in (1, 2, 4):
        run(n)
