"""Staging-transpose experiments at the 32M-bit shape: (B, Lw) block-major
packed words -> (Lw, B) word-major, B=15744, Lw=1056 int32 (64 MB).

  xla     - jnp.transpose, materialization forced by feeding the result
            to a pallas sum consumer (a bare sum-of-transpose is rewritten
            by XLA to a sum over the input and times nothing)
  pallas  - transpose kernel: tiles through VMEM, jnp .T per tile
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from timing_util import slope  # noqa: E402

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B, LW = 15744, 1056
T0 = time.time()


def log(s):
    print(f"+{time.time()-T0:6.1f}s {s}", flush=True)



def _tr_kernel(x_ref, o_ref):
    o_ref[...] = x_ref[...].T


def _sum_kernel(x_ref, o_ref):
    @pl.when(pl.program_id(0) == 0)
    def _():
        o_ref[...] = jnp.zeros_like(o_ref)
    o_ref[...] += jnp.sum(x_ref[...], axis=0, keepdims=True)[:, :128]


def pallas_consume(t):
    """Force `t` (2D) to materialize in its own layout: a pallas reduction
    must read the real array (XLA cannot rewrite through a pallas_call)."""
    rows = 128
    rp = -(-t.shape[0] // rows) * rows
    if rp != t.shape[0]:
        t = jnp.pad(t, ((0, rp - t.shape[0]), (0, 0)))
    out = pl.pallas_call(
        _sum_kernel,
        grid=(rp // rows,),
        in_specs=[pl.BlockSpec((rows, t.shape[1]), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 128), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, 128), t.dtype),
    )(t)
    return jnp.sum(out)


def pallas_transpose(x, tb=256, tw=256):
    bp = -(-x.shape[0] // tb) * tb
    wp = -(-x.shape[1] // tw) * tw
    if (bp, wp) != x.shape:
        x = jnp.pad(x, ((0, bp - x.shape[0]), (0, wp - x.shape[1])))
    out = pl.pallas_call(
        _tr_kernel,
        grid=(bp // tb, wp // tw),
        in_specs=[pl.BlockSpec((tb, tw), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((tw, tb), lambda i, j: (j, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((wp, bp), jnp.int32),
    )(x)
    return out


def main():
    gen = jax.jit(lambda k: jax.random.randint(
        k, (B, LW), -2 ** 31, 2 ** 31 - 1, dtype=jnp.int32))
    xs = [gen(jax.random.PRNGKey(i)) for i in range(8)]
    np.asarray(sum(jnp.sum(x[0, :4]) for x in xs))

    def mk_xla(k):
        return jax.jit(lambda *zs: sum(
            pallas_consume(z.transpose(1, 0)) for z in zs))
    t = slope(mk_xla, xs)
    log(f"xla transpose   : {t*1e3:6.2f} ms ({2*B*LW*4/t/1e9:5.0f} GB/s)")

    for tb, tw in ((256, 256), (512, 512), (128, 1056)):
        def mk_pl(k, tb=tb, tw=tw):
            return jax.jit(lambda *zs: sum(
                jnp.sum(pallas_transpose(z, tb, tw)[:, 5]) for z in zs))
        # (no consumer needed: the pallas_call itself materializes)
        try:
            t = slope(mk_pl, xs)
            log(f"pallas {tb}x{tw:4d} : {t*1e3:6.2f} ms "
                f"({2*B*LW*4/t/1e9:5.0f} GB/s)")
        except Exception as e:
            log(f"pallas {tb}x{tw}: FAILED {str(e)[:120]}")


if __name__ == "__main__":
    main()
