"""Staging-transpose experiments at the 32M-bit shape: (B, Lw) block-major
packed words -> (Lw, B) word-major, B=15744, Lw=1056 int32 (64 MB).

  xla     - jnp.transpose (what stage_words does today)
  pallas  - transpose kernel: grid over 128-block x 128-word tiles,
            jnp .T per tile
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

B, LW = 15744, 1056
T0 = time.time()


def log(s):
    print(f"+{time.time()-T0:6.1f}s {s}", flush=True)


def slope(make_k, xs, reps=4, ks=(1, 5)):
    f1, f5 = make_k(ks[0]), make_k(ks[1])
    np.asarray(f1(*xs[:ks[0]]))
    np.asarray(f5(*xs[:ks[1]]))
    t1s, t5s = [], []
    n = len(xs)
    for j in range(reps):
        t0 = time.perf_counter()
        np.asarray(f1(*(xs[(j + 1 + i) % n] for i in range(ks[0]))))
        t1s.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        np.asarray(f5(*(xs[(j + 2 + i) % n] for i in range(ks[1]))))
        t5s.append(time.perf_counter() - t0)
    return (min(t5s) - min(t1s)) / (ks[1] - ks[0])


def _tr_kernel(x_ref, o_ref):
    o_ref[...] = x_ref[...].T


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
            jnp.sum(z.transpose(1, 0)[:, 5]) for z in zs))
    t = slope(mk_xla, xs)
    log(f"xla transpose   : {t*1e3:6.2f} ms ({2*B*LW*4/t/1e9:5.0f} GB/s)")

    for tb, tw in ((256, 256), (512, 512), (128, 1056)):
        def mk_pl(k, tb=tb, tw=tw):
            return jax.jit(lambda *zs: sum(
                jnp.sum(pallas_transpose(z, tb, tw)[:, 5]) for z in zs))
        try:
            t = slope(mk_pl, xs)
            log(f"pallas {tb}x{tw:4d} : {t*1e3:6.2f} ms "
                f"({2*B*LW*4/t/1e9:5.0f} GB/s)")
        except Exception as e:
            log(f"pallas {tb}x{tw}: FAILED {str(e)[:120]}")


if __name__ == "__main__":
    main()
