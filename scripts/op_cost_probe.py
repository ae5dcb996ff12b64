"""Per-construct VPU cost probe at (32,128) int32 granularity.

Methodology: each variant's kernel takes a step count baked in statically;
we time STEPS_LO and STEPS_HI versions and report the slope
(t_hi - t_lo) / (STEPS_HI - STEPS_LO), which cancels the relay dispatch
floor exactly.  min over several distinct-input dispatches each.

Constructs of the production ACS stage (core_pallas.run_stage):
  add        a = a + c                  (dependent-chain add)
  add4       4 independent adds         (ILP: measures issue width)
  mul        a = a * c                  (int32 multiply rate)
  cmpsel     m = a > c ; a = where(m, c - a, a)
  selconst   a = where(MASK, a + c, a - c)   constant (32,1) mask select
  bcast      a = a + u where u is (1,LT)     broadcast operand
  merge      a = merge(a[:16]+c16, a[16:]-c16)  stack+reshape interleave
  halves     a = cat(a[:16]+c16, a[16:]-c16)    same but contiguous halves
  shiftor    a = (a << 1) | (c & 1)
"""

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
UNROLL = 8
STEPS_LO = 5000
STEPS_HI = 45000
REPS = 8
N_TILES = 16


def _merge(a, b):
    h, w = a.shape
    return jnp.stack([a, b], axis=1).reshape(2 * h, w)


def make_kernel(variant, steps):
    def kernel(x_ref, out_ref):
        c = x_ref[...]
        u = x_ref[1:2, :]
        mask = jax.lax.broadcasted_iota(jnp.int32, (ROWS, 1), 0) % 3 == 0
        PERM = jnp.asarray(np.r_[1:ROWS, 0], dtype=jnp.int32)

        def one(a):
            if variant == "add":
                return a + c
            if variant == "mul":
                return a * c
            if variant == "cmpsel":
                m = a > c
                return jnp.where(m, c - a, a)
            if variant == "selconst":
                return jnp.where(mask, a + c, a - c)
            if variant == "bcast":
                return a + u
            if variant == "merge":
                return _merge(a[:16] + c[:16], a[16:] - c[16:])
            if variant == "halves":
                return jnp.concatenate([a[:16] + c[:16], a[16:] - c[16:]],
                                       axis=0)
            if variant == "shiftor":
                return (a << 1) | (c & 1)
            if variant.startswith("cat"):
                g = int(variant[3:])            # slice granularity in rows
                e = a[:16] + c[:16]
                o = a[16:] - c[16:]
                parts = []
                for i in range(0, 16, g):
                    parts.append(e[i:i + g])
                    parts.append(o[i:i + g])
                return jnp.concatenate(parts + parts, axis=0)[:32]
            if variant == "permgather":
                return jnp.take(a, PERM, axis=0) + c
            if variant == "rollsub":
                import jax.experimental.pallas.tpu as _pt
                return _pt.roll(a, 1, 0) + c
            raise ValueError(variant)

        if variant == "add4":
            def body(i, accs):
                accs = list(accs)
                for _ in range(UNROLL):
                    for k in range(4):
                        accs[k] = accs[k] + c
                return tuple(accs)
            accs = jax.lax.fori_loop(
                0, steps, body, tuple(x_ref[...] + k for k in range(4)))
            out_ref[...] = accs[0] + accs[1] + accs[2] + accs[3]
            return

        def body(i, a):
            for _ in range(UNROLL):
                a = one(a)
            return a

        out_ref[...] = jax.lax.fori_loop(0, steps, body, x_ref[...])
    return kernel


# (32,LT)-op count per `one` application, for per-op normalization
N_OPS = dict(add=1, add4=4, mul=1, cmpsel=3, selconst=3, bcast=1, merge=3,
             halves=3, shiftor=3, cat8=3, cat4=3, cat2=3, cat1=3,
             permgather=2, rollsub=2)


def _time_one(f, xs):
    g = jax.jit(lambda x: jnp.sum(f(x)))
    np.asarray(g(xs[0]))                       # compile + warm
    ts = []
    for i in range(REPS):
        x = xs[1 + i % (len(xs) - 1)]
        t0 = time.perf_counter(); np.asarray(g(x))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def run(variant):
    xs = [jnp.asarray(np.random.default_rng(i).integers(0, 7, (ROWS, LT)),
                      dtype=jnp.int32) for i in range(8)]
    try:
        fs = [pl.pallas_call(
                  make_kernel(variant, s),
                  grid=(N_TILES,),
                  in_specs=[pl.BlockSpec((ROWS, LT), lambda i: (0, 0))],
                  out_specs=pl.BlockSpec((ROWS, LT), lambda i: (0, 0)),
                  out_shape=jax.ShapeDtypeStruct((ROWS, LT), jnp.int32))
              for s in (STEPS_LO, STEPS_HI)]
        t_lo = _time_one(fs[0], xs)
        t_hi = _time_one(fs[1], xs)
    except Exception as e:
        print(f"{variant:9s}: COMPILE FAILED {str(e)[:160]}", flush=True)
        return
    per_group = (t_hi - t_lo) / ((STEPS_HI - STEPS_LO) * UNROLL * N_TILES) * 1e9
    per_op = per_group / N_OPS[variant]
    print(f"{variant:9s}: lo={t_lo*1e3:6.1f} hi={t_hi*1e3:6.1f} ms  "
          f"{per_group:7.2f} ns/group ({N_OPS[variant]} ops) = "
          f"{per_op:6.2f} ns/op ({per_op*0.94:5.2f} cyc)", flush=True)


if __name__ == "__main__":
    names = sys.argv[1:] or list(N_OPS)
    for v in names:
        run(v)
