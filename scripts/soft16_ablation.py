"""Decompose SOFT16's +4-5 ns/stage over SOFT8 at the construct level
(VERDICT r3 item 1 fallback criterion: a scheduling-level decomposition).

scripts/soft16_fix.py measured all four per-stage unpack formulations
(pack/halves/lazy/group) IDENTICAL — the array-shape hypothesis is dead.
Remaining suspects, isolated here on the kernel_ablation harness (same
rotating-layout stage body, same pack loop, k-multi slope):

  s8/noup    — (16, LT) word blocks DMA'd per pack, bm from a fixed row
               (no unpack): SOFT8's input traffic, zero unpack work
  s16/noup   — (32, LT) word blocks, bm from a fixed row: SOFT16's 2x
               input traffic, zero unpack work.  Delta vs s8/noup = the
               pure DMA/VMEM-pressure cost of the wider wire format.
  s8/unpack  — real SOFT8 unpack + per-stage slices (kernel_ablation's
               +unpack variant)
  s16/unpack — real SOFT16 unpack ("pack" formulation).  Delta vs
               s16/noup = the unpack structure cost.

Usage: timeout 2400 python scripts/soft16_ablation.py
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from layout_probe import _one_real_stage, _stage_consts  # noqa: E402
from kernel_ablation import _make_ud_soft8, _one_real_stage_ud  # noqa: E402

LT = 128
N_PACKS = 256          # 8192 stages per program
GRID = 16
T0 = time.time()


def log(s):
    print(f"+{time.time()-T0:6.1f}s {s}", flush=True)


def _make_ud_soft16(wv):
    """Probe copy of _viterbi_kernel's SOFT16 'pack' unpack (width=16,
    vpw=2): wv (32, LT) int32, word s = stage s."""
    a0 = wv >> 16
    a1 = (wv << 16) >> 16
    u_all = a0 + a1
    d_all = a0 - a1

    def ud(s):
        return u_all[s:s + 1], d_all[s:s + 1]
    return ud


def _kernel(words_ref, out_ref, *, wpp, unpack):
    consts = _stage_consts()

    def pack_body(p, carry):
        pm, pp = carry
        wv = words_ref[p]
        if unpack:
            ud = _make_ud_soft16(wv) if wpp == 32 else _make_ud_soft8(wv)
            for s in range(32):
                u, d = ud(s)
                pm, pp = _one_real_stage_ud(s, pm, pp, u, d, consts)
        else:
            # input DMA'd and touched (one row feeds bm) but not unpacked
            u = wv[0:1]
            d = wv[1:2]
            for s in range(32):
                pm, pp = _one_real_stage_ud(s, pm, pp, u, d, consts)
        return pm, pp

    zeros = jnp.zeros((64, LT), jnp.int32)
    pm, pp = jax.lax.fori_loop(0, N_PACKS, pack_body, (zeros, zeros))
    out_ref[0:1] = (pm + pp)[0:1]


def time_variant(label, wpp, unpack, reps=4, k_hi=5):
    kern = functools.partial(_kernel, wpp=wpp, unpack=unpack)
    call = pl.pallas_call(
        kern,
        grid=(GRID,),
        in_specs=[pl.BlockSpec((N_PACKS, wpp, LT), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, LT), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, LT), jnp.int32),
    )

    def kmulti(*xs):
        return sum(jnp.sum(call(x)) for x in xs)
    j1, jh = jax.jit(kmulti), jax.jit(kmulti)
    gen = jax.jit(functools.partial(
        lambda key, w: jax.random.randint(
            key, (GRID * N_PACKS, w, LT), -2 ** 31, 2 ** 31 - 1,
            dtype=jnp.int32), w=wpp))
    xs = [gen(jax.random.PRNGKey(i)) for i in range(k_hi + 4)]
    jax.block_until_ready(xs)
    np.asarray(j1(xs[0]))
    np.asarray(jh(*xs[:k_hi]))
    n = len(xs)
    tl, th = [], []
    for j in range(reps):
        t0 = time.perf_counter()
        np.asarray(j1(xs[1 + (j % (n - 1))]))
        tl.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        np.asarray(jh(*(xs[(j + 2 + i) % n] for i in range(k_hi))))
        th.append(time.perf_counter() - t0)
    t = (min(th) - min(tl)) / (k_hi - 1)
    ns = t / (N_PACKS * 32 * GRID) * 1e9
    log(f"{label:12s} {ns:7.2f} ns/stage/tile "
        f"(t1={[f'{x*1e3:.1f}' for x in tl]} "
        f"tk={[f'{x*1e3:.1f}' for x in th]})")
    return ns


def main():
    log(f"backend={jax.default_backend()}")
    a = time_variant("s8/noup", 16, False)
    b = time_variant("s16/noup", 32, False)
    c = time_variant("s8/unpack", 16, True)
    d = time_variant("s16/unpack", 32, True)
    log(f"DMA cost of 2x words: {b-a:+.2f} ns/stage | "
        f"s8 unpack {c-a:+.2f} | s16 unpack {d-b:+.2f} | "
        f"format gap (unpacked) {d-c:+.2f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
