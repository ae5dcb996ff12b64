"""SWAR int16x2 ACS experiment (VERDICT r1 item 2).

Hypothesis: packing two states' PMs into one int32 lane word (the TPU
emulation of the reference's int16x2 packed-pair path,
viterbiACS.cuh:98-198) halves the 64-row state axis to 32 rows and thus
attacks the measured ~45% relayout share of an ACS stage.

Op-count arithmetic first (the probe measures it):

  current stage (core_pallas._decode_core): ~15 (32,128)-shaped int32 ops
    4 candidate adds + 2 cmps + 4 selects + bm select/sign
    + 3 register-exchange ops; relayout amortized to ~1 permutation
    write / 4 stages by the rotating layout.

  SWAR stage: PM word w_q = pm[q] | pm[q+32] << 16 co-locates each
    butterfly's predecessor pair, so predecessor slice reads vanish — but
    (a) TPU has no dual-add: each SWAR add needs the mask-fix emulation
        s = ((a & ~H) + (b & ~H)) ^ ((a ^ b) & H), 5 ops for 2 adds;
    (b) the compare/select is horizontal (lo vs hi half of one word):
        sign-extended extraction costs 3 ops per operand pair;
    (c) children must be repacked (q', q'+32) for the next stage: an
        e/o 1-row interleave at 16-row granularity EVERY stage — the
        exact relayout the rotating layout exists to avoid — or a
        rotating-layout analog that still pays the slice reads at half
        the rows;
    (d) the 32-bit path registers cannot pack: their relayout share is
        untouched.

The probe times G stages of each inner structure in identical Pallas
harnesses (fori_loop over stages, same memory traffic) and prints
ns/stage for: the shipped structure (baseline), the SWAR structure with
per-stage repack, and the SWAR structure with rotating-layout-style
deferred repack (lower bound: repack cost set to one 1-row interleave
per 4 stages).

Usage: timeout 1800 python scripts/swar_probe.py
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

LT = 128
STAGES = 8192          # sequential stages per grid program
GRID = 16              # programs per call: 16 x 8192 x ~25 ns ~= 3.3 ms,
                       # well above the relay floor's +-1 ms noise
T0 = time.time()


def log(s):
    print(f"+{time.time()-T0:6.1f}s {s}", flush=True)


_H = int(np.int32(np.uint32(0x80008000)))
_NH = int(np.int32(np.uint32(0x7FFF7FFF)))


def swar_add(a, b):
    """Dual 16-bit add without cross-carry (5 ops)."""
    H = jnp.int32(_H)
    NH = jnp.int32(_NH)
    return ((a & NH) + (b & NH)) ^ ((a ^ b) & H)


def _baseline_kernel(x_ref, o_ref, *, stages):
    """The shipped per-stage op structure on (64, LT) pm + (64, LT) pp:
    4 adds, 2 cmps, 4 selects, 3 register-exchange ops, bm sign; slice
    reads at 32-row granularity; 1 permutation write per 4 stages modeled
    as an extra pair of 1-row-granularity concats."""
    pm = x_ref[0:64]
    pp = x_ref[64:128]
    bm = x_ref[128:160]

    def body(s, carry):
        pm, pp = carry
        lo = pm[0:32]
        hi = pm[32:64]
        c0e = lo + bm
        c1e = hi - bm
        de = c1e > c0e
        e = jnp.where(de, c1e, c0e)
        c0o = lo - bm
        c1o = hi + bm
        do = c1o > c0o
        o = jnp.where(do, c1o, c0o)
        pl_ = pp[0:32]
        ph_ = pp[32:64]
        fl = pl_ + pl_
        fh = ph_ + ph_ + 1
        pe = jnp.where(de, fh, fl)
        po = jnp.where(do, fh, fl)
        pm = jnp.concatenate([e, o], axis=0)
        pp = jnp.concatenate([pe, po], axis=0)
        return pm, pp

    pm, pp = jax.lax.fori_loop(0, stages, body, (pm, pp))
    o_ref[...] = pm + pp


def _swar_kernel(x_ref, o_ref, *, stages, repack_every):
    """SWAR structure: pm packed (32, LT) words (q | q+32<<16); pp stays
    (64, LT).  repack_every=1 is the faithful variant; repack_every=4
    models a rotating-layout analog (deferred repack lower bound)."""
    pmw = x_ref[0:32]
    pp = x_ref[32:96]
    bm = x_ref[96:128]
    mask16 = jnp.int32(0xFFFF)

    def one_stage(pmw, pp, full_repack):
        # packed bm addend for e-children: lo += bm, hi -= bm
        nbm = -bm
        bme = (bm & mask16) | (nbm << 16)
        bmo = (nbm & mask16) | (bm << 16)
        ce = swar_add(pmw, bme)                  # 5 ops
        co = swar_add(pmw, bmo)                  # 5 ops
        # horizontal signed-16 max: extract halves (3 ops each operand)
        ce_lo = (ce << 16) >> 16
        ce_hi = ce >> 16
        de = ce_hi > ce_lo
        e = jnp.where(de, ce_hi, ce_lo)
        co_lo = (co << 16) >> 16
        co_hi = co >> 16
        do = co_hi > co_lo
        o = jnp.where(do, co_hi, co_lo)
        # path registers: unchanged 64-row structure
        pl_ = pp[0:32]
        ph_ = pp[32:64]
        fl = pl_ + pl_
        fh = ph_ + ph_ + 1
        pe = jnp.where(de, fh, fl)
        po = jnp.where(do, fh, fl)
        pp = jnp.concatenate([pe, po], axis=0)

        if full_repack:
            # children repacked into (q', q'+32) words: q' rows are a
            # 1-row e/o interleave (the relayout the rotating layout
            # exists to avoid — stack+reshape, measured ~34 ns/occurrence)
            lo_rows = jnp.stack([e[0:16], o[0:16]], axis=1) \
                .reshape(32, e.shape[1])
            hi_rows = jnp.stack([e[16:32], o[16:32]], axis=1) \
                .reshape(32, e.shape[1])
            pmw = (lo_rows & mask16) | (hi_rows << 16)
        else:
            # rotated layout kept: pair stays co-located, cheap 3 ops
            pmw = (e & mask16) | (o << 16)
        return pmw, pp

    def body(s, carry):
        pmw, pp = carry
        for t in range(repack_every):           # static unroll
            pmw, pp = one_stage(pmw, pp, t == repack_every - 1)
        return pmw, pp

    pmw, pp = jax.lax.fori_loop(0, stages // repack_every, body, (pmw, pp))
    o_ref[...] = jnp.concatenate([pmw, pmw], axis=0) + pp


def time_kernel(kernel_fn, rows_in, label, reps=4, k=(1, 5)):
    call = pl.pallas_call(
        kernel_fn,
        grid=(GRID,),
        in_specs=[pl.BlockSpec((rows_in, LT), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((64, LT), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((64, LT), jnp.int32),
    )

    def kmulti(*xs):
        return sum(jnp.sum(call(x)) for x in xs)
    j1, j5 = jax.jit(kmulti), jax.jit(kmulti)
    gen = jax.jit(lambda key: jax.random.randint(
        key, (GRID * rows_in, LT), 0, 8000, dtype=jnp.int32))
    xs = [gen(jax.random.PRNGKey(i)) for i in range(8)]
    jax.block_until_ready(xs)
    np.asarray(j1(xs[0]))
    np.asarray(j5(*xs[:k[1]]))
    tl, th = [], []
    for j in range(reps):
        t0 = time.perf_counter()
        np.asarray(j1(xs[(j + 1) % 8]))
        tl.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        np.asarray(j5(*(xs[(j + 2 + i) % 8] for i in range(k[1]))))
        th.append(time.perf_counter() - t0)
    t = (min(th) - min(tl)) / (k[1] - k[0])
    ns = t / (STAGES * GRID) * 1e9
    log(f"{label:24s} {ns:7.2f} ns/stage "
        f"(t1={[f'{x*1e3:.1f}' for x in tl]} t5={[f'{x*1e3:.1f}' for x in th]})")
    return ns


def main():
    log(f"backend={jax.default_backend()}  stages={STAGES}")
    base = time_kernel(
        functools.partial(_baseline_kernel, stages=STAGES), 160,
        "baseline structure")
    s1 = time_kernel(
        functools.partial(_swar_kernel, stages=STAGES, repack_every=1),
        128, "swar repack/stage")
    s4 = time_kernel(
        functools.partial(_swar_kernel, stages=STAGES, repack_every=4),
        128, "swar repack/4stages")
    log(f"verdict: baseline {base:.2f} vs swar {s1:.2f} / "
        f"{s4:.2f} ns/stage "
        f"({'SWAR wins' if min(s1, s4) < base else 'negative result'})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
