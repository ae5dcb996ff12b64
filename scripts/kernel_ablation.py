"""Ablation decomposition of the fused kernel's ns/stage (r3).

scripts/layout_probe.py measured the bare rotating-layout stage body at
21.3 ns/stage/tile while the full kernel runs 26-28: this probe adds the
remaining kernel pieces one at a time so the ~5-6 ns/stage delta gets a
per-piece accounting (the last open line in BASELINE.md's floor
analysis):

  body        — the stage body alone, u/d pre-staged as rows
                (== layout_probe variant A)
  +unpack     — SOFT8 word mode: per pack a (wpp=16, LT) int32 word
                block is sign-extend-unpacked into u_js/d_js and per
                stage ud(s) does the 1-row slice reads, exactly as
                _viterbi_kernel's make_ud; input DMA grows to the real
                per-pack word traffic
  +dump       — + the survivor-pack store surv_ref[p] = pp & mask into a
                full-size (n_packs, 64, LT) VMEM scratch
  +traceback  — + the one-hot pack-granular state chase emitting n_emit
                output rows (the full-store traceback)

Each variant: GRID programs x n_packs*32 stages, k-multi slope with
distinct inputs.  The word unpack is a deliberate 15-line copy of
_viterbi_kernel's SOFT8 path (probe-only; the production path is locked
by tests/test_word_mode_golden.py).

Usage: timeout 2400 python scripts/kernel_ablation.py
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

from layout_probe import _one_real_stage, _stage_consts

LT = 128
N_PACKS = 256          # 8192 stages per program
WPP = 16               # SOFT8: words per 32-stage pack
GRID = 16
T0 = time.time()


def log(s):
    print(f"+{time.time()-T0:6.1f}s {s}", flush=True)


def _make_ud_soft8(wv):
    """Probe copy of _viterbi_kernel's SOFT8 word unpack (width=8, vpw=4):
    wv (WPP, LT) int32 -> ud(s) closure with per-stage 1-row slices."""
    u_js, d_js = [], []
    for j in range(2):
        a0 = (wv << (2 * j * 8)) >> 24
        a1 = (wv << ((2 * j + 1) * 8)) >> 24
        u_js.append(a0 + a1)
        d_js.append(a0 - a1)

    def ud(s):
        j, k = s % 2, s // 2
        return u_js[j][k:k + 1], d_js[j][k:k + 1]
    return ud


def _kernel(words_ref, out_ref, surv_ref, *, unpack, dump, traceback,
            bisect_tb=False):
    consts = _stage_consts()
    if not unpack:
        # pre-staged u/d rows (layout_probe variant A shape): 32 rows each,
        # assembled from the first packs' word blocks (WPP=16 rows each)
        u_all = jnp.concatenate([words_ref[0], words_ref[1]], axis=0)
        d_all = jnp.concatenate([words_ref[2], words_ref[3]], axis=0)

    def pack_body(p, carry):
        pm, pp = carry
        if unpack:
            ud = _make_ud_soft8(words_ref[p])
        for s in range(32):
            if unpack:
                u, d = ud(s)
                pm, pp = _one_real_stage_ud(s, pm, pp, u, d, consts)
            else:
                pm, pp = _one_real_stage(s, pm, pp, u_all, d_all, consts)
        if dump:
            surv_ref[p] = pp
        return pm, pp

    zeros = jnp.zeros((64, LT), jnp.int32)
    pm, pp = jax.lax.fori_loop(0, N_PACKS, pack_body, (zeros, zeros))

    if traceback:
        states = jax.lax.broadcasted_iota(jnp.int32, (64, 1), 0)

        def tb_body(k, state):
            kp = N_PACKS - 1 - k
            if bisect_tb:
                x = surv_ref[kp]
                for b in (5, 4, 3, 2, 1, 0):
                    h = 1 << b
                    bit = jax.lax.shift_right_logical(state, b) & 1
                    x = jnp.where(bit == 1, x[h:2 * h], x[0:h])
                pack = x
            else:
                onehot = states == state
                pack = jnp.sum(jnp.where(onehot, surv_ref[kp], 0), axis=0,
                               keepdims=True)
            new_state = jax.lax.shift_right_logical(pack, 26) & 63

            @pl.when(k >= 1)
            def _():
                out_ref[pl.ds(kp - 1, 1), :] = pack

            return new_state

        jax.lax.fori_loop(0, N_PACKS - 1, tb_body,
                          jnp.zeros((1, LT), jnp.int32))
    else:
        out_ref[0:1] = (pm + pp)[0:1]


def _one_real_stage_ud(s, pm, pp, u, d, consts):
    """_one_real_stage but taking the (1, LT) u/d directly."""
    from layout_probe import GROUP_LEN, _slice_cat, _write_cat
    runs_lo, runs_hi, s0, s1, same_sign, write = consts[s % GROUP_LEN]
    bm = jnp.where(same_sign, u, d) * s0
    lo = _slice_cat(pm, runs_lo)
    hi = _slice_cat(pm, runs_hi)
    c0e = lo + bm
    c1e = hi - bm
    dec_e = c1e > c0e
    e_new = jnp.where(dec_e, c1e, c0e)
    c0o = lo - bm
    c1o = hi + bm
    dec_o = c1o > c0o
    o_new = jnp.where(dec_o, c1o, c0o)
    pl_ = _slice_cat(pp, runs_lo)
    ph_ = _slice_cat(pp, runs_hi)
    from_lo = pl_ + pl_
    from_hi = ph_ + ph_ + 1
    pe = jnp.where(dec_e, from_hi, from_lo)
    po = jnp.where(dec_o, from_hi, from_lo)
    if write is None:
        pm = jnp.concatenate([e_new, o_new], axis=0)
        pp = jnp.concatenate([pe, po], axis=0)
    else:
        pm = _write_cat(e_new, o_new, write)
        pp = _write_cat(pe, po, write)
    return pm, pp


def time_variant(label, unpack, dump, traceback, bisect_tb=False,
                 reps=4, k_hi=5):
    n_emit = N_PACKS - 1 if traceback else 1
    kern = functools.partial(_kernel, unpack=unpack, dump=dump,
                             traceback=traceback, bisect_tb=bisect_tb)
    call = pl.pallas_call(
        kern,
        grid=(GRID,),
        in_specs=[pl.BlockSpec((N_PACKS, WPP, LT), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((n_emit, LT), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_emit, LT), jnp.int32),
        scratch_shapes=[pltpu.VMEM((N_PACKS, 64, LT), jnp.int32)],
    )

    def kmulti(*xs):
        return sum(jnp.sum(call(x)) for x in xs)
    j1, jh = jax.jit(kmulti), jax.jit(kmulti)
    gen = jax.jit(lambda key: jax.random.randint(
        key, (GRID * N_PACKS, WPP, LT), -2 ** 31, 2 ** 31 - 1,
        dtype=jnp.int32))
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
    a = time_variant("body", False, False, False)
    b = time_variant("+unpack", True, False, False)
    c = time_variant("+dump", True, True, False)
    d = time_variant("+traceback", True, True, True)
    e = time_variant("+tb(bisect)", True, True, True, bisect_tb=True)
    log(f"decomposition: body {a:.2f} | unpack {b-a:+.2f} | "
        f"dump {c-b:+.2f} | traceback {d-c:+.2f} "
        f"(bisect {e-c:+.2f}) | total {d:.2f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
