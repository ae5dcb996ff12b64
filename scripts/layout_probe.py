"""Layout-formulation probe (VERDICT r2 next-round item 1): the two
untried attacks on the ~50% relayout share of an ACS stage, A/B'd against
the REAL shipped stage structure (not a simplified model).

A. `real`   — the shipped rotating-layout stage body, verbatim semantics:
              _group_schedule slice reads, group-final permutation write,
              premultiplied register-exchange (core_pallas._decode_core),
              per-stage (1, LT) u/d row reads as in word mode.
B. `dual`   — TWO independent 64-state arrays interleaved in one kernel
              program at half the grid (same total work): the TPU analog
              of the reference's blockDimY=2 occupancy trick
              (viterbi.cu:221-222, blockDimY viterbi.h:78).  If Mosaic can
              overlap one array's group-final sublane-permutation write
              with the other's ALU work, ns/stage/array drops below A.
C. `lanes`  — the SURVEY §7.3-1 states-on-lanes layout, never prototyped
              in r1/r2: 2 blocks x 64 states per 128-lane row, blocks on
              sublanes; the butterfly is the reference's warp-lane
              shuffle-exchange (viterbiACS.cuh:418-480) transplanted to
              the lane axis — partner = lane-xor by 2^k, realized as
              select(roll(+k), roll(-k)) with a 6-cycle rotating pairing.
              Every op is full-width (64, 128) (both children computed in
              one vector) where A's are (32, 128), but there are no
              sublane relayouts at all.

Each variant runs STAGES sequential stages x GRID independent programs on
the chip; k-multi slope timing (distinct inputs per dispatch — the relay
memoizes).  Prints ns/stage normalized per 128-block tile so the numbers
are directly comparable to BENCH ns_per_stage.

Usage: timeout 1800 python scripts/layout_probe.py
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

from tpu_viterbi.decoder.core_pallas import (_group_schedule, _parity,
                                             _slice_cat, _write_cat,
                                             GROUP_LEN, _TAP_MASK0,
                                             _TAP_MASK1)

LT = 128
STAGES = 8192
GRID = 16
T0 = time.time()


def log(s):
    print(f"+{time.time()-T0:6.1f}s {s}", flush=True)


def _stage_consts(dtype=jnp.int32):
    """The shipped per-group-stage sign constants, rebuilt from iota
    exactly as _decode_core does."""
    sched = _group_schedule()
    consts = []
    i32 = jax.lax.broadcasted_iota(jnp.int32, (32, 1), 0)
    for runs_lo, runs_hi, bitperm, write in sched:
        q = jnp.zeros_like(i32)
        for a, b in bitperm:
            q = q | (((i32 >> a) & 1) << b)
        w = 2 * q
        s0 = (2 * _parity(w & _TAP_MASK0) - 1).astype(dtype)
        s1 = (2 * _parity(w & _TAP_MASK1) - 1).astype(dtype)
        consts.append((runs_lo, runs_hi, s0, s1, s0 == s1, write))
    return consts


def _one_real_stage(s, pm, pp, u_all, d_all, consts):
    """Verbatim core_pallas._decode_core.run_stage (int path)."""
    runs_lo, runs_hi, s0, s1, same_sign, write = consts[s % GROUP_LEN]
    u = u_all[s % 32: s % 32 + 1]
    d = d_all[s % 32: s % 32 + 1]
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


def _real_kernel(x_ref, o_ref, *, stages):
    consts = _stage_consts()
    pm = x_ref[0:64]
    pp = x_ref[64:128]
    u_all = x_ref[128:160]
    d_all = x_ref[160:192]

    def body(s32, carry):
        pm, pp = carry
        for s in range(32):
            pm, pp = _one_real_stage(s, pm, pp, u_all, d_all, consts)
        return pm, pp

    pm, pp = jax.lax.fori_loop(0, stages // 32, body, (pm, pp))
    o_ref[...] = pm + pp


def _dual_kernel(x_ref, o_ref, *, stages):
    consts = _stage_consts()
    pmA, ppA = x_ref[0:64], x_ref[64:128]
    uA, dA = x_ref[128:160], x_ref[160:192]
    pmB, ppB = x_ref[192:256], x_ref[256:320]
    uB, dB = x_ref[320:352], x_ref[352:384]

    def body(s32, carry):
        pmA, ppA, pmB, ppB = carry
        for s in range(32):
            # textual interleave: Mosaic is free to overlap A's
            # permutation writes with B's ALU chain
            pmA, ppA = _one_real_stage(s, pmA, ppA, uA, dA, consts)
            pmB, ppB = _one_real_stage(s, pmB, ppB, uB, dB, consts)
        return pmA, ppA, pmB, ppB

    pmA, ppA, pmB, ppB = jax.lax.fori_loop(
        0, stages // 32, body, (pmA, ppA, pmB, ppB))
    o_ref[...] = pmA + ppA + pmB + ppB


def _lane_consts():
    """Per-phase constants for the lane-axis shuffle-exchange, built from
    a lane iota: pairing masks cycle k = 1,2,4,8,16,32 (the warp 6-cycle,
    viterbiACS.cuh:461-480); per phase we need the partner-select mask,
    a +-1 sign vector (state-dependent branch-metric sign), the u-vs-d
    same-sign select, and the inserted decision bit of each candidate."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, LT), 1)
    state = lane & 63
    s0 = 2 * _parity(2 * state & _TAP_MASK0) - 1
    s1 = 2 * _parity(2 * state & _TAP_MASK1) - 1
    same = s0 == s1
    phases = []
    for t in range(6):
        k = 1 << t
        is_lo = (lane & k) == 0
        phases.append((k, is_lo, s0, same,
                       (jax.lax.shift_right_logical(lane, 5) & 1)))
    return phases


def _exchange(x, k, is_lo):
    # partner[l] = x[l ^ k]: lanes with bit k clear read l+k
    # (= roll by 128-k), lanes with it set read l-k (= roll by k)
    return jnp.where(is_lo, pltpu.roll(x, 128 - k, 1),
                     pltpu.roll(x, k, 1))


def _lanes_kernel(x_ref, o_ref, *, stages):
    """States-on-lanes: pm/pp (64, 128) = 64 sublane rows x (2 blocks x
    64 states); all ops full-width; partner exchange = 2 rolls + select.
    Op structure faithful to the butterfly semantics (each position
    computes one child from self + partner with signed bm and a
    premultiplied path register).

    NOTE the probe is OPTIMISTIC for this variant: bm arrives as a cheap
    (1, 128) row (as if u/d were already block-broadcast per lane), while
    a real lanes kernel must broadcast each block's u across its 64 state
    lanes (a lane-broadcast per stage) — so a loss here is decisive, a
    narrow win is not."""
    phases = _lane_consts()
    pm = x_ref[0:64]
    pp = x_ref[64:128]
    u_all = x_ref[128:160]
    d_all = x_ref[160:192]

    def body(s32, carry):
        pm, pp = carry
        for s in range(32):
            k, is_lo, sgn, same, bhigh = phases[s % 6]
            u = u_all[s % 32: s % 32 + 1]
            d = d_all[s % 32: s % 32 + 1]
            bm = jnp.where(same, u, d) * sgn        # (64,128) via bcast
            part_pm = _exchange(pm, k, is_lo)       # 3 ops
            part_pp = _exchange(pp, k, is_lo)       # 3 ops
            c_self = pm + bm
            c_part = part_pm - bm
            dec = c_part > c_self
            pm = jnp.where(dec, c_part, c_self)
            f_self = pp + pp + (1 - bhigh)
            f_part = part_pp + part_pp + bhigh
            pp = jnp.where(dec, f_part, f_self)
        return pm, pp

    pm, pp = jax.lax.fori_loop(0, stages // 32, body, (pm, pp))
    o_ref[...] = pm + pp


def time_kernel(kernel_fn, rows_in, label, arrays_per_prog=1, grid=GRID,
                reps=4, k_hi=5):
    call = pl.pallas_call(
        kernel_fn,
        grid=(grid,),
        in_specs=[pl.BlockSpec((rows_in, LT), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((64, LT), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((64, LT), jnp.int32),
    )

    def kmulti(*xs):
        return sum(jnp.sum(call(x)) for x in xs)
    j1, jh = jax.jit(kmulti), jax.jit(kmulti)
    gen = jax.jit(lambda key: jax.random.randint(
        key, (grid * rows_in, LT), 0, 8000, dtype=jnp.int32))
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
    ns = t / (STAGES * grid * arrays_per_prog) * 1e9
    log(f"{label:22s} {ns:7.2f} ns/stage/tile "
        f"(t1={[f'{x*1e3:.1f}' for x in tl]} tk={[f'{x*1e3:.1f}' for x in th]})")
    return ns


def main():
    log(f"backend={jax.default_backend()}  stages={STAGES} grid={GRID}")
    real = time_kernel(
        functools.partial(_real_kernel, stages=STAGES), 192,
        "A real rotating")
    dual = time_kernel(
        functools.partial(_dual_kernel, stages=STAGES), 384,
        "B dual-array ILP", arrays_per_prog=2, grid=GRID // 2)
    lanes = time_kernel(
        functools.partial(_lanes_kernel, stages=STAGES), 192,
        "C states-on-lanes")
    log(f"verdict: real {real:.2f} | dual {dual:.2f} | lanes {lanes:.2f} "
        f"ns/stage/tile")
    best = min(dual, lanes)
    log("WINNER: " + ("dual" if dual <= lanes else "lanes")
        if best < real * 0.97 else "NEGATIVE: rotating layout stands")
    return 0


if __name__ == "__main__":
    sys.exit(main())
