"""Fused Pallas TPU kernel: BM + ACS + register-exchange + traceback.

This is the TPU equivalent of the reference's single persistent CUDA kernel
(reference: src/viterbi/viterbi.cu:144-207) — one kernel program decodes a
tile of 128 time-blocks end to end:

  grid axis      = block tiles (128 blocks on the VPU lane axis per program)
  VMEM residency = the tile's soft inputs, the survivor-pack store
                   (the analog of the reference's per-warp global-memory
                   circular buffer, viterbi.cu:99-100 — here it is on-chip),
                   and the output packs
  forward pass   = lax.fori_loop over survivor packs, 32 ACS stages unrolled
                   per iteration (cf. bmCalc batch + 32x forwardACS,
                   viterbi.cu:185-197)
  traceback      = in-kernel pack-granular state chase, one-hot gather over
                   the 64-state sublane axis (cf. viterbiTB.cuh:4-21)

ACS formulation (chosen from measured Mosaic lowering costs — see
scripts/acs_variants_bench.py and scripts/op_cost_probe.py):

  *Even/odd half-space ACS.*  Both generator polynomials tap the newest bit
  b_t and the dropped bit b_{t-6} (bits 6 and 0 of 0o171/0o133), so flipping
  either bit negates the branch correlation.  With states indexed
  newest-bit-at-LSB, the even child 2q and odd child 2q+1 share the same
  predecessor pair {q, q+32} and use negated metrics:

      E'[q] = max(L[q] + bm[q], H[q] - bm[q])      (child 2q)
      O'[q] = max(L[q] - bm[q], H[q] + bm[q])      (child 2q+1)

  where L, H are contiguous row slices of the state vector.

  *Rotating layout.*  Re-interleaving (E', O') into natural state order
  every stage is a sublane relayout — the single most expensive construct
  in the stage body (scripts/op_cost_probe.py: ~34 ns as stack+reshape,
  ~9 ns as 1-row slice concats, vs ~1 ns for an ALU op).  Instead the
  children are written as plain contiguous halves [E'; O'] (free) and the
  layout is *tracked* (_group_schedule): the predecessor-pair split walks
  down position bits, so reads stay coarse contiguous slices
  (32/16/8/4-row), and only every GROUP_LEN-th stage pays a 1-row
  permutation write that lands the vector back in natural order.  This is
  the TPU replacement for the reference's __shfl_xor_sync butterfly network
  and 6-cycle shuffle-exchange layout (viterbiACS.cuh:418-480); measured
  89 -> 25 ns/stage per 128-block tile end to end (with word-mode input).

Supported configs: all channels, both pack widths, and every metric
dtype — b16/fp16 metric modes decode bit-identically to int32 by the
reference's own renorm-stride design (see pallas_supported), so they all
run on this int32 kernel.  The XLA scan core (core_xla.py) remains the
dtype-faithful semantic reference and the CPU path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import ChannelIn, DecoderConfig, NUM_STATES
from .core_xla import (WARMUP, BlockPlan, assemble_output,
                       needs_int32_renorm, overlapped_windows)

# Blocks per kernel program = the VPU lane width.  Unlike the VMEM budget
# this is NOT a per-device-kind knob: every TPU generation's vector lane
# axis is 128 wide, and both smaller (wasted lanes) and larger
# (lane_tile 256: 63.2 vs 27 ns/stage, BASELINE.md r3) values measured
# strictly worse, so 128 is an architectural constant here.
LANE_TILE = 128

# Per-core scoped-VMEM budget the kernel's static buffers must fit in —
# resolved per device kind (with an env override) by hardware.py, NOT a
# chip-baked literal: on this backend ("TPU v5 lite") the measured limit
# is 16.00M (see hardware._VMEM_BUDGET_BY_KIND for the measurement).
# Plans that exceed it are rejected up front with a clear error (see
# pallas_supported / decode_packed_pallas) or fall back to the XLA core /
# windowed survivor instead of surfacing as a raw Mosaic compile failure.
from ..hardware import vmem_budget_bytes  # noqa: E402

# Minimum merged-history depth (in ACS stages) of the windowed-survivor
# per-slide chase: the r4 BER A/B (32M bits, SNR 1.125 dB) validated the
# windowed path at 64 discarded stages per emitted pack — a 32-stage chase
# measured ~3x the full-store error count (BASELINE.md r4 note).  The
# chase depth in packs is max(n_conv + 1, ceil(64 / bpp)) so bpp=16 plans
# meet the same stage floor (n_conv+1 packs alone would give only 48).
WINDOW_MIN_CHASE_STAGES = 64

# Low-6-bit tap masks of the reversed polynomials (see trellis.py):
# out_k(window) = parity(window & mask_k); window = state for the j=0 branch.
_TAP_MASK0 = 0o117 & 63
_TAP_MASK1 = 0o155 & 63


def vmem_footprint_bytes(cfg: DecoderConfig, plan: BlockPlan,
                         lane_tile: int = LANE_TILE,
                         fused: bool = True,
                         value_mode: bool = False,
                         window: bool = False,
                         f32_values: bool = False) -> int:
    """Static VMEM bytes one kernel program needs under this plan: the
    survivor scratch, the (double-buffered) input/output grid blocks, and
    in fused word mode the word-major scratch.  Used to reject plans that
    would blow the per-core VMEM budget (e.g. dec_len 32768+: the survivor
    store alone is n_packs * 64 * lane_tile * 4 ≈ 34 MB) with a clean
    error/fallback instead of a Mosaic compile crash."""
    bpp = plan.bits_per_pack
    n_packs = plan.n_packs
    n_emit = plan.dec_len // bpp
    surv_slots = survivor_window_slots(cfg) if window else n_packs
    surv = surv_slots * NUM_STATES * lane_tile * 4
    out = 2 * n_emit * lane_tile * 4          # double-buffered grid output
    if value_mode:
        # legacy FP32 two-stream value staging (fp32_words=False)
        rs = 2 * n_packs * bpp * 2 * lane_tile * 4
        return surv + out + rs
    if f32_values:
        # fused f32 VALUE mode: raw interleaved floats enter the kernel
        # (double-buffered (lane_tile, 2*dec_len) f32 blocks) and the
        # in-VMEM transpose scratch holds (n_packs, 2*bpp) f32 rows
        vals = n_packs * 2 * bpp * lane_tile * 4
        return surv + out + vals + 2 * 2 * plan.dec_len * lane_tile * 4
    # FP32 default rides u/d word mode: 4 8-bit fields per word, like SOFT8
    dpp = 4 if cfg.channel_in == ChannelIn.FP32 else cfg.enc_data_per_pack
    words_per_block = (2 * plan.dec_len + 2 * WARMUP) // dpp
    words = n_packs * (words_per_block // n_packs) * lane_tile * 4
    if fused:                                 # word scratch + packed inputs
        return surv + out + words + 2 * words_per_block * lane_tile * 4
    return surv + out + 2 * words             # staged word-major input


def pallas_supported(cfg: DecoderConfig, plan: BlockPlan,
                     lane_tile: int = LANE_TILE,
                     window: bool = False) -> bool:
    """True when the fused kernel both runs on this backend and fits the
    plan in VMEM (vmem_footprint_bytes vs hardware.vmem_budget_bytes) —
    callers on backend='auto' fall back to the XLA scan core otherwise.

    All metric dtypes route through the int32 kernel: the reference
    sizes renorm strides so int16 PMs never wrap and restricts fp16 to
    channels whose PMs stay integer-exact (viterbi.h:22-41, viterbi.cu:173)
    — the metric dtype is a performance knob with identical decodes, and
    the b16/fp16 XLA cores were verified bit-identical to this kernel on
    full-range inputs (scripts/check_metric_equiv.py, guarded in CI by
    tests/test_metric_equiv.py).  Mosaic on this backend cannot lower
    int16/fp16 vectors anyway (PARITY.md P3); int32 is the fast
    representation for every mode."""
    if jax.default_backend() not in ("tpu", "axon"):
        return False
    return vmem_footprint_bytes(cfg, plan, lane_tile, window=window) \
        <= vmem_budget_bytes()


def resolve_window(survivor: str, cfg: DecoderConfig, plan: BlockPlan,
                   lane_tile: int = LANE_TILE) -> bool:
    """Map a survivor-mode knob to the kernel's window flag.

    'full'   — whole per-tile survivor store in VMEM
    'window' — the one-pointer circular buffer (survivor_window_slots)
    'auto'   — full when it fits the VMEM budget (bit-identical to the
               r2 kernel), window when only the window fits — so plans
               like SOFT16 dec_len 8192 or lane_tile 256 work out of the
               box instead of falling back to the XLA core."""
    if survivor == "full":
        return False
    if survivor == "window":
        return True
    if survivor != "auto":
        raise ValueError(f"survivor must be 'auto', 'full' or 'window', "
                         f"got {survivor!r}")
    budget = vmem_budget_bytes()
    return (vmem_footprint_bytes(cfg, plan, lane_tile) > budget
            and vmem_footprint_bytes(cfg, plan, lane_tile, window=True)
            <= budget)


def _check_vmem(cfg: DecoderConfig, plan: BlockPlan, lane_tile: int,
                interpret: bool, fused: bool = True,
                value_mode: bool = False, window: bool = False) -> None:
    if interpret:
        return
    need = vmem_footprint_bytes(cfg, plan, lane_tile, fused, value_mode,
                                window)
    budget = vmem_budget_bytes()
    if need > budget:
        raise ValueError(
            f"plan does not fit VMEM: dec_len={plan.dec_len} x "
            f"lane_tile={lane_tile} needs ~{need >> 20} MiB of kernel "
            f"buffers (budget {budget >> 20} MiB); lower "
            f"dec_len/lane_tile or use the XLA backend")


def _parity(v):
    v = v ^ (v >> 4)
    v = v ^ (v >> 2)
    v = v ^ (v >> 1)
    return v & 1


# ---------------------------------------------------------------------------
# Rotating-layout ACS schedule (GROUP_LEN consecutive stages per layout cycle)
#
# The per-stage interleave back to natural state order is the kernel's most
# expensive construct (sublane relayout, scripts/op_cost_probe.py).  Instead
# of recombining every stage, children are written as plain contiguous
# halves [E; O] (free) and the *layout* is tracked: the predecessor-pair
# split then walks down position bits (32/16/8/4-row slices — concats of
# coarse contiguous slices are ~free), and only the last stage of each
# group pays a 1-row permutation write that lands the state vector back in
# natural order.  This is the TPU analog of the reference's 6-cycle
# shuffle-exchange layout (viterbiACS.cuh:461-480, stageToState :382-389),
# with GROUP_LEN=4 chosen so bpp (16/32) is a multiple of the cycle and the
# survivor dumps stay natural-order.
# ---------------------------------------------------------------------------

GROUP_LEN = 4


def _runs(rows):
    """Ascending row indices -> [(start, len), ...] contiguous runs."""
    runs = []
    for r in rows:
        if runs and runs[-1][0] + runs[-1][1] == r:
            runs[-1] = (runs[-1][0], runs[-1][1] + 1)
        else:
            runs.append((int(r), 1))
    return runs


@functools.lru_cache()
def _group_schedule():
    """Static per-stage specs for one GROUP_LEN-stage layout cycle.

    Returns a list of (runs_lo, runs_hi, bitperm, write) where
      runs_lo/hi : contiguous (start, len) row slices of the current state
                   vector holding predecessors q / q+32, in matching q order
      bitperm    : [(a, b), ...] such that the predecessor index of sliced
                   row i is q = OR_j ((i >> a_j) & 1) << b_j — used to build
                   the stage's +-1 sign constants from an in-kernel iota
                   (Pallas kernels cannot capture array constants)
      write      : None (write [E; O] halves, layout keeps rotating) or a
                   [(src, start, len), ...] run list (src 0=even child rows,
                   1=odd) that permutes the children straight back to
                   natural state order
    """
    state = np.arange(NUM_STATES)
    stages = []
    for t in range(GROUP_LEN):
        mask_lo = state < 32
        rows_lo = np.nonzero(mask_lo)[0]
        rows_hi = np.nonzero(~mask_lo)[0]
        q_lo = state[rows_lo]
        q_hi = state[rows_hi] - 32
        assert np.array_equal(q_lo, q_hi), "pair order mismatch"
        bitperm = []
        for a in range(5):
            b = int(q_lo[1 << a]).bit_length() - 1
            bitperm.append((a, b))
        for i in range(32):                     # verify it IS a bit-perm
            q = 0
            for a, b in bitperm:
                q |= ((i >> a) & 1) << b
            assert q == q_lo[i], "q_lo not a bit permutation"
        if t < GROUP_LEN - 1:
            write = None
            state = np.concatenate([2 * q_lo, 2 * q_lo + 1])
        else:
            pos_of_q = {int(q): i for i, q in enumerate(q_lo)}
            order = [(s & 1, pos_of_q[s >> 1]) for s in range(NUM_STATES)]
            write = []
            for src, row in order:
                if write and write[-1][0] == src and \
                        write[-1][1] + write[-1][2] == row:
                    write[-1] = (src, write[-1][1], write[-1][2] + 1)
                else:
                    write.append((src, row, 1))
            state = np.arange(NUM_STATES)
        stages.append((_runs(rows_lo), _runs(rows_hi), tuple(bitperm),
                       write))
    assert np.array_equal(state, np.arange(NUM_STATES))
    return stages


def _slice_cat(x, runs):
    parts = [x[a:a + n] for a, n in runs]
    return parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=0)


def _write_cat(e, o, write):
    srcs = (e, o)
    return jnp.concatenate([srcs[s][a:a + n] for s, a, n in write], axis=0)


def survivor_window_slots(cfg: DecoderConfig) -> int:
    """Circular survivor slots for the windowed kernel: the per-slide
    traceback reads slots p .. p-n_disc while the oldest slot is being
    freed for the next dump, so W = n_disc + 2 (the TPU sizing of the
    reference's forwardLen/bpp-deep one-pointer buffer,
    viterbi.cu:99-100), with n_disc = the window chase depth in packs.

    The chase depth is max(n_conv + 1, ceil(64 / bpp)) discard packs
    (WINDOW_MIN_CHASE_STAGES).  The extra packs over r3's n_conv are a
    BER fix (r4): a fresh per-slide chase discarding only n_conv packs
    truncates EVERY emitted pack at n_conv*bpp = 32 stages — below the
    extra_r = 38 design depth — and measured ~3x the error count of the
    full-survivor store at 32M/SNR 1.125 (BEN 347 vs 95, scripts note in
    BASELINE.md).  The floor is expressed in STAGES so bpp=16 plans get
    the same >= 64 merged stages the A/B validated at bpp=32 (n_conv+1
    packs alone would give only 48 there).  The top emitted packs, which
    have less history by framing, are chased at their full available
    depth >= n_conv — the full store's profile."""
    bpp = cfg.bits_per_pack
    n_conv = -(-(cfg.extra_r - bpp) // bpp)
    return max(n_conv + 1, -(-WINDOW_MIN_CHASE_STAGES // bpp)) + 2


def _decode_core(make_ud, out_ref, surv_ref, *, n_packs, bpp, n_conv,
                 n_emit, is_float, renorm=False, window=False):
    """Shared fused decode body: rotating-layout ACS + survivor dump +
    in-kernel traceback.  make_ud(p) -> ud(s) -> ((1, LT) u, (1, LT) d)
    per-stage sum/difference soft pairs for pack p — the input-format
    adapters (_viterbi_kernel value/word modes, _viterbi_kernel_f32_2s)
    differ only in how they produce u/d.

    window=False: surv_ref holds every pack (n_packs slots); one
    continuous state chase from the final pack emits all output packs
    after the loop.

    window=True: the reference's one-pointer circular survivor buffer
    (viterbi.cu:99-100,154; write index stage % forwardLen,
    viterbiACS.cuh:460; consumed by viterbiTB.cuh:4-21) — surv_ref has
    only n_disc + 2 slots (survivor_window_slots), written at p % W, and
    every pack interleaves a FRESH traceback into the ACS loop: state 0,
    chase n_disc discard packs (>= WINDOW_MIN_CHASE_STAGES = 64 merged
    stages at every bpp — r3's n_conv-deep chase truncated at 32 stages,
    below the extra_r = 38 design, and measured ~3x full-store BEN at
    32M), emit one pack.  The top emitted packs, which have less history
    by framing, are emitted after the loop at their full available depth
    >= n_conv — the topmost exactly at the full store's truncation
    profile.  Survivor VMEM drops from O(dec_len) to O(extra_r) per
    block — the >1000x traceback memory claim of README.md:18 —
    decoupling dec_len/lane_tile from the VMEM budget.  Bit-equality with
    the full store on coded inputs and statistical equality on noise are
    locked by tests/test_survivor_window.py."""
    lt = out_ref.shape[1]
    assert bpp % GROUP_LEN == 0
    pack_mask = jnp.int32(-1 if bpp == 32 else 0xFFFF)
    dtype = jnp.float32 if is_float else jnp.int32

    # per-stage-in-group +-1 sign constants, rebuilt from iota under each
    # stage's predecessor bit-permutation (hoisted out of the pack loop)
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

    emit_lo = n_packs - n_conv - n_emit         # lowest pack index emitted
    # window-mode chase depth in packs (>= WINDOW_MIN_CHASE_STAGES merged
    # stages, the r4 BER-validated floor) — derived from the scratch
    # allocation itself (survivor_window_slots = n_disc + 2), the ONE
    # place the depth formula lives, so the circular-buffer sizing and
    # this indexing can never drift (ADVICE r4)
    W = surv_ref.shape[0] if window else n_packs
    n_disc = W - 2

    def _chase(slot_pack, state):
        """Register-exchange step: gather the survivor pack of `state`
        (1, LT) from a (64, LT) slot; next state = its last 6 decision
        bits (cf. __brev state extraction, viterbiTB.cuh:10-18, already
        bit-reversed here by the dump convention).

        The per-lane dynamic row select is a 6-level binary bisection on
        the state bits (63 halving row-ops: 32+16+...+1) instead of the
        one-hot compare+select+sum-tree (~190 row-ops) — measured
        traceback share 1.26 ns/stage in scripts/kernel_ablation.py, the
        largest non-ACS piece of the kernel."""
        x = slot_pack                           # (2^b.., LT)
        for b in (5, 4, 3, 2, 1, 0):
            h = 1 << b
            bit = jax.lax.shift_right_logical(state, b) & 1
            x = jnp.where(bit == 1, x[h:2 * h], x[0:h])
        return x, jax.lax.shift_right_logical(x, bpp - 6) & 63

    def pack_body(p, carry):
        pm, pp = carry
        ud = make_ud(p)

        def run_stage(s, pm, pp):
            runs_lo, runs_hi, s0, s1, same_sign, write = \
                consts[s % GROUP_LEN]
            u, d = ud(s)                        # (1, LT) each
            if is_float:
                # (u+d)/2 * s0 + (u-d)/2 * s1 == r0*s0 + r1*s1; with +-1
                # signs this is u or d times the sign, like the int path
                bm = jnp.trunc(jnp.where(same_sign, u, d) * s0) \
                    .astype(jnp.int32)
            else:
                bm = jnp.where(same_sign, u, d) * s0
            lo = _slice_cat(pm, runs_lo)
            hi = _slice_cat(pm, runs_hi)
            c0e = lo + bm
            c1e = hi - bm
            dec_e = c1e > c0e                   # tie -> j=0 (matches golden)
            e_new = jnp.where(dec_e, c1e, c0e)
            c0o = lo - bm
            c1o = hi + bm
            dec_o = c1o > c0o
            o_new = jnp.where(dec_o, c1o, c0o)

            # register exchange: both children choose between the same two
            # premultiplied candidates 2*pl (decision bit 0) and 2*ph|1
            # (decision bit 1) — 3 shared ops + 2 selects instead of
            # per-child select+shift+or
            pl_ = _slice_cat(pp, runs_lo)
            ph_ = _slice_cat(pp, runs_hi)
            from_lo = pl_ + pl_
            from_hi = ph_ + ph_ + 1
            pe = jnp.where(dec_e, from_hi, from_lo)
            po = jnp.where(dec_o, from_hi, from_lo)

            if write is None:                   # layout keeps rotating
                pm = jnp.concatenate([e_new, o_new], axis=0)
                pp = jnp.concatenate([pe, po], axis=0)
            else:                               # permute back to natural
                pm = _write_cat(e_new, o_new, write)
                pp = _write_cat(pe, po, write)
            return pm, pp

        for s in range(bpp):                    # static unroll
            pm, pp = run_stage(s, pm, pp)

        if window:
            surv_ref[jax.lax.rem(p, W)] = pp & pack_mask
            # per-slide fresh traceback (reference viterbiTB.cuh:4-21)
            # p <= n_packs-1 bounds the in-loop emitted pack at
            # n_packs-1-n_disc; the n_disc-n_conv packs above it are
            # emitted after the loop at their full available depth
            @pl.when(p - n_disc >= emit_lo)
            def _():
                state = jnp.zeros((1, lt), jnp.int32)
                for t in range(n_disc):         # discard packs
                    _, state = _chase(surv_ref[jax.lax.rem(p - t, W)],
                                      state)
                pack, _ = _chase(surv_ref[jax.lax.rem(p - n_disc, W)],
                                 state)
                out_ref[pl.ds(p - n_disc - emit_lo, 1), :] = pack
        else:
            surv_ref[p] = pp & pack_mask        # survivor-pack dump
        if renorm:
            # per-pack min-subtract renormalization (decision-invariant;
            # cf. viterbiACS.cuh:307-378): bounds PMs by the trellis mixing
            # spread (~12 max|bm|) + one pack's growth, so int32 plans past
            # the renorm-free block_len bound stay exact.  ~7 coarse-slice
            # ops per 32 stages — off on the default plans.
            m = jnp.minimum(pm[:32], pm[32:])
            for h in (16, 8, 4, 2, 1):
                m = jnp.minimum(m[:h], m[h:2 * h])
            pm = pm - jnp.broadcast_to(m, pm.shape)
        return pm, pp

    zeros = jnp.zeros((NUM_STATES, lt), jnp.int32)
    jax.lax.fori_loop(0, n_packs, pack_body, (zeros, zeros))
    if window:
        # top emitted packs (q > n_packs-1-n_disc): fewer than n_disc
        # packs of history exist above them by framing, so each is chased
        # at its full available depth n_packs-1-q (>= n_conv, the design
        # depth) — the topmost pack keeps exactly the full store's
        # truncation profile.  All read packs are within the last W-1
        # written slots.
        for q in range(max(emit_lo, n_packs - n_disc),
                       n_packs - n_conv):
            depth = n_packs - 1 - q
            state = jnp.zeros((1, lt), jnp.int32)
            for t in range(depth):
                _, state = _chase(surv_ref[(n_packs - 1 - t) % W], state)
            pack, _ = _chase(surv_ref[q % W], state)
            out_ref[pl.ds(q - emit_lo, 1), :] = pack
        return

    # ---- traceback (pack-granular register-exchange state chase) ----
    def tb_body(k, state):                      # state: (1, LT)
        kp = n_packs - 1 - k
        pack, new_state = _chase(surv_ref[kp], state)

        @pl.when(k >= n_conv)
        def _():
            out_ref[pl.ds(kp - emit_lo, 1), :] = pack

        return new_state

    jax.lax.fori_loop(0, n_conv + n_emit, tb_body,
                      jnp.zeros((1, lt), jnp.int32))


def _viterbi_kernel(rs_ref, out_ref, surv_ref, *, n_packs, bpp, n_conv,
                    n_emit, is_float, vpw=None, width=None, renorm=False,
                    ud_mode=False, window=False, s16="pack"):
    """One tile -> out_ref (n_emit, LT).  rs_ref is (n_packs, bpp, 2, LT)
    staged soft values (value mode, vpw=None) or (n_packs, wpp, LT) packed
    channel words unpacked in-kernel (word mode, vpw = values per word).

    bm = s0*r0 + s1*r1 with s0,s1 in {+-1}: only the two values
    +-(r0+r1), +-(r0-r1) exist per stage (cf. the reference's 4-entry
    branchMetric ring, viterbiBM.cuh:178-185) — each adapter computes the
    whole pack's u/d up front; per-stage (2, LT) VMEM loads measured
    ~12 ns/stage extra.

    ud_mode: the word fields are already the u/d pair (pre-trunc'd
    integers, core_xla.fp32_ud_words) rather than the (r0, r1) values —
    skip the add/sub.  This is how FP32 rides word mode.

    s16: SOFT16 (vpw=2) per-stage unpack structure — the one word format
    whose natural unpack is a single (bpp, LT) array row-sliced at EVERY
    stage, which Mosaic schedules ~5 ns/stage worse than SOFT8's two
    16-row arrays (r3 isolation, scripts/soft16_probe.py; VERDICT r3
    item 1).  Candidates measured by scripts/soft16_fix.py:
      "pack"   — whole-pack u/d arrays (r3 shipped)
      "halves" — same arrays pre-split into contiguous 16-row halves
      "lazy"   — no pack-level arrays; each stage slices its word row and
                 unpacks in 4 one-row ops (minimum live state)
      "group"  — unpack GROUP_LEN stages at a time from a 4-row slice
                 (SOFT8-like small arrays, 1 coarse slice per group)
    All are bit-identical by construction (same adds on the same fields;
    CI: tests/test_kernel_interpret.py::test_soft16_unpack_layouts)."""
    if vpw is None:
        def make_ud(p):                         # value mode: (bpp, 2, LT)
            rp = rs_ref[p]
            u_all = rp[:, 0] + rp[:, 1]         # (bpp, LT)
            d_all = rp[:, 0] - rp[:, 1]
            return lambda s: (u_all[s:s + 1], d_all[s:s + 1])
    elif width == 16 and not ud_mode and s16 != "pack":
        if s16 == "halves":
            def make_ud(p):
                wv = rs_ref[p]                  # (bpp, LT): word s = stage s
                a0 = wv >> 16
                a1 = (wv << 16) >> 16
                u_all = a0 + a1
                d_all = a0 - a1
                h = bpp // 2
                us = (u_all[:h], u_all[h:])
                ds = (d_all[:h], d_all[h:])

                def ud(s):
                    return (us[s // h][s % h: s % h + 1],
                            ds[s // h][s % h: s % h + 1])
                return ud
        elif s16 == "lazy":
            def make_ud(p):
                wv = rs_ref[p]

                def ud(s):
                    row = wv[s: s + 1]
                    a0 = row >> 16
                    a1 = (row << 16) >> 16
                    return a0 + a1, a0 - a1
                return ud
        elif s16 == "group":
            def make_ud(p):
                wv = rs_ref[p]
                cache = {}

                def ud(s):
                    g = s // GROUP_LEN
                    if g not in cache:
                        rows = wv[GROUP_LEN * g: GROUP_LEN * (g + 1)]
                        a0 = rows >> 16
                        a1 = (rows << 16) >> 16
                        cache[g] = (a0 + a1, a0 - a1)
                    u_g, d_g = cache[g]
                    k = s % GROUP_LEN
                    return u_g[k: k + 1], d_g[k: k + 1]
                return ud
        else:
            raise ValueError(f"unknown s16 layout {s16!r}")
    else:
        # word mode: (wpp, LT) packed channel words (MSB = earliest,
        # viterbiDF.h:157-163); the unpack is ~10 cheap (wpp, LT) ops
        # per pack, vs staging sign-extended values in HBM (4x the
        # input traffic at SOFT8)
        ppw = vpw // 2                          # stage-pairs per word

        def make_ud(p):
            wv = rs_ref[p]                      # (wpp, LT) int32
            u_js, d_js = [], []
            for j in range(ppw):
                if width == 1:                  # HARD: bit -> +-1
                    a0 = ((wv >> (31 - 2 * j)) & 1) * 2 - 1
                    a1 = ((wv >> (30 - 2 * j)) & 1) * 2 - 1
                else:                           # two's-complement field
                    a0 = (wv << (2 * j * width)) >> (32 - width)
                    a1 = (wv << ((2 * j + 1) * width)) >> (32 - width)
                if ud_mode:                     # fields ARE (u, d)
                    u_js.append(a0)
                    d_js.append(a1)
                else:
                    u_js.append(a0 + a1)        # (wpp, LT)
                    d_js.append(a0 - a1)

            def ud(s):
                j, k = s % ppw, s // ppw
                return u_js[j][k:k + 1], d_js[j][k:k + 1]
            return ud

    _decode_core(make_ud, out_ref, surv_ref, n_packs=n_packs, bpp=bpp,
                 n_conv=n_conv, n_emit=n_emit, is_float=is_float,
                 renorm=renorm, window=window)


def _viterbi_kernel_f32_2s(rs0_ref, rs1_ref, out_ref, surv_ref, *, n_packs,
                           bpp, n_conv, n_emit, renorm=False, window=False):
    """FP32 two-stream value mode: the channel's two parity-value streams
    arrive as separate (n_packs, bpp, LT) float tensors (flat staging,
    core_xla.stage_floats_2streams) instead of one (n_packs, bpp, 2, LT)
    tensor whose 2-wide second-minor axis pads 2 -> 8 sublanes under TPU
    tiling — a 4x VMEM/HBM blowup that made FP32 infeasible at the
    production dec_len (VERDICT r1 item 4; reference handles FP32 at any n
    trivially, viterbiBM.cuh:128-153)."""
    def make_ud(p):
        r0 = rs0_ref[p]                         # (bpp, LT) f32
        r1 = rs1_ref[p]
        u_all = r0 + r1
        d_all = r0 - r1
        return lambda s: (u_all[s:s + 1], d_all[s:s + 1])

    _decode_core(make_ud, out_ref, surv_ref, n_packs=n_packs, bpp=bpp,
                 n_conv=n_conv, n_emit=n_emit, is_float=True, renorm=renorm,
                 window=window)


def _viterbi_kernel_fused(body_ref, halo_ref, out_ref, surv_ref, words_ref,
                          *, n_packs, bpp, n_conv, n_emit, vpw, width,
                          renorm=False, ud_mode=False, window=False,
                          s16="pack", roll_halo=False):
    """Word-mode kernel with the staging transpose fused in: body_ref
    (LT, wpb) arrives block-major straight from the packed channel stream
    (a free reshape view in HBM), is transposed once in VMEM into the
    word-major words_ref scratch, and the decode proceeds exactly as
    _viterbi_kernel word mode.  This drops the separate staging pass's HBM
    round trip (write + re-read of the full word-major layout, cf.
    stage_words_pallas).

    Halo (the first wph words of each block's right neighbor):

    roll_halo=False — halo_ref is an explicit (LT, wph) block-major input
    (_block_major_words; costs a full-stream XLA copy at scale because the
    shifted view is an offset slice).

    roll_halo=True — halo_ref is the tiny (1, 128) tile-edge row
    (_body_and_edge) and the halo is derived from the body transpose by a
    one-lane roll: block l's neighbor is lane l+1 of the SAME tile, except
    the edge lane, whose first wph words arrive via halo_ref.  Zero
    staging data movement; + (n_packs-nb) rolls+selects per tile
    (~0.01 ns/stage).  Measured −0.5 ms at 32M SOFT8
    (scripts/staging_cost.py 'roll' vs 'graph')."""
    lt = out_ref.shape[1]
    wpp = words_ref.shape[1]                    # words per survivor pack
    nb = body_ref.shape[1] // wpp               # body packs
    nh = n_packs - nb                           # halo packs
    words_ref[:nb] = body_ref[...].T.reshape(nb, wpp, lt)
    if roll_halo:
        edge_col = halo_ref[0].T                # (1, 128) -> (128, 1)
        lane = jax.lax.broadcasted_iota(jnp.int32, (wpp, lt), 1)
        for j in range(nh):
            rolled = pltpu.roll(words_ref[j], lt - 1, 1)
            words_ref[nb + j] = jnp.where(
                lane == lt - 1, edge_col[j * wpp:(j + 1) * wpp], rolled)
    else:
        words_ref[nb:] = halo_ref[...].T.reshape(nh, wpp, lt)
    _viterbi_kernel(words_ref, out_ref, surv_ref, n_packs=n_packs, bpp=bpp,
                    n_conv=n_conv, n_emit=n_emit, is_float=False, vpw=vpw,
                    width=width, renorm=renorm, ud_mode=ud_mode,
                    window=window, s16=s16)


def _viterbi_kernel_fused_f32v(body_ref, edge_ref, out_ref, surv_ref,
                               vals_ref, *, n_packs, bpp, n_conv, n_emit,
                               window=False):
    """Fused FP32 VALUE kernel: the raw interleaved f32 wire enters
    block-major through the zero-copy staging (bitcast body + roll halo,
    exactly like _viterbi_kernel_fused) and clip + u/d run in-kernel on
    adjacent sublane rows of the VMEM transpose — no deinterleave exists.

    This replaces the u/d-word staging chain (clip -> one-hot deinterleave
    -> trunc -> pack: several full-size HBM intermediates that dots force
    XLA to materialize) for plans whose f32 value blocks fit VMEM;
    measured 37.6 -> 35.1-35.7 ns/stage at 32M (same session,
    scripts/fp32_fused_value_probe.py).  Branch metrics are bit-identical
    to the u/d-word path: _decode_core's float path computes
    trunc((r0 +- r1) * sign) and trunc is odd (fp32_ud_words exactness
    argument, core_xla.py)."""
    from ..config import FP_PRECISION
    lo = jnp.float32(-(1 << (FP_PRECISION - 1)))
    hi = jnp.float32((1 << (FP_PRECISION - 1)) - 1)
    lt = out_ref.shape[1]
    vpp = vals_ref.shape[1]                  # 2*bpp values per pack
    nb = body_ref.shape[1] // vpp
    nh = n_packs - nb
    vals_ref[:nb] = body_ref[...].T.reshape(nb, vpp, lt)
    edge_col = edge_ref[0].T                 # (128, 1)
    lane = jax.lax.broadcasted_iota(jnp.int32, (vpp, lt), 1)
    for j in range(nh):
        rolled = pltpu.roll(vals_ref[j], lt - 1, 1)
        vals_ref[nb + j] = jnp.where(
            lane == lt - 1, edge_col[j * vpp:(j + 1) * vpp], rolled)

    def make_ud(p):
        rp = jnp.clip(vals_ref[p], lo, hi)   # (2*bpp, LT) f32

        def ud(s):
            r0 = rp[2 * s: 2 * s + 1]
            r1 = rp[2 * s + 1: 2 * s + 2]
            return r0 + r1, r0 - r1
        return ud

    _decode_core(make_ud, out_ref, surv_ref, n_packs=n_packs, bpp=bpp,
                 n_conv=n_conv, n_emit=n_emit, is_float=True,
                 renorm=False, window=window)


def _run_kernel_fused_f32v(vals: jnp.ndarray, cfg: DecoderConfig,
                           plan: BlockPlan, lane_tile: int,
                           interpret: bool = False,
                           window: bool = False) -> jnp.ndarray:
    """Raw interleaved f32 channel values -> packed output words via the
    fused value kernel, zero-copy staged (dpp=1 'words' = the values)."""
    bpp = plan.bits_per_pack
    n_packs = plan.n_packs
    n_conv = -(-(cfg.extra_r - bpp) // bpp)
    n_emit = plan.dec_len // bpp
    b_pad = -(-plan.num_blocks // lane_tile) * lane_tile
    body, edge = _body_and_edge(vals, cfg, plan, b_pad, lane_tile, dpp=1)
    kernel = functools.partial(_viterbi_kernel_fused_f32v, n_packs=n_packs,
                               bpp=bpp, n_conv=n_conv, n_emit=n_emit,
                               window=window)
    surv_slots = survivor_window_slots(cfg) if window else n_packs
    out = pl.pallas_call(
        kernel,
        grid=(b_pad // lane_tile,),
        in_specs=[pl.BlockSpec((lane_tile, body.shape[1]),
                               lambda i: (i, 0), memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, 1, 128), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((n_emit, lane_tile), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_emit, b_pad), jnp.int32),
        scratch_shapes=[pltpu.VMEM((surv_slots, NUM_STATES, lane_tile),
                                   jnp.int32),
                        pltpu.VMEM((n_packs, 2 * bpp, lane_tile),
                                   jnp.float32)],
        interpret=interpret,
    )(body, edge)

    out_packs = out.transpose(1, 0)[:plan.num_blocks].view(jnp.uint32)
    return assemble_output(out_packs, cfg, plan)


def _block_major_words(packed: jnp.ndarray, cfg: DecoderConfig,
                       plan: BlockPlan, b_pad: int, dpp: int = 0):
    """Packed channel words -> (body (b_pad, wpb), halo (b_pad, wph))
    block-major word layouts for the fused kernel.  The body is a pure
    reshape of the stream; the halo (block k's first wph words of block
    k+1's span) uses the general overlapped-window construction so
    dec_len < 64 (halo spanning several bodies) stays correct.  Natural
    last-block framing (BlockPlan docstring): no patches.  dpp overrides
    the channel's values-per-word (FP32 u/d word mode repacks to 4
    fields/word).

    NOTE: the halo materialization here costs a full-stream copy at scale
    (the shifted view is an offset slice XLA cannot alias —
    scripts/staging_cost.py); decode_packed_pallas prefers the zero-copy
    _body_and_edge staging whenever the plan allows."""
    dpp = dpp or cfg.enc_data_per_pack
    wpb = 2 * plan.dec_len // dpp
    wph = 2 * WARMUP // dpp
    need = b_pad * wpb + wpb + wph
    if packed.shape[0] < need:
        packed = jnp.concatenate(
            [packed, jnp.zeros((need - packed.shape[0],), packed.dtype)])
    body = packed[: b_pad * wpb].reshape(b_pad, wpb)
    halo = overlapped_windows(packed[wpb:], wpb, wph, b_pad)
    # padding rows (blocks >= B) carry leftover stream words rather than
    # zeros; those lanes are decoded and discarded (see stage_words_pallas)
    return body, halo


def padded_input_words(cfg: DecoderConfig, plan: BlockPlan,
                       lane_tile: int = LANE_TILE) -> int:
    """Input length at which decode_packed_pallas' staging is ZERO-COPY:
    the body becomes a pure bitcast reshape and every tile-edge slice is
    in-bounds, so no in-graph pad-concat of the full stream happens.
    Callers on the hot path (bench.py, ViterbiTPU) zero-pad to this
    length OUTSIDE the timed region (the reference preps its input buffer
    host-side too, main.cpp:119-141).  Integer channels only (FP32's u/d
    word stream is recomputed in-graph anyway)."""
    dpp = cfg.enc_data_per_pack
    wpb = 2 * plan.dec_len // dpp
    wph = 2 * WARMUP // dpp
    b_pad = -(-plan.num_blocks // lane_tile) * lane_tile
    return b_pad * wpb + wph


def _body_and_edge(packed: jnp.ndarray, cfg: DecoderConfig,
                   plan: BlockPlan, b_pad: int, lane_tile: int,
                   dpp: int = 0, tail_halo=None):
    """Zero-copy staging for the roll-halo fused kernel: the body is a
    bitcast reshape of the (padded) stream — no staging data movement at
    all — and the per-block halo is derived IN-KERNEL from the body
    transpose by a one-lane roll (block k's halo = block k+1's first wph
    words, which sit one lane over in the same tile).  Only the tile-edge
    lane (lane_tile-1, whose successor block lives in the next tile) needs
    real data: edge row i carries the first wph words of tile i+1's first
    block, padded to 128 columns.

    This replaces _block_major_words' halo materialization, whose shifted
    view is an offset slice XLA must copy (a full-stream copy: +0.5 ms =
    ~2 ns/stage at the 32M SOFT8 bench config, scripts/staging_cost.py).
    Requires wph <= wpb (dec_len >= 64) so the halo lies within one
    neighbor block.

    tail_halo: optional (wph,) words logically following the stream —
    placed into the LAST tile's edge row, which is where the final
    block's halo comes from when the stream ends exactly at a tile
    boundary (requires num_blocks == b_pad, i.e. the block count is a
    lane_tile multiple).  This is how the sharded decoder's ppermute'd
    cross-device halo rides the zero-copy staging with no concat of the
    shard stream (sharding/blocks.py aligned path)."""
    dpp = dpp or cfg.enc_data_per_pack
    wpb = 2 * plan.dec_len // dpp
    wph = 2 * WARMUP // dpp
    tiles = b_pad // lane_tile
    need = b_pad * wpb
    if packed.shape[0] < need:
        # avoidable copy of the whole stream: callers on the hot path
        # should hand in a pre-padded buffer (padded_input_words) so this
        # concat disappears and the body is a pure bitcast
        packed = jnp.concatenate(
            [packed, jnp.zeros((need - packed.shape[0],), packed.dtype)])
    body = packed[: need].reshape(b_pad, wpb)
    # tile-edge rows as `tiles` STATIC small slices (32-128 B each): a
    # shifted-view overlapped_windows construction here would pad+reshape
    # the 64 MB stream — a full-stream copy XLA cannot fuse away because
    # reshape needs a materialized operand
    span = lane_tile * wpb
    n_have = packed.shape[0]
    zrow = jnp.zeros((wph,), packed.dtype)
    rows = []
    for i in range(tiles):
        a = (i + 1) * span
        if tail_halo is not None and i == tiles - 1:
            assert b_pad == plan.num_blocks, \
                "tail_halo requires num_blocks to be a lane_tile multiple"
            rows.append(tail_halo.astype(packed.dtype))
        elif a + wph <= n_have:
            rows.append(jax.lax.slice(packed, (a,), (a + wph,)))
        elif a < n_have:        # stream ends inside this window (<=1 row)
            part = jax.lax.slice(packed, (a,), (n_have,))
            rows.append(jnp.concatenate(
                [part, jnp.zeros((a + wph - n_have,), packed.dtype)]))
        else:
            rows.append(zrow)
    edge = jnp.stack(rows) if tiles > 1 else rows[0][None]
    # (tiles, 1, 128): Mosaic block shapes constrain only the last two
    # dims, so a (1, 1, 128) block per grid step is legal (a (1, 128)
    # block over (tiles, 128) is not — 1 is neither 8-divisible nor the
    # full dim)
    edge = jnp.pad(edge, ((0, 0), (0, 128 - wph)))[:, None, :]
    return body, edge


def _run_kernel_fused(body: jnp.ndarray, halo: jnp.ndarray,
                      cfg: DecoderConfig, plan: BlockPlan, lane_tile: int,
                      interpret: bool = False, vpw: int = 0, width: int = 0,
                      ud_mode: bool = False,
                      window: bool = False,
                      s16: str = "pack",
                      roll_halo: bool = False) -> jnp.ndarray:
    """Block-major packed words -> packed output words, staging fused.
    vpw/width override the channel's word format (FP32 u/d word mode).
    roll_halo: halo is the tiny (tiles, 128) tile-edge array from
    _body_and_edge (in-kernel lane-roll halo) instead of the full
    (b_pad, wph) block-major halo."""
    bpp = plan.bits_per_pack
    n_packs = plan.n_packs
    n_conv = -(-(cfg.extra_r - bpp) // bpp)
    n_emit = plan.dec_len // bpp
    b_pad = body.shape[0]
    wpb = body.shape[1]
    wph = (2 * WARMUP // (4 if ud_mode else cfg.enc_data_per_pack))
    wpp = (wpb + wph) // n_packs

    kernel = functools.partial(
        _viterbi_kernel_fused, n_packs=n_packs, bpp=bpp, n_conv=n_conv,
        n_emit=n_emit, vpw=vpw or cfg.enc_data_per_pack,
        width=width or cfg.enc_data_width,
        renorm=needs_int32_renorm(cfg, plan), ud_mode=ud_mode,
        window=window, s16=s16, roll_halo=roll_halo)
    surv_slots = survivor_window_slots(cfg) if window else n_packs
    halo_spec = pl.BlockSpec((1, 1, 128), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM) if roll_halo else \
        pl.BlockSpec((lane_tile, wph), lambda i: (i, 0),
                     memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=(b_pad // lane_tile,),
        in_specs=[pl.BlockSpec((lane_tile, wpb), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
                  halo_spec],
        out_specs=pl.BlockSpec((n_emit, lane_tile), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_emit, b_pad), jnp.int32),
        scratch_shapes=[pltpu.VMEM((surv_slots, NUM_STATES, lane_tile),
                                   jnp.int32),
                        pltpu.VMEM((n_packs, wpp, lane_tile), jnp.int32)],
        interpret=interpret,
    )(body, halo)

    out_packs = out.transpose(1, 0)[:plan.num_blocks].view(jnp.uint32)
    return assemble_output(out_packs, cfg, plan)


def _stage_layout(r: jnp.ndarray, plan: BlockPlan, b_pad: int):
    """Global (S, 2) soft stages -> (n_packs, bpp, 2, b_pad) scan-major tile
    layout WITHOUT an index gather (XLA gathers are catastrophically slow on
    TPU): the non-overlapping body is a pure reshape of the stream and the
    64-stage halo is a shifted reshaped view; the (L, 2, B) transpose is the
    only data movement.

    Natural last-block framing (BlockPlan docstring): the last block's
    beyond-stream tail reads the zero-padded stream, no patch slices."""
    dl, L, B = plan.dec_len, plan.block_len, plan.num_blocks

    from .core_xla import overlapped_windows
    blocks = overlapped_windows(r, dl, L, B)            # (B, L, 2)

    if b_pad > B:
        pad = jnp.zeros((b_pad - B, L, 2), r.dtype)
        blocks = jnp.concatenate([blocks, pad], axis=0)

    return blocks.transpose(1, 2, 0).reshape(plan.n_packs,
                                             plan.bits_per_pack, 2, b_pad)


def _run_kernel(rs: jnp.ndarray, cfg: DecoderConfig, plan: BlockPlan,
                lane_tile: int, interpret: bool = False,
                window: bool = False, s16: str = "pack") -> jnp.ndarray:
    """Staged input -> packed output words.  rs is (n_packs, bpp, 2, b_pad)
    soft values (value mode) or (n_packs, wpp, b_pad) packed channel words
    (word mode, unpacked in-kernel)."""
    bpp = plan.bits_per_pack
    n_packs = plan.n_packs
    n_conv = -(-(cfg.extra_r - bpp) // bpp)
    n_emit = plan.dec_len // bpp
    is_float = cfg.channel_in == ChannelIn.FP32
    b_pad = rs.shape[-1]
    word_mode = rs.ndim == 3

    kw = {}
    if word_mode:
        assert not is_float
        kw = dict(vpw=cfg.enc_data_per_pack, width=cfg.enc_data_width,
                  s16=s16)
        in_spec = pl.BlockSpec((n_packs, rs.shape[1], lane_tile),
                               lambda i: (0, 0, i),
                               memory_space=pltpu.VMEM)
    else:
        in_spec = pl.BlockSpec((n_packs, bpp, 2, lane_tile),
                               lambda i: (0, 0, 0, i),
                               memory_space=pltpu.VMEM)

    kernel = functools.partial(_viterbi_kernel, n_packs=n_packs, bpp=bpp,
                               n_conv=n_conv, n_emit=n_emit,
                               is_float=is_float,
                               renorm=needs_int32_renorm(cfg, plan),
                               window=window, **kw)
    surv_slots = survivor_window_slots(cfg) if window else n_packs
    out = pl.pallas_call(
        kernel,
        grid=(b_pad // lane_tile,),
        in_specs=[in_spec],
        out_specs=pl.BlockSpec((n_emit, lane_tile), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_emit, b_pad), jnp.int32),
        scratch_shapes=[pltpu.VMEM((surv_slots, NUM_STATES, lane_tile),
                                   jnp.int32)],
        interpret=interpret,
    )(rs)

    out_packs = out.transpose(1, 0)[:plan.num_blocks].view(jnp.uint32)
    return assemble_output(out_packs, cfg, plan)


def _run_kernel_f32_2s(rs0: jnp.ndarray, rs1: jnp.ndarray,
                       cfg: DecoderConfig, plan: BlockPlan,
                       lane_tile: int, interpret: bool = False,
                       window: bool = False):
    """Two flat-staged FP32 streams -> packed output words."""
    bpp = plan.bits_per_pack
    n_packs = plan.n_packs
    n_conv = -(-(cfg.extra_r - bpp) // bpp)
    n_emit = plan.dec_len // bpp
    b_pad = rs0.shape[-1]

    kernel = functools.partial(_viterbi_kernel_f32_2s, n_packs=n_packs,
                               bpp=bpp, n_conv=n_conv, n_emit=n_emit,
                               renorm=needs_int32_renorm(cfg, plan),
                               window=window)
    surv_slots = survivor_window_slots(cfg) if window else n_packs
    in_spec = pl.BlockSpec((n_packs, bpp, lane_tile), lambda i: (0, 0, i),
                           memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=(b_pad // lane_tile,),
        in_specs=[in_spec, in_spec],
        out_specs=pl.BlockSpec((n_emit, lane_tile), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_emit, b_pad), jnp.int32),
        scratch_shapes=[pltpu.VMEM((surv_slots, NUM_STATES, lane_tile),
                                   jnp.int32)],
        interpret=interpret,
    )(rs0, rs1)

    out_packs = out.transpose(1, 0)[:plan.num_blocks].view(jnp.uint32)
    return assemble_output(out_packs, cfg, plan)


@functools.partial(jax.jit,
                   static_argnames=("cfg", "plan", "lane_tile", "interpret"))
def decode_blocks_pallas(r: jnp.ndarray, cfg: DecoderConfig,
                         plan: BlockPlan,
                         lane_tile: int = LANE_TILE,
                         interpret: bool = False) -> jnp.ndarray:
    """Full decode from the global (S, 2) soft stage array via the fused
    Pallas kernel.  Returns packed output words (uint32/uint16).

    NOTE: the (B, L, 2) staging here keeps a tiny (2-wide) minor dimension
    that XLA pads to 128 lanes — fine up to a few Mb, pathological at 32M
    bits.  Large runs should enter through decode_packed_pallas, which
    stages at packed-word granularity instead."""
    _check_vmem(cfg, plan, lane_tile, interpret, value_mode=True)
    is_float = cfg.channel_in == ChannelIn.FP32
    b_pad = -(-plan.num_blocks // lane_tile) * lane_tile
    rs = _stage_layout(r.astype(jnp.float32 if is_float else jnp.int32),
                       plan, b_pad)
    return _run_kernel(rs, cfg, plan, lane_tile, interpret)


# word-granular staging lives in core_xla (backend-agnostic); re-exported
# here under its historical name
from .core_xla import stage_layout_packed as _stage_layout_packed  # noqa: E402
from .core_xla import stage_words as _stage_words  # noqa: E402,F401 (used by the TPU qualification scripts)


def _stage_tr_kernel(body_ref, halo_ref, o_ref):
    wpb = body_ref.shape[1]
    o_ref[:wpb] = body_ref[...].T
    o_ref[wpb:] = halo_ref[...].T


def stage_words_pallas(packed: jnp.ndarray, cfg: DecoderConfig,
                       plan: BlockPlan, b_pad: int,
                       lane_tile: int = LANE_TILE,
                       interpret: bool = False) -> jnp.ndarray:
    """Packed channel words -> (Lw, b_pad) word-major block layout via a
    Pallas transpose kernel.  Semantics identical to core_xla.stage_words.
    The Pallas tiles stream through VMEM at ~1 TB/s
    (scripts/transpose_bench.py) regardless of how XLA chooses to lay out
    the producer, and the body/halo concat never materializes block-major;
    end-to-end the two stagings measure the same within relay noise — this
    one is kept for its layout-independence."""
    dpp = cfg.enc_data_per_pack
    dl, B = plan.dec_len, plan.num_blocks
    wpb = 2 * dl // dpp
    wph = 2 * WARMUP // dpp
    Lw = wpb + wph

    from .core_xla import overlapped_windows
    need = b_pad * wpb + wpb            # body rows + room for the halo shift
    if packed.shape[0] < need:
        packed = jnp.concatenate(
            [packed, jnp.zeros((need - packed.shape[0],), packed.dtype)])
    body = packed[: b_pad * wpb].reshape(b_pad, wpb)
    # block k's halo = words [(k+1)*wpb, (k+1)*wpb + wph); when dec_len < 64
    # the halo spans several following blocks' bodies, so use the general
    # overlapped-window construction (a plain [:, :wph] slice of one
    # shifted view silently truncates — caught by tests/test_fuzz.py)
    halo = overlapped_windows(packed[wpb:], wpb, wph, b_pad)

    out = pl.pallas_call(
        _stage_tr_kernel,
        grid=(b_pad // lane_tile,),
        in_specs=[pl.BlockSpec((lane_tile, wpb), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((lane_tile, wph), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((Lw, lane_tile), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Lw, b_pad), packed.dtype),
        interpret=interpret,
    )(body, halo)

    # padding columns (blocks >= B) carry leftover stream words rather than
    # zeros; those lanes are decoded and discarded, and int32 path metrics
    # cannot overflow on any word content, so no masking pass is spent
    # (natural last-block framing — no patch; see BlockPlan docstring)
    return out


@functools.partial(jax.jit, static_argnames=("cfg", "plan", "lane_tile",
                                              "fused", "interpret",
                                              "fp32_words", "window",
                                              "s16"))
def decode_packed_pallas(packed: jnp.ndarray, cfg: DecoderConfig,
                         plan: BlockPlan,
                         lane_tile: int = LANE_TILE,
                         fused: bool = True,
                         interpret: bool = False,
                         fp32_words: bool = True,
                         window: bool = False,
                         s16: str = "pack",
                         tail_halo=None) -> jnp.ndarray:
    """Full decode straight from packed channel words (the ViterbiCUDA::run
    input format, viterbi.cu:211-238) via the fused Pallas kernel.  This is
    the production large-message entry point.

    Integer channel formats stay packed all the way into the kernel (word
    mode) and, with fused=True, block-major: the stream enters the kernel
    as a free reshape view and the word transpose happens once in VMEM
    (_viterbi_kernel_fused) — zero staging HBM round trips.  fused=False
    keeps the separate staging-transpose pass (stage_words_pallas) for A/B
    measurement.

    FP32 (fp32_words=True, the default) pre-trunc's the per-stage
    (u, d) = trunc(r0 +- r1) pair at staging into SOFT8-format words
    (core_xla.fp32_ud_words — bit-identical metrics, trunc is odd) and
    rides the same fused word-mode kernel; fp32_words=False keeps the
    two-stream float value staging for A/B."""
    is_float = cfg.channel_in == ChannelIn.FP32
    _check_vmem(cfg, plan, lane_tile, interpret, fused=fused,
                value_mode=is_float and not fp32_words, window=window)
    b_pad = -(-plan.num_blocks // lane_tile) * lane_tile
    # roll-halo staging needs the halo to fit within one neighbor block
    # (wph <= wpb <=> dec_len >= 64); otherwise the explicit block-major
    # halo input handles the multi-body-span case
    roll = plan.dec_len >= WARMUP
    if is_float:
        if fp32_words:
            # fastest: the fused VALUE kernel (raw f32 wire, zero-copy
            # staging, clip+u/d in-kernel) when its f32 blocks fit VMEM
            # (dec_len <= ~4096 windowed / 2048 full); else the u/d-word
            # staging (supports any dec_len at SOFT8-like VMEM cost)
            if roll and vmem_footprint_bytes(
                    cfg, plan, lane_tile, window=window,
                    f32_values=True) <= vmem_budget_bytes():
                return _run_kernel_fused_f32v(
                    packed.astype(jnp.float32), cfg, plan, lane_tile,
                    interpret, window=window)
            from .core_xla import fp32_ud_words
            udw = fp32_ud_words(packed.astype(jnp.float32))
            if roll:
                body, edge = _body_and_edge(udw, cfg, plan, b_pad,
                                            lane_tile, dpp=4)
                return _run_kernel_fused(body, edge, cfg, plan, lane_tile,
                                         interpret, vpw=4, width=8,
                                         ud_mode=True, window=window,
                                         roll_halo=True)
            body, halo = _block_major_words(udw, cfg, plan, b_pad, dpp=4)
            return _run_kernel_fused(body, halo, cfg, plan, lane_tile,
                                     interpret, vpw=4, width=8,
                                     ud_mode=True, window=window)
        from .core_xla import stage_floats_2streams
        rs0, rs1 = stage_floats_2streams(packed.astype(jnp.float32), cfg,
                                         plan, b_pad)
        return _run_kernel_f32_2s(rs0, rs1, cfg, plan, lane_tile, interpret,
                                  window=window)
    if tail_halo is not None and not (fused and roll and not is_float):
        raise ValueError("tail_halo requires the fused roll-halo integer "
                         "path (dec_len >= 64, fused=True)")
    if fused:
        if roll:
            body, edge = _body_and_edge(packed.astype(jnp.int32), cfg,
                                        plan, b_pad, lane_tile,
                                        tail_halo=tail_halo)
            return _run_kernel_fused(body, edge, cfg, plan, lane_tile,
                                     interpret, window=window, s16=s16,
                                     roll_halo=True)
        body, halo = _block_major_words(packed.astype(jnp.int32), cfg,
                                        plan, b_pad)
        return _run_kernel_fused(body, halo, cfg, plan, lane_tile,
                                 interpret, window=window, s16=s16)
    wt = stage_words_pallas(packed.astype(jnp.int32), cfg, plan, b_pad,
                            lane_tile, interpret)
    rs = wt.reshape(plan.n_packs, -1, b_pad)
    return _run_kernel(rs, cfg, plan, lane_tile, interpret, window=window,
                       s16=s16)
