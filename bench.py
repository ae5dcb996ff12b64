#!/usr/bin/env python
"""Benchmark harness: decoded throughput on the current backend.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N, ...}

Primary metric: aggregate decoded Gb/s for the BASELINE.json headline
config (K=7 rate-1/2, soft-8 input, int32 metrics, b32 packs), measured
like the reference measures kernel time — around the decode computation
only, excluding host<->device transfer (reference: cudaEvent pair around
the kernel launch, src/viterbi/viterbi.cu:224-232).

Methodology (k-multi slope): the TPU here sits behind a relay that adds a
fluctuating ~25-35 ms dispatch+fetch floor, memoizes identical dispatches,
and has per-dispatch overhead that GROWS with input size — so a
full-vs-half-size slope over-counts (r1's 9.98 ms vs the true 7.2 ms at
32M, scripts/bench_profile.py).  Instead one dispatch runs the decode k
times on distinct pre-staged inputs; (t_k - t_1)/(k-1) is the marginal
cost of one decode+check with the floor and per-dispatch overhead
cancelled exactly at constant dispatch shape.

Also emitted:
  ns_per_stage   kernel regression canary through relay noise: marginal
                 seconds / (grid tiles * ACS stages per tile)
  alu_floor_pct  ALU-op-count floor (hardware.vpu_model, from
                 scripts/op_cost_probe.py measurements) / ns_per_stage
  e2e_gbps       the flagship in-graph loop (fused Pallas generation +
                 decode + BER count as ONE jitted program,
                 sharding/simulate.py), same k-multi slope over keys
"""

import json
import sys
import time

import numpy as np

BASELINE_GBPS = 100.0

# ALU-op-count floor / VPU issue-rate model for the utilization fields
# (alu_floor_pct, mfu_pct): resolved PER DEVICE KIND by
# tpu_viterbi/hardware.py (measured on "TPU v5 lite" via
# scripts/op_cost_probe.py: ~15 minimal (32,128) int32 vector ops per ACS
# stage at ~0.85 ns each = 12.75 ns floor, 60 vreg-ops at the 4.7
# vreg-ops/ns issue peak; BASELINE.md "MFU accounting" documents the
# conversion).  On a device kind with no measured model the fields are
# OMITTED rather than mis-reported against another chip's issue rate
# (VERDICT r4 item 2).

_T0 = time.time()


def _log(msg):
    print(f"[bench +{time.time()-_T0:6.1f}s] {msg}", file=sys.stderr,
          flush=True)


def _run_canary(jax, jnp, tiles=16, n_packs=256, reps=3, k_hi=4):
    """Fixed-shape production-kernel canary: SOFT8 word mode, `tiles` x
    `n_packs` packs per program, full survivor store + traceback, on
    pre-staged word-major random inputs.  Returns ns/stage/tile via the
    k-multi slope.  Shape never changes across rounds, so the number is a
    pure measure of this session's relay/backend speed."""
    import functools

    import numpy as np
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from tpu_viterbi.config import NUM_STATES
    from tpu_viterbi.decoder.core_pallas import _viterbi_kernel

    lt, wpp, bpp = 128, 16, 32
    n_emit = n_packs - 2
    kernel = functools.partial(_viterbi_kernel, n_packs=n_packs, bpp=bpp,
                               n_conv=1, n_emit=n_emit, is_float=False,
                               vpw=4, width=8)
    call = pl.pallas_call(
        kernel,
        grid=(tiles,),
        in_specs=[pl.BlockSpec((n_packs, wpp, lt), lambda i: (0, 0, i),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((n_emit, lt), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_emit, tiles * lt), jnp.int32),
        scratch_shapes=[pltpu.VMEM((n_packs, NUM_STATES, lt), jnp.int32)],
    )

    def kmulti(*xs):
        return sum(jnp.sum(call(x)[:, ::64], dtype=jnp.int32) for x in xs)
    j1, jh = jax.jit(kmulti), jax.jit(kmulti)
    gen = jax.jit(lambda key: jax.random.randint(
        key, (n_packs, wpp, tiles * lt), -2 ** 31, 2 ** 31 - 1,
        dtype=jnp.int32))
    xs = [gen(jax.random.PRNGKey(7000 + i)) for i in range(k_hi + 3)]
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
    return t * 1e9 / (tiles * n_packs * bpp)


def main():
    import jax
    import jax.numpy as jnp

    # NOTE: do NOT enable the persistent compilation cache here — on the
    # axon relay backend cached-executable execution hangs (verified r1).

    from tpu_viterbi.chain import packed_workload
    from tpu_viterbi.config import ChannelIn, DecoderConfig
    from tpu_viterbi.decoder.core_xla import decode_packed_xla, plan_blocks

    message_len = int(sys.argv[1]) if len(sys.argv) > 1 else 32_000_000
    snr_db = 5.5
    cfg = DecoderConfig(channel_in=ChannelIn.SOFT8)

    input_num = 2 * message_len
    m = cfg.get_message_len(input_num)
    # auto dec_len: 8192 (measured best, scripts/sweep2.py) at the 32M+
    # headline sizes; below 8192*128 bits it shrinks to fill the lane tile
    # (bench/small_msg_sweep.json: 5.10 vs 4.90 Gb/s at 1M, 3.94 vs 0.47
    # at 100K)
    from tpu_viterbi.decoder.core_xla import auto_dec_len
    dec_len = auto_dec_len(m, cfg.bits_per_pack)
    plan = plan_blocks(m, cfg.bits_per_pack, dec_len)

    try:
        from tpu_viterbi.decoder.core_pallas import (LANE_TILE,
                                                     decode_packed_pallas,
                                                     pallas_supported)
        use_pallas = pallas_supported(cfg, plan)
    except Exception:
        use_pallas = False

    # --- session canary (VERDICT r3 item 7): a fixed-shape run of the
    # production kernel (16 tiles x 256 packs, word mode, pre-staged
    # word-major inputs — no staging, no assembly), k-multi slope.  The
    # relay's session-to-session speed drifts ~10% (BASELINE.md band
    # 26.2-28.8 ns/stage); recording this per-session number lets future
    # rounds normalize cross-session comparisons instead of discarding
    # them.
    canary_ns = None
    if use_pallas:
        canary_ns = _run_canary(jax, jnp)
        _log(f"canary: {canary_ns:.2f} ns/stage/tile")

    pad_to = 0
    if use_pallas:
        from tpu_viterbi.decoder.core_pallas import padded_input_words
        pad_to = padded_input_words(cfg, plan)

    @jax.jit
    def make_workload(key):
        """-> (packed channel words, ground-truth output words); flat
        layouts end to end (chain/workload.py).  The packed stream is
        zero-padded to the decoder's zero-copy length here, in the
        UNTIMED workload build, so the timed decode stages by pure
        bitcast views (padded_input_words)."""
        bits, packed = packed_workload(key, message_len, ChannelIn.SOFT8,
                                       snr_db, 32.0)
        if pad_to > packed.shape[0]:
            packed = jnp.concatenate(
                [packed, jnp.zeros((pad_to - packed.shape[0],),
                                   packed.dtype)])
        from tpu_viterbi.chain.quantize import pack_words
        ref_words = pack_words(
            bits[cfg.extra_l: cfg.extra_l + m].astype(jnp.uint32), 1)
        return packed, ref_words

    def decode_and_check(packed, ref_words):
        if use_pallas:
            out = decode_packed_pallas(packed, cfg, plan)
        else:
            out = decode_packed_xla(packed, cfg, plan)
        return jnp.sum(jax.lax.population_count(out ^ ref_words)
                       .astype(jnp.int32))

    def kmulti(*pairs_flat):
        ps = list(zip(pairs_flat[0::2], pairs_flat[1::2]))
        return sum(decode_and_check(p, r) for p, r in ps)

    # k sized to HBM: each instance holds its input + staging copies
    k_hi = 4 if message_len <= 64_000_000 else 2
    # 8 inputs keep every timed index set distinct from both warmup
    # sets AND every other timed set across 6 reps for BOTH k_hi values
    # (the relay memoizes identical dispatches; a repeated one returns
    # floor time and corrupts the min-based slope in either direction)
    n_inputs = 8

    _log(f"building {n_inputs} workloads (m={m}, backend="
         f"{'pallas' if use_pallas else 'xla'})")
    ws = []
    for i in range(n_inputs):
        ws.append(jax.block_until_ready(
            make_workload(jax.random.PRNGKey(42 + i))))
    pairs = [w for w in ws]

    flat = lambda tup: [x for pair in tup for x in pair]
    n = len(pairs)
    j1 = jax.jit(kmulti)
    jh = jax.jit(kmulti)

    # compile + correctness guard on the first workload
    ben = int(np.asarray(j1(*flat(pairs[:1]))))
    ber = ben / m

    if message_len < 8_000_000:
        # sub-~2 ms decodes sit below the relay's ~ms dispatch jitter, so
        # the k-multi differential vanishes in noise.  Amplify instead:
        # ONE dispatch runs the decode K times in a lax.fori_loop on
        # in-graph-perturbed inputs (x + i, distinct every iteration), K
        # sized so K * decode >= ~40 ms (same methodology as
        # scripts/scaling_curve.py / small_msg_sweep.py).
        K = max(2, min(2048, int(0.04 / (m / 4.5e9)) + 1))
        _log(f"BEN={ben}; timing decode (fori-amplified slope, K={K})")

        def decode_only(packed):
            if use_pallas:
                return decode_packed_pallas(packed, cfg, plan)
            return decode_packed_xla(packed, cfg, plan)

        def mk(k):
            def run(x):
                def body(i, acc):
                    return acc + jnp.sum(
                        decode_only(x + i).view(jnp.int32))
                return jax.lax.fori_loop(0, k, body, jnp.int32(0))
            return jax.jit(run)

        f1, fK = mk(1), mk(K)
        xs = [p for p, _ in pairs]
        np.asarray(f1(xs[0]))
        np.asarray(fK(xs[0]))
        tl, th = [], []
        for j in range(6):
            t0 = time.perf_counter()
            np.asarray(f1(xs[1 + (2 * j) % (n - 1)]))
            tl.append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            np.asarray(fK(xs[1 + (2 * j + 1) % (n - 1)]))
            th.append(time.perf_counter() - t0)
        _log(f"t_1: {[f'{t*1e3:.1f}ms' for t in tl]}  "
             f"t_K: {[f'{t*1e3:.1f}ms' for t in th]}")
        kernel_s = max((min(th) - min(tl)) / (K - 1), 1e-9)
        raw = min(tl)
        gbps = m / kernel_s / 1e9
    else:
        _log(f"BEN={ben}; timing decode (k-multi slope, k={k_hi})")
        np.asarray(jh(*flat(pairs[:k_hi])))
        tl, th = [], []
        for j in range(6):   # 6 reps: the relay intermittently injects
                             # 50-100 ms outliers; min() needs clean samples
            t0 = time.perf_counter()
            np.asarray(j1(*flat([pairs[1 + (j % (n - 1))]])))
            tl.append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            np.asarray(jh(*flat([pairs[(j + 2 + i) % n]
                                 for i in range(k_hi)])))
            th.append(time.perf_counter() - t0)
        _log(f"t_k1: {[f'{t*1e3:.1f}ms' for t in tl]}  "
             f"t_k{k_hi}: {[f'{t*1e3:.1f}ms' for t in th]}")
        kernel_s = max((min(th) - min(tl)) / (k_hi - 1), 1e-9)
        raw = min(tl)
        gbps = m / kernel_s / 1e9

    # Credibility sentinel, scaled with size: a single chip cannot beat
    # ~10 Gb/s even at the 12.75 ns/stage ALU floor (128 lane-bits/stage),
    # so an implied >25 Gb/s means the slope was corrupted (memoized or
    # outlier dispatch) — publish the unreliable-timing sentinel, never an
    # absurd headline.  (The old fixed 2e-6 threshold only protected
    # sub-ms decodes; a corrupted 32M-bit slope sailed through it —
    # code-review r5 finding.)
    if kernel_s < m / 25e9:
        print(json.dumps({"metric": "decoded_throughput_soft8_b32",
                          "value": 0.0, "unit": "Gb/s", "vs_baseline": 0.0,
                          "message_len": message_len, "ber_at_5p5dB": ber,
                          "error": f"slope {kernel_s*1e6:.1f} us implies "
                                   f"{gbps:.0f} Gb/s — beyond the single-"
                                   "chip credibility bound; timing "
                                   "corrupted (relay memoization/outlier)"}))
        return 0
    if ber > 1e-2:
        print(json.dumps({"metric": "decoded_throughput_soft8_b32",
                          "value": 0.0, "unit": "Gb/s", "vs_baseline": 0.0,
                          "error": f"BER {ber:.3g} too high"}))
        return 1

    # kernel-regression canaries (VERDICT r1 item 8)
    result = {
        "metric": "decoded_throughput_soft8_b32",
        "value": round(gbps, 3),
        "unit": "Gb/s",
        "vs_baseline": round(gbps / BASELINE_GBPS, 4),
        "message_len": message_len,
        "kernel_seconds": round(kernel_s, 6),
        "single_dispatch_seconds": round(raw, 6),
        "ber_at_5p5dB": ber,
        "backend": "pallas" if use_pallas else "xla",
        "device": str(jax.devices()[0]),
    }
    if use_pallas:
        tiles = -(-plan.num_blocks // LANE_TILE)
        stages = tiles * plan.n_packs * plan.bits_per_pack
        ns_stage = kernel_s * 1e9 / stages
        result["ns_per_stage"] = round(ns_stage, 2)
        # externally interpretable utilization (VERDICT r3 item 6):
        # achieved vreg-ops/ns on the stage's minimal algorithmic work vs
        # the measured VPU issue peak of THIS device kind (hardware.py;
        # BASELINE.md "MFU accounting" documents the conversion) — fields
        # omitted when the kind has no measured model
        from tpu_viterbi.hardware import vpu_model
        model = vpu_model()
        if model is not None:
            alu_floor_ns, stage_vreg_ops, vreg_ops_per_ns_peak = model
            result["alu_floor_pct"] = round(
                100.0 * alu_floor_ns / ns_stage, 1)
            vops_per_ns = stage_vreg_ops / ns_stage
            result["vreg_ops_per_ns"] = round(vops_per_ns, 2)
            result["mfu_pct"] = round(100.0 * vops_per_ns /
                                      vreg_ops_per_ns_peak, 1)
        if canary_ns is not None:
            result["canary_ns"] = round(canary_ns, 2)

    # flagship e2e: fused in-graph generate+decode+count (VERDICT item 10)
    del ws, pairs
    try:
        from tpu_viterbi.sharding.mesh import make_block_mesh
        from tpu_viterbi.sharding.simulate import build_sharded_simulation
        mesh = make_block_mesh(jax.devices()[:1])
        sim, m_e2e = build_sharded_simulation(
            cfg, message_len, mesh, snr_db=snr_db, dec_len=dec_len)
        keys = [jax.random.PRNGKey(1000 + i) for i in range(8)]
        # small sizes: amplify like the decode timing (K sims per dispatch
        # on fold_in-derived keys); large: plain k-multi over keys
        K_e2e = k_hi if message_len >= 8_000_000 else \
            max(2, min(1024, int(0.04 / (m_e2e / 3.5e9)) + 1))

        def sim_K(k):
            def run(key):
                def body(i, acc):
                    return acc + sim(jax.random.fold_in(key, i))
                return jax.lax.fori_loop(0, k, body, jnp.int32(0))
            return jax.jit(run)

        s1, sh = sim_K(1), sim_K(K_e2e)
        ben_e2e = int(np.asarray(s1(keys[0])))
        np.asarray(sh(keys[0]))
        tl, th = [], []
        for j in range(4):
            t0 = time.perf_counter()
            np.asarray(s1(keys[1 + (2 * j) % (len(keys) - 1)]))
            tl.append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            np.asarray(sh(keys[1 + (2 * j + 1) % (len(keys) - 1)]))
            th.append(time.perf_counter() - t0)
        e2e_s = max((min(th) - min(tl)) / (K_e2e - 1), 1e-9)
        _log(f"e2e (K={K_e2e}) t_1: {[f'{t*1e3:.1f}ms' for t in tl]}  "
             f"t_K: {[f'{t*1e3:.1f}ms' for t in th]}  BEN={ben_e2e}")
        # same size-scaled credibility bound as the decode sentinel
        if e2e_s > m_e2e / 25e9 and ben_e2e / m_e2e < 1e-2:
            result["e2e_seconds"] = round(e2e_s, 6)
            result["e2e_gbps"] = round(m_e2e / e2e_s / 1e9, 3)
    except Exception as e:  # e2e is a secondary metric; never fail the run
        _log(f"e2e metric skipped: {type(e).__name__}: {e}")

    # sustained serving (VERDICT r4 item 7): >= 10 consecutive messages
    # through ViterbiTPU.run_stream — inputs pre-staged, dispatches queued
    # back to back with one trailing block.  Unlike the slope figures this
    # INCLUDES any serialized per-dispatch overhead the backend cannot
    # pipeline away (the relay's ~25-35 ms floor here; see BASELINE.md
    # "sustained serving").
    try:
        from tpu_viterbi.decoder.api import ViterbiTPU
        n_msgs = 10 if message_len <= 64_000_000 else 4
        dec = ViterbiTPU(cfg, dec_len=dec_len)
        words = cfg.get_input_words(input_num)
        host_rng = np.random.default_rng(555)
        msgs = [host_rng.integers(-2 ** 31, 2 ** 31, size=words)
                .astype(np.int32) for _ in range(n_msgs + 1)]
        # warm with a throwaway input (the relay memoizes repeats)
        dec.run_stream(msgs[:1], input_num, want_time=False)
        msgs = msgs[1:]
        _log(f"sustained: streaming {n_msgs} x {message_len} bits")
        _, per = dec.run_stream(msgs, input_num)
        result["sustained_seconds_per_msg"] = round(per, 6)
        result["sustained_gbps"] = round(m / per / 1e9, 3)
        _log(f"sustained: {per*1e3:.1f} ms/msg = "
             f"{result['sustained_gbps']} Gb/s")
    except Exception as e:
        _log(f"sustained metric skipped: {type(e).__name__}: {e}")

    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
