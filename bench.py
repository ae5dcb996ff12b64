#!/usr/bin/env python
"""Benchmark harness: decoded throughput on the current backend.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

Metric: aggregate decoded Gb/s for the BASELINE.json headline config
(K=7 rate-1/2, soft-8 input, int32 metrics, b32 packs), measured like the
reference measures kernel time — around the decode computation only,
excluding host<->device transfer (reference: cudaEvent pair around the
kernel launch, src/viterbi/viterbi.cu:224-232).

Harness notes for this dev environment: the TPU sits behind a relay that
adds a fixed dispatch+fetch latency (~33 ms) and memoizes identical
dispatches, and bulk host<->device transfer is slow.  Therefore the
workload is generated on device, the BER check runs on device
(XOR + population_count against the repacked ground truth), only scalars
cross the wire, inputs differ per timed call, and the fluctuating
dispatch+fetch floor is cancelled by a full-vs-half-size slope.
"""

import json
import sys
import time

import numpy as np

BASELINE_GBPS = 100.0
_T0 = time.time()


def _log(msg):
    print(f"[bench +{time.time()-_T0:6.1f}s] {msg}", file=sys.stderr,
          flush=True)


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
    # dec_len 8192 measured best at 32M on v5e (scripts/sweep2.py): the
    # 64-stage halo amortizes over longer blocks
    dec_len = 8192

    def setup(msg_len):
        input_num = 2 * msg_len
        m = cfg.get_message_len(input_num)
        plan = plan_blocks(m, cfg.bits_per_pack, dec_len)

        @jax.jit
        def make_workload(key):
            """-> (packed channel words, ground-truth output words); flat
            layouts end to end (chain/workload.py)."""
            bits, packed = packed_workload(key, msg_len, ChannelIn.SOFT8,
                                           snr_db, 32.0)
            # reference-truth words: bits[extra_l:extra_l+m], MSB-first packs
            from tpu_viterbi.chain.quantize import pack_words
            ref_words = pack_words(
                bits[cfg.extra_l: cfg.extra_l + m].astype(jnp.uint32), 1)
            return packed, ref_words

        @jax.jit
        def decode_and_check(packed, ref_words):
            if use_pallas:
                out = decode_packed_pallas(packed, cfg, plan)
            else:
                out = decode_packed_xla(packed, cfg, plan)
            ben = jnp.sum(jax.lax.population_count(out ^ ref_words)
                          .astype(jnp.int64))
            # one fetched array -> exactly one dispatch+fetch round trip
            return jnp.stack([jnp.sum(out.view(jnp.int32)).astype(jnp.int64),
                              ben])

        return m, make_workload, decode_and_check

    try:
        from tpu_viterbi.decoder.core_pallas import (decode_packed_pallas,
                                                     pallas_supported)
        use_pallas = pallas_supported(
            cfg, plan_blocks(cfg.get_message_len(2 * message_len),
                             cfg.bits_per_pack, dec_len))
    except Exception:
        use_pallas = False

    # Slope methodology: time full decodes at m and m/2 and take the
    # difference, which cancels the relay's dispatch+fetch floor exactly
    # (the floor fluctuates +-8 ms run to run and swamps plain floor
    # subtraction).  Decode cost is linear in message length (block-
    # parallel over equal-size blocks), so kernel_s(m) = 2 * (t_m - t_m/2).
    # Peak HBM stays at a single decode, which k>=2 multi-decode dispatches
    # exceed at 32M bits on this backend.
    m, make_full, decode_full = setup(message_len)
    _, make_half, decode_half = setup(message_len // 2)

    _log(f"compiling (m={m}, backend="
         f"{'pallas' if use_pallas else 'xla'})")
    # compile + first run (also yields BEN for the correctness guard);
    # workloads are generated one at a time and dropped after use — the
    # relay memoizes identical dispatches (every timed dispatch must be
    # first-seen) and holding many 32M workloads exhausts device HBM
    w = jax.block_until_ready(make_full(jax.random.PRNGKey(42)))
    ben = int(np.asarray(decode_full(*w))[1])
    del w
    w = jax.block_until_ready(make_half(jax.random.PRNGKey(52)))
    np.asarray(decode_half(*w))
    del w
    ber = ben / m
    _log(f"decode compiled; BEN={ben}; timing")

    tf, th = [], []
    for j in range(5):
        w = jax.block_until_ready(make_full(jax.random.PRNGKey(43 + j)))
        t0 = time.perf_counter()
        np.asarray(decode_full(*w))
        tf.append(time.perf_counter() - t0)
        del w
        w = jax.block_until_ready(make_half(jax.random.PRNGKey(53 + j)))
        t0 = time.perf_counter()
        np.asarray(decode_half(*w))
        th.append(time.perf_counter() - t0)
        del w
    _log(f"t_full: {[f'{t*1e3:.1f}ms' for t in tf]}  "
         f"t_half: {[f'{t*1e3:.1f}ms' for t in th]}")
    raw = min(tf)
    med = lambda xs: sorted(xs)[len(xs) // 2]
    # kernel work scales with padded lane tiles, not raw bits: at dec_len
    # 8192 full pads to e.g. 31 tiles and half to 16, so a plain x2 slope
    # would under-count by ~3%.  Scale by the actual tile ratio.
    from tpu_viterbi.decoder.core_pallas import LANE_TILE

    def tiles(ml):
        blocks = -(-cfg.get_message_len(2 * ml) // dec_len)
        return -(-blocks // LANE_TILE)
    tf_tiles = tiles(message_len)
    th_tiles = tiles(message_len // 2)
    if tf_tiles > th_tiles:
        ratio = tf_tiles / (tf_tiles - th_tiles)
    else:
        # tiny messages quantize to the same tile count — fall back to the
        # message-length ratio (the work difference is then sub-tile)
        ratio = 2.0
    slope_s = (med(tf) - med(th)) * ratio
    kernel_s = max(slope_s, 1e-9)
    gbps = m / kernel_s / 1e9

    if slope_s < 2e-4:
        # decode time below the relay's timing resolution (tiny messages):
        # a Gb/s figure would be meaningless noise
        print(json.dumps({"metric": "decoded_throughput_soft8_b32",
                          "value": 0.0, "unit": "Gb/s", "vs_baseline": 0.0,
                          "message_len": message_len, "ber_at_5p5dB": ber,
                          "error": "decode faster than timing resolution; "
                                   "use a larger message_len"}))
        return 0

    if ber > 1e-2:
        print(json.dumps({"metric": "decoded_throughput_soft8_b32",
                          "value": 0.0, "unit": "Gb/s", "vs_baseline": 0.0,
                          "error": f"BER {ber:.3g} too high"}))
        return 1

    print(json.dumps({
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
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
