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
cross the wire, inputs differ per timed call, and a null-dispatch floor is
subtracted.
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

    from tpu_viterbi.chain import add_awgn, conv_encode, quantize_and_pack
    from tpu_viterbi.chain.source import random_bits
    from tpu_viterbi.config import ChannelIn, DecoderConfig
    from tpu_viterbi.decoder.core_xla import decode_packed_xla, plan_blocks

    message_len = int(sys.argv[1]) if len(sys.argv) > 1 else 32_000_000
    snr_db = 5.5
    sigma = float(10.0 ** (-snr_db / 5.0))
    cfg = DecoderConfig(channel_in=ChannelIn.SOFT8)
    input_num = 2 * message_len
    m = cfg.get_message_len(input_num)
    plan = plan_blocks(m, cfg.bits_per_pack, 2048)

    try:
        from tpu_viterbi.decoder.core_pallas import (decode_packed_pallas,
                                                     pallas_supported)
        use_pallas = pallas_supported(cfg, plan)
    except Exception:
        use_pallas = False

    @jax.jit
    def make_workload(key):
        """-> (packed channel words, ground-truth output words)."""
        k1, k2 = jax.random.split(key)
        bits = random_bits(k1, message_len)
        coded = conv_encode(bits)
        noisy = add_awgn(k2, coded, sigma)
        packed = quantize_and_pack(noisy, ChannelIn.SOFT8, 32.0)
        # reference-truth words: bits[extra_l : extra_l+m], MSB-first packs
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
        # single fetched array -> exactly one dispatch+fetch round trip
        # (the calibrated floor is one round trip)
        return jnp.stack([jnp.sum(out.view(jnp.int32)).astype(jnp.int64),
                          ben])

    @jax.jit
    def null_sum(packed):
        return jnp.sum(packed[:128])

    _log(f"staging workloads (m={m}, backend="
         f"{'pallas' if use_pallas else 'xla'})")
    # 4 distinct workloads: the relay memoizes identical dispatches, so every
    # *timed* decode below must be a first-seen dispatch
    workloads = [jax.block_until_ready(make_workload(jax.random.PRNGKey(i)))
                 for i in (42, 43, 44, 45)]
    _log("workloads staged; calibrating floor")

    np.asarray(null_sum(workloads[0][0]))
    floors = []
    for i in range(4):
        w = workloads[i % len(workloads)][0]
        t0 = time.perf_counter()
        np.asarray(null_sum(w))
        floors.append(time.perf_counter() - t0)
    floor = min(floors)

    _log(f"floor={floor*1e3:.1f} ms; compiling decode")
    # compile + first run (also yields BEN for the correctness guard)
    ben = int(np.asarray(decode_and_check(*workloads[0]))[1])
    ber = ben / m
    _log(f"decode compiled; BEN={ben}; timing")

    times = []
    for i in range(1, len(workloads)):    # fresh dispatches only
        w = workloads[i]
        t0 = time.perf_counter()
        np.asarray(decode_and_check(*w))
        times.append(time.perf_counter() - t0)
    _log(f"times: {[f'{t*1e3:.0f}ms' for t in times]}")
    raw = min(times)
    kernel_s = max(raw - floor, 1e-9)
    gbps = m / kernel_s / 1e9

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
        "raw_seconds": round(raw, 6),
        "dispatch_floor_seconds": round(floor, 6),
        "ber_at_5p5dB": ber,
        "backend": "pallas" if use_pallas else "xla",
        "device": str(jax.devices()[0]),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
