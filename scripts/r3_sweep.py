"""Round-3 on-chip decode sweep: survivor-window A/B + the plans the
freed VMEM unlocks (VERDICT r2 items 3, 4, 5, 8).

Rows measured (decode+check k-multi slope, distinct inputs per dispatch,
same methodology as bench.py / scripts/channel_throughput.py):

  soft8/8192/full      — the shipped r2 baseline
  soft8/8192/win       — one-pointer circular survivor buffer
  soft8/8192/win/lt256 — lane_tile 256 under the freed VMEM
  soft8/16384/win      — dec_len beyond the old survivor-store cliff
  soft8/32768/win
  soft16/8192/win      — SOFT16 past its old 4096 VMEM cap (item 8)
  soft16/4096/full     — r2 baseline for comparison
  fp32/8192/ud         — FP32 through u/d word mode (item 3)
  fp32/4096/2s         — r2 two-stream value baseline

Prints one JSON line per row and a summary; writes bench/r3_sweep.json.

Usage: timeout 3600 python scripts/r3_sweep.py [message_len]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

T0 = time.time()


def log(msg):
    print(f"[r3 +{time.time()-T0:6.1f}s] {msg}", file=sys.stderr, flush=True)


SCALES = {"HARD": 40000.0, "SOFT4": 4.0, "SOFT8": 32.0, "SOFT16": 8192.0,
          "FP32": 4.0}


def measure(label, channel_name, message_len, dec_len, *, window=False,
            lane_tile=128, fp32_words=True, snr_db=5.5, k_hi=4):
    import jax
    import jax.numpy as jnp

    from tpu_viterbi.chain import packed_workload
    from tpu_viterbi.chain.quantize import pack_words
    from tpu_viterbi.config import ChannelIn, DecoderConfig
    from tpu_viterbi.decoder.core_pallas import (decode_packed_pallas,
                                                 vmem_footprint_bytes)
    from tpu_viterbi.hardware import vmem_budget_bytes
    VMEM_BUDGET_BYTES = vmem_budget_bytes()
    from tpu_viterbi.decoder.core_xla import plan_blocks

    channel = ChannelIn[channel_name]
    cfg = DecoderConfig(channel_in=channel)
    scale = SCALES[channel_name]
    input_num = 2 * message_len
    m = cfg.get_message_len(input_num)
    plan = plan_blocks(m, cfg.bits_per_pack, dec_len)
    need = vmem_footprint_bytes(cfg, plan, lane_tile, window=window,
                                value_mode=(channel_name == "FP32"
                                            and not fp32_words))
    if need > VMEM_BUDGET_BYTES:
        log(f"{label}: skipped, vmem {need/1e6:.1f}M > budget")
        return None

    @jax.jit
    def make_workload(key):
        bits, packed = packed_workload(key, message_len, channel, snr_db,
                                       scale)
        ref = pack_words(bits[cfg.extra_l: cfg.extra_l + m]
                         .astype(jnp.uint32), 1)
        return packed, ref

    def decode_and_check(packed, ref):
        out = decode_packed_pallas(packed, cfg, plan, lane_tile=lane_tile,
                                   window=window, fp32_words=fp32_words)
        return jnp.sum(jax.lax.population_count(out ^ ref)
                       .astype(jnp.int32))

    def kmulti(*flat):
        ps = list(zip(flat[0::2], flat[1::2]))
        return sum(decode_and_check(p, r) for p, r in ps)

    n_inputs = 6
    log(f"{label}: building {n_inputs} workloads (vmem {need/1e6:.1f}M)")
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
        np.asarray(j1(*flat([ws[1 + (j % (n - 1))]])))
        tl.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        np.asarray(jh(*flat([ws[(j + 2 + i) % n] for i in range(k_hi)])))
        th.append(time.perf_counter() - t0)
    slope = (min(th) - min(tl)) / (k_hi - 1)
    if slope <= 0 or slope < 2e-4 * message_len / 32e6:
        log(f"{label}: DEGENERATE slope {slope:.3g}; rerun")
        return {"label": label, "error": f"degenerate slope {slope:.3g}"}
    tiles = -(-plan.num_blocks // lane_tile)
    stages = tiles * plan.n_packs * plan.bits_per_pack
    rec = {
        "label": label, "channel": channel_name, "dec_len": plan.dec_len,
        "window": window, "lane_tile": lane_tile,
        "message_len": message_len, "ben_at_5p5dB": ben,
        "kernel_seconds": round(slope, 6),
        "gbps": round(m / slope / 1e9, 3),
        "ns_per_stage": round(slope * 1e9 / stages, 2),
    }
    log(f"{label}: {rec['gbps']} Gb/s ({slope*1e3:.2f} ms, "
        f"{rec['ns_per_stage']} ns/stage, BEN={ben})")
    if ben / m > 1e-2:
        rec["error"] = f"BER {ben/m:.3g} too high"
        log(f"{label}: BER TOO HIGH")
    return rec


def main():
    import jax
    message_len = int(sys.argv[1]) if len(sys.argv) > 1 else 32_000_000
    log(f"device: {jax.devices()[0]}")
    rows = []
    cases = [
        ("soft8/8192/full", "SOFT8", 8192, dict()),
        ("soft8/8192/win", "SOFT8", 8192, dict(window=True)),
        ("soft8/8192/win/lt256", "SOFT8", 8192,
         dict(window=True, lane_tile=256)),
        ("soft8/16384/win", "SOFT8", 16384, dict(window=True)),
        ("soft8/32768/win", "SOFT8", 32768, dict(window=True)),
        ("soft16/4096/full", "SOFT16", 4096, dict()),
        ("soft16/8192/win", "SOFT16", 8192, dict(window=True)),
        ("fp32/4096/2s", "FP32", 4096, dict(fp32_words=False, k_hi=2)),
        ("fp32/8192/ud", "FP32", 8192, dict()),
        ("fp32/8192/ud/win", "FP32", 8192, dict(window=True)),
    ]
    for label, ch, dl, kw in cases:
        try:
            r = measure(label, ch, message_len, dl, **kw)
        except Exception as e:
            log(f"{label}: FAILED {type(e).__name__}: {str(e)[:200]}")
            r = {"label": label, "error": f"{type(e).__name__}: {str(e)[:200]}"}
        if r:
            rows.append(r)
    out = {"message_len": message_len, "device": str(jax.devices()[0]),
           "rows": rows}
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        os.pardir, "bench", "r3_sweep.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
        f.write("\n")
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
