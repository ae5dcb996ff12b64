"""A/B the SOFT16 per-stage unpack formulations on chip (VERDICT r3
item 1: close the +5 ns/stage gap over the packed band, isolated by
scripts/soft16_probe.py to the vpw=2 per-stage structure — one (32, LT)
word array row-sliced at every stage).

Candidates (core_pallas._viterbi_kernel s16=, all bit-identical; CPU CI
locks equality):
  pack    — whole-pack u/d arrays (r3 shipped)
  halves  — pre-split contiguous 16-row halves (SOF8-shaped arrays)
  lazy    — per-stage 1-row slice + 4 one-row unpack ops (min live state)
  group   — unpack GROUP_LEN=4 stages per coarse 4-row slice

Same-process k-multi slope at 32M bits, BEN=0 gate, SOFT8/8192 measured
first as the band anchor.  Results -> bench/soft16_fix.json.

Usage: timeout 3600 python scripts/soft16_fix.py [message_bits]
"""

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

T0 = time.time()


def log(msg):
    print(f"+{time.time()-T0:6.1f}s {msg}", flush=True)


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from tpu_viterbi.chain import packed_workload
    from tpu_viterbi.chain.quantize import pack_words
    from tpu_viterbi.config import ChannelIn, DecoderConfig
    from tpu_viterbi.decoder.core_pallas import (decode_packed_pallas,
                                                 resolve_window)
    from tpu_viterbi.decoder.core_xla import plan_blocks
    from tpu_viterbi.sharding.simulate import DEFAULT_SCALES

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 32_000_000
    log(f"device: {jax.devices()[0]}")

    results = []

    def measure(label, ch, dec_len, s16, survivor="auto"):
        cfg = DecoderConfig(channel_in=ch)
        m = cfg.get_message_len(2 * n)
        plan = plan_blocks(m, 32, dec_len)
        win = resolve_window(survivor, cfg, plan)

        def dc(packed, ref):
            out = decode_packed_pallas(packed, cfg, plan, window=win,
                                       s16=s16)
            return jnp.sum(jax.lax.population_count(out ^ ref)
                           .astype(jnp.int32))

        def kmulti(*flat):
            return sum(dc(p, r) for p, r in zip(flat[0::2], flat[1::2]))

        @jax.jit
        def mk(key):
            bits, packed = packed_workload(key, n, ch, 5.5,
                                           DEFAULT_SCALES[ch])
            ref = pack_words(bits[cfg.extra_l: cfg.extra_l + m]
                             .astype(jnp.uint32), 1)
            return packed, ref

        ws = [jax.block_until_ready(mk(jax.random.PRNGKey(31 + i)))
              for i in range(6)]
        flat = lambda t: [x for pair in t for x in pair]
        j1, jh = jax.jit(kmulti), jax.jit(kmulti)
        ben = int(np.asarray(j1(*flat(ws[:1]))))
        np.asarray(jh(*flat(ws[:4])))
        tl, th = [], []
        for j in range(5):
            t0 = time.perf_counter()
            np.asarray(j1(*flat([ws[1 + (j % 5)]])))
            tl.append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            np.asarray(jh(*flat([ws[(j + 2 + i) % 6] for i in range(4)])))
            th.append(time.perf_counter() - t0)
        s = (min(th) - min(tl)) / 3
        tiles = -(-plan.num_blocks // 128)
        stages = tiles * plan.n_packs * plan.bits_per_pack
        row = {"label": label, "channel": ch.name, "dec_len": dec_len,
               "s16": s16, "window": bool(win), "gbps": round(m / s / 1e9, 3),
               "ms": round(s * 1e3, 2),
               "ns_per_stage": round(s * 1e9 / stages, 2), "ben": ben}
        results.append(row)
        log(f"{label:24s} {row['gbps']:6.3f} Gb/s  "
            f"{row['ns_per_stage']:5.2f} ns/stage  BEN={ben}")
        del ws

    measure("soft8/8192 (anchor)", ChannelIn.SOFT8, 8192, "pack")
    for s16 in ("pack", "halves", "lazy", "group"):
        measure(f"soft16/4096/{s16}", ChannelIn.SOFT16, 4096, s16)
    # winner check at dec_len 8192 (windowed survivor) happens manually
    # once the 4096 ordering is known; run the two most promising:
    for s16 in ("lazy", "group"):
        measure(f"soft16/8192w/{s16}", ChannelIn.SOFT16, 8192, s16,
                survivor="auto")

    out = os.path.join(REPO, "bench", "soft16_fix.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
        f.write("\n")
    log(f"wrote {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
