"""Small-message dec_len sweep (VERDICT r4 item 3): the scaling curve
droops below ~8M bits (3.27 Gb/s at 1M vs 4.7+ at 32M) because 123 blocks
underfill the 128-lane tile at the static dec_len 8192.  This sweep
measures, in ONE process, decode throughput at small message sizes across
dec_len choices to pick the auto_dec_len policy.

Methodology: sub-ms decodes are far below the relay's ~ms dispatch
jitter, so the plain k-multi slope is garbage at these sizes (measured:
negative slopes, 48 Gb/s artifacts).  Instead ONE dispatch runs the
decode K times inside a lax.fori_loop on in-graph-perturbed inputs
(x + i — a trivial elementwise derivation, distinct every iteration so
nothing collapses), with K sized so K * decode >= ~40 ms; the (t_K -
t_1)/(K - 1) slope then amplifies the decode well above the noise floor.
Distinct staged inputs rotate across timed dispatches (the relay
memoizes identical dispatches).

Usage: timeout 3600 python scripts/small_msg_sweep.py
Writes bench/small_msg_sweep.json.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from tpu_viterbi.config import ChannelIn, DecoderConfig  # noqa: E402
from tpu_viterbi.decoder.core_pallas import (LANE_TILE,  # noqa: E402
                                             decode_packed_pallas,
                                             padded_input_words)
from tpu_viterbi.decoder.core_xla import (auto_dec_len,  # noqa: E402
                                          plan_blocks)
from timing_util import amplified_slope  # noqa: E402

T0 = time.time()


def log(s):
    print(f"+{time.time()-T0:6.1f}s {s}", flush=True)


def point(m, dl, reps=3, target_s=0.04):
    cfg = DecoderConfig(channel_in=ChannelIn.SOFT8)
    plan = plan_blocks(m, 32, dl)
    n_words = padded_input_words(cfg, plan)   # zero-copy staging length
    gen = jax.jit(lambda k: jax.random.randint(
        k, (n_words,), -(2 ** 31), 2 ** 31 - 1, dtype=jnp.int32))
    xs = [jax.block_until_ready(gen(jax.random.PRNGKey(100 * dl + i)))
          for i in range(reps + 1)]

    t_est = m / 4.5e9
    K = max(2, min(2048, int(target_s / t_est) + 1))

    def mk(k):
        def run(x):
            def body(i, acc):
                out = decode_packed_pallas(x + i, cfg, plan)
                return acc + jnp.sum(out.view(jnp.int32))
            return jax.lax.fori_loop(0, k, body, jnp.int32(0))
        return jax.jit(run)

    t = amplified_slope(mk, xs, K, reps=reps)
    tiles = -(-plan.num_blocks // LANE_TILE)
    stages = tiles * plan.n_packs * plan.bits_per_pack
    if t <= 0:
        # relay jitter ate the differential — flag, never publish garbage
        log(f"m={m:>10,d} dl={plan.dec_len:>5d}: K={K:4d} NON-POSITIVE "
            f"slope ({t*1e6:.1f} us), row flagged")
        return {"message_len": m, "dec_len": plan.dec_len, "K": K,
                "blocks": plan.num_blocks, "tiles": tiles,
                "slope_nonpositive": True}
    gbps = m / t / 1e9
    ns_stage = t * 1e9 / stages
    log(f"m={m:>10,d} dl={plan.dec_len:>5d}: K={K:4d} {t*1e6:8.1f} us = "
        f"{gbps:5.2f} Gb/s  ({plan.num_blocks:>5d} blocks, {tiles:>3d} "
        f"tiles, {ns_stage:5.2f} ns/stage)")
    return {"message_len": m, "dec_len": plan.dec_len, "K": K,
            "decode_seconds": round(t, 9), "gbps": round(gbps, 3),
            "blocks": plan.num_blocks, "tiles": tiles,
            "ns_per_stage": round(ns_stage, 2)}


def main():
    log(f"device: {jax.devices()[0]}")
    rows = []
    sizes = [99_968, 249_984, 1_000_000, 3_999_872]
    for m in sizes:
        cands = [8192, 4096, 2048, 1024, 512, auto_dec_len(m, 32)]
        seen = set()
        for dl in cands:
            dl_eff = max(32, min(dl, m) - min(dl, m) % 32)
            if dl_eff in seen:
                continue
            seen.add(dl_eff)
            try:
                rows.append(point(m, dl))
            except Exception as e:
                log(f"m={m} dl={dl}: FAILED {type(e).__name__}: "
                    f"{str(e)[:150]}")
    # reference large point to anchor the session's speed
    rows.append(point(32_000_000, 8192, target_s=0.06))
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "bench", "small_msg_sweep.json")
    with open(out, "w") as f:
        json.dump(rows, f, indent=1)
        f.write("\n")
    log(f"wrote {out}")


if __name__ == "__main__":
    main()
