"""Small-message dec_len sweep (VERDICT r4 item 3): the scaling curve
droops below ~8M bits (3.27 Gb/s at 1M vs 4.7+ at 32M) because 123 blocks
underfill the 128-lane tile at the static dec_len 8192.  This sweep
measures, in ONE process, decode throughput at small message sizes across
dec_len choices (pre-padded zero-copy staging, k-multi slope) to pick the
auto_dec_len policy.

Usage: timeout 3600 python scripts/small_msg_sweep.py
Writes bench/small_msg_sweep.json.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from timing_util import slope  # noqa: E402

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from tpu_viterbi.config import ChannelIn, DecoderConfig  # noqa: E402
from tpu_viterbi.decoder.core_pallas import (LANE_TILE,  # noqa: E402
                                             decode_packed_pallas,
                                             padded_input_words)
from tpu_viterbi.decoder.core_xla import plan_blocks  # noqa: E402

T0 = time.time()


def log(s):
    print(f"+{time.time()-T0:6.1f}s {s}", flush=True)


def point(m, dl, reps=3, ks=(1, 5)):
    cfg = DecoderConfig(channel_in=ChannelIn.SOFT8)
    plan = plan_blocks(m, 32, dl)
    n_words = padded_input_words(cfg, plan)   # zero-copy staging length
    gen = jax.jit(lambda k: jax.random.randint(
        k, (n_words,), -(2 ** 31), 2 ** 31 - 1, dtype=jnp.int32),
        static_argnums=())
    xs = [jax.block_until_ready(gen(jax.random.PRNGKey(100 * dl + i)))
          for i in range(ks[1] + 3)]

    def mk(k):
        return jax.jit(lambda *ws: sum(
            jnp.sum(decode_packed_pallas(w, cfg, plan).view(jnp.int32))
            for w in ws))
    t = slope(mk, xs, reps=reps, ks=ks)
    del xs
    gbps = m / t / 1e9
    tiles = -(-plan.num_blocks // LANE_TILE)
    stages = tiles * plan.n_packs * plan.bits_per_pack
    ns_stage = t * 1e9 / stages
    log(f"m={m:>10,d} dl={plan.dec_len:>5d}: {t*1e6:8.1f} us = "
        f"{gbps:5.2f} Gb/s  ({plan.num_blocks:>5d} blocks, {tiles:>3d} "
        f"tiles, {ns_stage:5.2f} ns/stage)")
    return {"message_len": m, "dec_len": plan.dec_len,
            "decode_seconds": round(t, 8), "gbps": round(gbps, 3),
            "blocks": plan.num_blocks, "tiles": tiles,
            "ns_per_stage": round(ns_stage, 2)}


def fill_dl(m, lane_tile=128, bpp=32):
    """dec_len that exactly fills one lane tile: ceil(m/lane_tile) rounded
    up to a pack multiple."""
    dl = -(-m // lane_tile)
    return max(64, -(-dl // bpp) * bpp)


def main():
    log(f"device: {jax.devices()[0]}")
    rows = []
    sizes = [100_000, 250_000, 1_000_000, 4_000_000]
    for m in sizes:
        cands = [8192, 4096, 2048, 1024, 512, fill_dl(m)]
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
    rows.append(point(32_000_000, 8192, ks=(1, 4)))
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "bench", "small_msg_sweep.json")
    with open(out, "w") as f:
        json.dump(rows, f, indent=1)
        f.write("\n")
    log(f"wrote {out}")


if __name__ == "__main__":
    main()
