"""Decoded-throughput scaling curve over message size on the current chip
(slope-timed full decodes, SOFT8 x int32 x b32, dec_len 8192).  Writes
bench/scaling_curve.json."""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from timing_util import slope  # noqa: E402

import numpy as np
import jax
import jax.numpy as jnp

from tpu_viterbi.config import ChannelIn, DecoderConfig
from tpu_viterbi.decoder.core_pallas import decode_packed_pallas
from tpu_viterbi.decoder.core_xla import plan_blocks

T0 = time.time()


def log(s):
    print(f"+{time.time()-T0:6.1f}s {s}", flush=True)


def point(m):
    cfg = DecoderConfig(channel_in=ChannelIn.SOFT8)
    plan = plan_blocks(m, 32, 8192)
    n_words = 2 * (m + 64) // cfg.enc_data_per_pack
    gen = jax.jit(lambda k: jax.random.randint(
        k, (n_words,), -(2 ** 31), 2 ** 31 - 1, dtype=jnp.int32))
    n_xs = 8 if m <= 32_000_000 else 4
    ks = (1, 5) if m <= 32_000_000 else (1, 2)
    xs = [gen(jax.random.PRNGKey(i)) for i in range(n_xs)]
    np.asarray(sum(jnp.sum(x[:4]) for x in xs))

    def mk(k):
        return jax.jit(lambda *ws: sum(
            jnp.sum(decode_packed_pallas(w, cfg, plan).view(jnp.int32))
            for w in ws))
    t = slope(mk, xs, reps=3, ks=ks)
    del xs
    gbps = m / t / 1e9
    log(f"m={m:>11,d}: {t*1e3:7.2f} ms = {gbps:5.2f} Gb/s "
        f"({plan.num_blocks} blocks)")
    return {"message_len": m, "decode_seconds": round(t, 6),
            "gbps": round(gbps, 3), "blocks": plan.num_blocks}


def main():
    rows = [point(m) for m in (1_000_000, 4_000_000, 16_000_000,
                               32_000_000, 64_000_000, 128_000_000)]
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "bench", "scaling_curve.json")
    with open(out, "w") as f:
        json.dump(rows, f, indent=1)
        f.write('\n')
    log(f"wrote {out}")


if __name__ == "__main__":
    main()
