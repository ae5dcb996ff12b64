"""Decoded-throughput scaling curve over message size on the current chip
(SOFT8 x int32 x b32, dec_len = auto_dec_len: the static-8192 droop below
~8M bits is closed by the lane-tile-fill policy, VERDICT r4 item 3 /
bench/small_msg_sweep.json).  Sub-ms decodes are amplified inside one
dispatch (K decodes in a lax.fori_loop on in-graph-perturbed inputs) so
the relay's ~ms dispatch jitter cancels.  Writes bench/scaling_curve.json.
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
from tpu_viterbi.decoder.core_pallas import (decode_packed_pallas,  # noqa: E402
                                             padded_input_words)
from tpu_viterbi.decoder.core_xla import (auto_dec_len,  # noqa: E402
                                          plan_blocks)
from timing_util import amplified_slope  # noqa: E402

T0 = time.time()


def log(s):
    print(f"+{time.time()-T0:6.1f}s {s}", flush=True)


def point(m, dl=None, reps=3, target_s=0.04):
    cfg = DecoderConfig(channel_in=ChannelIn.SOFT8)
    dl = dl or auto_dec_len(m, 32)
    plan = plan_blocks(m, 32, dl)
    n_words = padded_input_words(cfg, plan)   # zero-copy staging length
    gen = jax.jit(lambda k: jax.random.randint(
        k, (n_words,), -(2 ** 31), 2 ** 31 - 1, dtype=jnp.int32))
    xs = [jax.block_until_ready(gen(jax.random.PRNGKey(17 + i)))
          for i in range(reps + 1)]
    K = max(2, min(2048, int(target_s / (m / 4.5e9)) + 1))

    def mk(k):
        def run(x):
            def body(i, acc):
                out = decode_packed_pallas(x + i, cfg, plan)
                return acc + jnp.sum(out.view(jnp.int32))
            return jax.lax.fori_loop(0, k, body, jnp.int32(0))
        return jax.jit(run)

    t = amplified_slope(mk, xs, K, reps=reps)
    del xs
    if t <= 0:
        # relay jitter ate the differential — flag, never publish garbage
        log(f"m={m:>11,d} dl={plan.dec_len:>5d}: NON-POSITIVE slope "
            f"({t*1e3:.3f} ms), row flagged")
        return {"message_len": m, "dec_len": plan.dec_len,
                "blocks": plan.num_blocks, "slope_nonpositive": True}
    gbps = m / t / 1e9
    log(f"m={m:>11,d} dl={plan.dec_len:>5d}: {t*1e3:8.3f} ms = "
        f"{gbps:5.2f} Gb/s ({plan.num_blocks} blocks)")
    return {"message_len": m, "dec_len": plan.dec_len,
            "decode_seconds": round(t, 8), "gbps": round(gbps, 3),
            "blocks": plan.num_blocks}


def main():
    log(f"device: {jax.devices()[0]}")
    rows = [point(m) for m in (99_968, 249_984, 1_000_000, 4_000_000,
                               16_000_000, 32_000_000, 64_000_000,
                               128_000_000)]
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "bench", "scaling_curve.json")
    with open(out, "w") as f:
        json.dump(rows, f, indent=1)
        f.write('\n')
    log(f"wrote {out}")


if __name__ == "__main__":
    main()
