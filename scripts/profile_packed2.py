"""Slope-timed piece profile of decode_packed_pallas at 32M bits:
  stage   - stage_words_pallas (the production staging; the pallas_call
            cannot be elided by XLA, unlike a bare sum-of-transpose)
  kernel  - _run_kernel from pre-staged words (pallas kernel + assemble)
  full    - decode_packed_pallas (stage + kernel + assemble)
"""

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
from tpu_viterbi.decoder import core_pallas
from tpu_viterbi.decoder.core_pallas import stage_words_pallas
from tpu_viterbi.decoder.core_xla import plan_blocks

T0 = time.time()
M = 32_000_000


def log(s):
    print(f"+{time.time()-T0:6.1f}s {s}", flush=True)



def main():
    cfg = DecoderConfig(channel_in=ChannelIn.SOFT8)
    plan = plan_blocks(M, 32, 2048)
    lt = core_pallas.LANE_TILE
    b_pad = -(-plan.num_blocks // lt) * lt
    n_words = 2 * (M + 64) // cfg.enc_data_per_pack

    gen = jax.jit(lambda k: jax.random.randint(
        k, (n_words,), -(2 ** 31), 2 ** 31 - 1, dtype=jnp.int32))
    xs = [gen(jax.random.PRNGKey(i)) for i in range(8)]
    np.asarray(sum(jnp.sum(x[:8]) for x in xs))

    def mk_stage(k):
        return jax.jit(lambda *ws: sum(
            jnp.sum(stage_words_pallas(w, cfg, plan, b_pad)) for w in ws))

    def mk_full(k):
        return jax.jit(lambda *ws: sum(
            jnp.sum(core_pallas.decode_packed_pallas(w, cfg, plan)
                    .view(jnp.int32)) for w in ws))

    t = slope(mk_stage, xs)
    log(f"stage : {t*1e3:6.2f} ms")
    t = slope(mk_full, xs)
    log(f"full  : {t*1e3:6.2f} ms")

    stage_j = jax.jit(lambda w: stage_words_pallas(w, cfg, plan, b_pad)
                      .reshape(plan.n_packs, -1, b_pad))
    rss = [stage_j(x) for x in xs[:8]]
    np.asarray(sum(jnp.sum(r[0]) for r in rss))

    def mk_kern(k):
        return jax.jit(lambda *rs: sum(
            jnp.sum(core_pallas._run_kernel(r, cfg, plan, lt)
                    .view(jnp.int32)) for r in rs))

    t = slope(mk_kern, rss)
    log(f"kernel: {t*1e3:6.2f} ms")


if __name__ == "__main__":
    main()
