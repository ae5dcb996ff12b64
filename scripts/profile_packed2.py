"""Slope-timed piece profile of decode_packed_pallas at 32M bits:
  stage   - stage_words transpose only
  kernel  - _run_kernel from pre-staged words (pallas kernel + assemble)
  full    - decode_packed_pallas (stage + kernel + assemble)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from tpu_viterbi.config import ChannelIn, DecoderConfig
from tpu_viterbi.decoder import core_pallas
from tpu_viterbi.decoder.core_xla import plan_blocks, stage_words

T0 = time.time()
M = 32_000_000


def log(s):
    print(f"+{time.time()-T0:6.1f}s {s}", flush=True)


def slope(make_k, xs, reps=4, ks=(1, 5)):
    """make_k(k) -> jitted fn of k inputs; returns per-item seconds."""
    f1, f5 = make_k(ks[0]), make_k(ks[1])
    np.asarray(f1(*xs[:ks[0]]))
    np.asarray(f5(*xs[:ks[1]]))
    t1s, t5s = [], []
    n = len(xs)
    for j in range(reps):
        t0 = time.perf_counter()
        np.asarray(f1(*(xs[(j + 1 + i) % n] for i in range(ks[0]))))
        t1s.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        np.asarray(f5(*(xs[(j + 2 + i) % n] for i in range(ks[1]))))
        t5s.append(time.perf_counter() - t0)
    return (min(t5s) - min(t1s)) / (ks[1] - ks[0])


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
            jnp.sum(stage_words(w, cfg, plan, b_pad)) for w in ws))

    def mk_full(k):
        return jax.jit(lambda *ws: sum(
            jnp.sum(core_pallas.decode_packed_pallas(w, cfg, plan)
                    .view(jnp.int32)) for w in ws))

    t = slope(mk_stage, xs)
    log(f"stage : {t*1e3:6.2f} ms")
    t = slope(mk_full, xs)
    log(f"full  : {t*1e3:6.2f} ms")

    stage_j = jax.jit(lambda w: stage_words(w, cfg, plan, b_pad)
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
