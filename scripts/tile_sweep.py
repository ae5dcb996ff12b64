"""Sweep (lane_tile, dec_len) for the fused kernel at 32M bits with the
honest single-fetch methodology (floor-subtracted minima, distinct inputs)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from tpu_viterbi.config import ChannelIn, DecoderConfig
from tpu_viterbi.decoder import core_pallas
from tpu_viterbi.decoder.core_xla import plan_blocks, stage_layout_packed

T0 = time.time()
M = 32_000_000


def log(s):
    print(f"+{time.time()-T0:6.1f}s {s}", flush=True)


def run_config(cfg, xs, lt, dec_len):
    plan = plan_blocks(M, 32, dec_len)
    b_pad = -(-plan.num_blocks // lt) * lt
    stage = jax.jit(lambda x: stage_layout_packed(x, cfg, plan, b_pad))
    kern = jax.jit(lambda rs: jnp.sum(
        core_pallas._run_kernel(rs, cfg, plan, lt).view(jnp.int32)))
    nul = jax.jit(lambda rs: jnp.sum(rs[0, 0, 0]))
    try:
        rss = [stage(x) for x in xs]
        np.asarray(sum(jnp.sum(r[0, 0]) for r in rss))
        np.asarray(nul(rss[0]))
        floors = []
        for r in rss:
            t0 = time.perf_counter()
            np.asarray(nul(r))
            floors.append(time.perf_counter() - t0)
        floor = min(floors)
        np.asarray(kern(rss[0]))  # compile
        ts = []
        for r in rss[1:]:
            t0 = time.perf_counter()
            np.asarray(kern(r))
            ts.append(time.perf_counter() - t0)
        t = min(ts) - floor
        log(f"lt={lt:3d} dec_len={dec_len:5d}: raw="
            f"{[f'{x*1e3:.0f}' for x in ts]}ms floor={floor*1e3:.0f}ms "
            f"-> {t*1e3:.1f}ms = {M/t/1e9:.2f} Gb/s")
    except Exception as e:
        log(f"lt={lt} dec_len={dec_len}: FAILED {type(e).__name__}: "
            f"{str(e)[:160]}")


def main():
    cfg = DecoderConfig(channel_in=ChannelIn.SOFT8)
    n_words = 2 * (M + 64) // cfg.enc_data_per_pack
    gen = jax.jit(lambda k: jax.random.randint(
        k, (n_words,), -(2 ** 20), 2 ** 20, dtype=jnp.int32))
    xs = [gen(jax.random.PRNGKey(i)) for i in range(4)]
    np.asarray(sum(jnp.sum(x[:8]) for x in xs))
    log("inputs staged")
    for lt, dl in [(256, 2048), (512, 2048), (128, 4096), (256, 4096)]:
        run_config(cfg, xs, lt, dl)


if __name__ == "__main__":
    main()
