"""Break down the packed-path decode at full scale on the TPU:
  stage   - _stage_layout_packed only
  kernel  - _run_kernel on pre-staged rs (incl. assemble_output)
  full    - decode_packed_pallas
Distinct inputs per call; scalar-fetch to force real execution.
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
from tpu_viterbi.decoder.core_xla import plan_blocks


def timeit(fn, inputs, label, m):
    g = jax.jit(fn)
    np.asarray(g(inputs[0]))  # compile
    ts = []
    for i in range(4):
        t0 = time.perf_counter()
        np.asarray(g(inputs[(i + 1) % len(inputs)]))
        ts.append(time.perf_counter() - t0)
    t = min(ts)
    print(f"{label:8s}: {t*1e3:8.1f} ms  ({m/t/1e9:5.2f} Gb/s)  "
          f"all={[f'{x*1e3:.0f}' for x in ts]}", flush=True)
    return t


def main():
    m = int(sys.argv[1]) if len(sys.argv) > 1 else 32_000_000
    cfg = DecoderConfig(channel_in=ChannelIn.SOFT8)
    plan = plan_blocks(m, 32, 2048)
    lt = core_pallas.LANE_TILE
    b_pad = -(-plan.num_blocks // lt) * lt
    n_words = 2 * (m + 64) // cfg.enc_data_per_pack
    print(f"m={m} blocks={plan.num_blocks} b_pad={b_pad} words={n_words}")

    gen = jax.jit(lambda k: jax.random.randint(
        k, (n_words,), -2**31, 2**31 - 1, dtype=jnp.int32))
    xs = [gen(jax.random.PRNGKey(i)) for i in range(2)]
    np.asarray(jnp.sum(xs[0][:4]) + jnp.sum(xs[1][:4]))
    print("inputs staged", flush=True)

    timeit(lambda x: jnp.sum(
        core_pallas._stage_layout_packed(x, cfg, plan, b_pad)
        .view(jnp.int32)[:, 0]), xs, "stage", m)

    stage_fn = jax.jit(
        lambda x: core_pallas._stage_layout_packed(x, cfg, plan, b_pad))
    rss = [stage_fn(x) for x in xs]
    np.asarray(jnp.sum(rss[0][0, 0]) + jnp.sum(rss[1][0, 0]))
    timeit(lambda rs: jnp.sum(
        core_pallas._run_kernel(rs, cfg, plan, lt).view(jnp.int32)),
        rss, "kernel", m)

    timeit(lambda x: jnp.sum(
        core_pallas.decode_packed_pallas(x, cfg, plan).view(jnp.int32)),
        xs, "full", m)


if __name__ == "__main__":
    main()
