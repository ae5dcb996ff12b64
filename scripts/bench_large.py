"""Large-message timing: at 32M+ bits compute dwarfs the ~33ms relay floor.
One fused dispatch per call (decode + scalar reduce), distinct inputs."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import functools
import numpy as np
import jax
import jax.numpy as jnp

from tpu_viterbi.config import ChannelIn, DecoderConfig
from tpu_viterbi.decoder import core_pallas
from tpu_viterbi.decoder.core_xla import (plan_blocks, gather_blocks,
                                          decode_blocks)


def bench(fn, xs, label, m):
    g = jax.jit(lambda x: jnp.sum(fn(x).view(jnp.int32)))
    np.asarray(g(xs[0]))  # compile
    ts = []
    for i in range(len(xs)):
        x = xs[(i + 1) % len(xs)]
        t0 = time.perf_counter()
        np.asarray(g(x))
        ts.append(time.perf_counter() - t0)
    t = min(ts)
    print(f"{label}: {t*1e3:8.1f} ms -> {m/t/1e9:6.2f} Gb/s   "
          f"all={[f'{x*1e3:.0f}' for x in ts]}")
    return t


def main():
    m = int(sys.argv[1]) if len(sys.argv) > 1 else 32_000_000
    dec_len = int(sys.argv[2]) if len(sys.argv) > 2 else 2048
    which = sys.argv[3] if len(sys.argv) > 3 else "both"
    cfg = DecoderConfig(channel_in=ChannelIn.SOFT8)
    plan = plan_blocks(m, 32, dec_len)
    print(f"m={m} dec_len={dec_len} blocks={plan.num_blocks}")
    # generate inputs on-device: uploading 100s of MB through the axon relay
    # takes minutes and would dominate the run
    gen = jax.jit(lambda k: jax.random.randint(
        k, (m + 64, 2), -100, 101, dtype=jnp.int32))
    xs = [gen(jax.random.PRNGKey(i)) for i in range(2)]
    jax.block_until_ready(xs)
    print("inputs staged", flush=True)

    if which in ("both", "pallas"):
        bench(functools.partial(core_pallas.decode_blocks_pallas,
                                cfg=cfg, plan=plan), xs, "pallas", m)
    if which in ("both", "xla"):
        bench(lambda x: decode_blocks(gather_blocks(x, plan), cfg, plan),
              xs, "xla   ", m)


if __name__ == "__main__":
    main()
