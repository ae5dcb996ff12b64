"""Split timing at 32M: staging (layout transform) vs pallas kernel vs
assembly, each as its own dispatch (times include ~33ms relay floor)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import functools
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpu_viterbi.config import ChannelIn, DecoderConfig, NUM_STATES
from tpu_viterbi.decoder import core_pallas as cp
from tpu_viterbi.decoder.core_xla import plan_blocks


def t_of(g, xs, n=3):
    np.asarray(g(xs[0]))
    ts = []
    for i in range(n):
        t0 = time.perf_counter()
        np.asarray(g(xs[(i + 1) % len(xs)]))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    m = int(sys.argv[1]) if len(sys.argv) > 1 else 32_000_000
    dec_len = int(sys.argv[2]) if len(sys.argv) > 2 else 2048
    cfg = DecoderConfig(channel_in=ChannelIn.SOFT8)
    plan = plan_blocks(m, 32, dec_len)
    b = plan.num_blocks
    b_pad = -(-b // cp.LANE_TILE) * cp.LANE_TILE
    print(f"m={m} dec_len={dec_len} blocks={b} tiles={b_pad//cp.LANE_TILE}",
          flush=True)

    gen = jax.jit(lambda k: jax.random.randint(
        k, (m + 64, 2), -100, 101, dtype=jnp.int32))
    rs_in = [gen(jax.random.PRNGKey(i)) for i in range(2)]
    jax.block_until_ready(rs_in)

    stage = jax.jit(lambda r: cp._stage_layout(r, plan, b_pad))
    g = jax.jit(lambda r: jnp.sum(stage(r)))
    t = t_of(g, rs_in)
    print(f"staging:  {t*1e3:7.1f} ms raw", flush=True)

    staged = [stage(r) for r in rs_in]
    jax.block_until_ready(staged)

    n_conv = -(-(cfg.extra_r - 32) // 32)
    n_emit = plan.dec_len // 32
    kernel = functools.partial(cp._viterbi_kernel, n_packs=plan.n_packs,
                               bpp=32, n_conv=n_conv, n_emit=n_emit,
                               is_float=False)
    call = pl.pallas_call(
        kernel,
        grid=(b_pad // cp.LANE_TILE,),
        in_specs=[pl.BlockSpec((plan.n_packs, 32, 2, cp.LANE_TILE),
                               lambda i: (0, 0, 0, i),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((n_emit, cp.LANE_TILE), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_emit, b_pad), jnp.int32),
        scratch_shapes=[pltpu.VMEM((plan.n_packs, NUM_STATES, cp.LANE_TILE),
                                   jnp.int32)],
    )
    g = jax.jit(lambda x: jnp.sum(call(x)))
    t = t_of(g, staged)
    print(f"kernel:   {t*1e3:7.1f} ms raw -> {m/max(t-0.033,1e-9)/1e9:6.2f} "
          f"Gb/s floor-corrected", flush=True)

    g = jax.jit(lambda r: jnp.sum(
        cp.decode_blocks_pallas(r, cfg, plan).view(jnp.int32)))
    t = t_of(g, rs_in)
    print(f"full:     {t*1e3:7.1f} ms raw -> {m/max(t-0.033,1e-9)/1e9:6.2f} "
          f"Gb/s floor-corrected", flush=True)


if __name__ == "__main__":
    main()
