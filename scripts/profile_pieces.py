"""Profile the decode pipeline piece by piece on the current backend.

NOTE: the axon remote backend appears to memoize identical dispatches, so
every timed call must use *distinct input data*; we pre-stage k input
variants on device and cycle through them.
"""

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
                                          forward_scan, traceback_scan)


def _fetch(out):
    """Force real completion: reduce to a scalar and pull it to host (on the
    axon remote backend block_until_ready does not await execution)."""
    leaves = jax.tree_util.tree_leaves(out)
    return [np.asarray(jnp.sum(x.astype(jnp.int32) if x.dtype == jnp.uint32
                               else x)) for x in leaves]


def timeit_varying(fn, inputs, n=None):
    """min time over calls, cycling distinct pre-staged inputs."""
    n = n or len(inputs)
    _fetch(fn(inputs[0]))  # compile
    ts = []
    for i in range(n):
        x = inputs[(i + 1) % len(inputs)]
        t0 = time.perf_counter()
        _fetch(fn(x))
        ts.append(time.perf_counter() - t0)
    return min(ts), ts


def main():
    print("backend:", jax.default_backend(), jax.devices())
    m = int(sys.argv[1]) if len(sys.argv) > 1 else 4_000_000
    cfg = DecoderConfig(channel_in=ChannelIn.SOFT8)
    plan = plan_blocks(m, 32, 2048)
    s = m + 64
    rng = np.random.default_rng(0)
    rs = [jax.device_put(jnp.asarray(
        rng.integers(-100, 101, size=(s, 2)), dtype=jnp.int32))
        for _ in range(4)]
    jax.block_until_ready(rs)

    fwd_in = [gather_blocks(r, plan) for r in rs]
    jax.block_until_ready(fwd_in)
    t, ts = timeit_varying(functools.partial(forward_scan, cfg=cfg,
                                             plan=plan), fwd_in)
    print(f"forward_scan:  {t*1e3:8.2f} ms  (XLA) all={[f'{x*1e3:.1f}' for x in ts]}")

    surv = [forward_scan(x, cfg, plan) for x in fwd_in]
    jax.block_until_ready(surv)
    t, ts = timeit_varying(functools.partial(traceback_scan, cfg=cfg,
                                             plan=plan), surv)
    print(f"traceback:     {t*1e3:8.2f} ms  (XLA) all={[f'{x*1e3:.1f}' for x in ts]}")

    t, ts = timeit_varying(functools.partial(core_pallas.decode_blocks_pallas,
                                             cfg=cfg, plan=plan), rs)
    print(f"pallas full:   {t*1e3:8.2f} ms  all={[f'{x*1e3:.1f}' for x in ts]}")
    gbps = m / t / 1e9
    print(f"pallas throughput: {gbps:.2f} Gb/s")


if __name__ == "__main__":
    main()
