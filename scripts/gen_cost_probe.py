"""Break down the in-graph workload generation cost (chain/workload.py)
piece by piece with the slope methodology: cumulative prefixes of the
chain are timed at two sizes and differenced, so the relay floor cancels.

Usage: python scripts/gen_cost_probe.py [n_full] [n_half]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from tpu_viterbi.chain.encode import conv_encode_streams
from tpu_viterbi.chain.quantize import pack_words_2streams, quantize_fields
from tpu_viterbi.chain.source import random_bits
from tpu_viterbi.config import ChannelIn

N_FULL = int(sys.argv[1]) if len(sys.argv) > 1 else 128_000_000
N_HALF = int(sys.argv[2]) if len(sys.argv) > 2 else 64_000_000
SIGMA = 0.0794  # 5.5 dB
SCALE = 32.0


def stage_fns(n):
    """Cumulative chain prefixes, each reduced to one scalar (forces the
    work, fetches 8 bytes)."""

    def red(x):
        return jnp.sum(x.astype(jnp.int32) if x.dtype != jnp.float32
                       else x).astype(jnp.float32)

    def bits_only(key):
        k1, _, _ = jax.random.split(key, 3)
        return red(random_bits(k1, n))

    def plus_encode(key):
        k1, _, _ = jax.random.split(key, 3)
        o0, o1 = conv_encode_streams(random_bits(k1, n))
        return red(o0) + red(o1)

    def plus_noise(key):
        k1, k2, k3 = jax.random.split(key, 3)
        o0, o1 = conv_encode_streams(random_bits(k1, n))
        acc = jnp.float32(0)
        for k, o in ((k2, o0), (k3, o1)):
            sym = o.astype(jnp.float32) * 2.0 - 1.0
            sym = sym + SIGMA * jax.random.normal(k, sym.shape,
                                                  dtype=jnp.float32)
            acc = acc + red(sym)
        return acc

    def plus_quant_pack(key):
        k1, k2, k3 = jax.random.split(key, 3)
        o0, o1 = conv_encode_streams(random_bits(k1, n))
        qs = []
        for k, o in ((k2, o0), (k3, o1)):
            sym = o.astype(jnp.float32) * 2.0 - 1.0
            sym = sym + SIGMA * jax.random.normal(k, sym.shape,
                                                  dtype=jnp.float32)
            q, width = quantize_fields(sym, ChannelIn.SOFT8, SCALE)
            qs.append(q)
        return red(pack_words_2streams(qs[0], qs[1], width))

    return [("bits", bits_only), ("+encode", plus_encode),
            ("+noise", plus_noise), ("+quant+pack", plus_quant_pack)]


def best_time(fn, keys):
    # np.asarray, not block_until_ready: on the axon relay the latter
    # returns before execution completes (measured: 1-4 ms "raw" times at
    # 128M bits, far below the ~25-35 ms dispatch floor); fetching the
    # scalar is the only reliable completion barrier
    import numpy as np
    ts = []
    for k in keys:
        t0 = time.time()
        np.asarray(fn(k))
        ts.append(time.time() - t0)
    return min(ts)


full = {name: jax.jit(f) for name, f in stage_fns(N_FULL)}
half = {name: jax.jit(f) for name, f in stage_fns(N_HALF)}
# compile
for fns in (full, half):
    for f in fns.values():
        jax.block_until_ready(f(jax.random.PRNGKey(999)))

prev = 0.0
for i, name in enumerate(full):
    keys_f = [jax.random.PRNGKey(10 * i + j) for j in range(4)]
    keys_h = [jax.random.PRNGKey(500 + 10 * i + j) for j in range(4)]
    tf = best_time(full[name], keys_f)
    th = best_time(half[name], keys_h)
    slope = 2 * (tf - th)  # cost of the full-size prefix
    print(f"{name:12s} prefix {slope*1e3:7.1f} ms   "
          f"(this piece {1e3*(slope-prev):+7.1f} ms)   "
          f"raw full {tf*1e3:6.1f} / half {th*1e3:6.1f}", flush=True)
    prev = slope
