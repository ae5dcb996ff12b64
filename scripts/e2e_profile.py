"""Slope profile of the single-chip in-graph simulation chain
(sharding/simulate.py structure): cumulative prefixes timed at two sizes,
differenced to cancel the relay floor.  Localizes where the e2e budget
goes beyond generation + decode.

Usage: python scripts/e2e_profile.py [n_full] [n_half] [dec_len]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from tpu_viterbi.chain.workload import packed_workload
from tpu_viterbi.config import ChannelIn, DecoderConfig
from tpu_viterbi.decoder.core_pallas import decode_packed_pallas
from tpu_viterbi.decoder.core_xla import plan_blocks
from tpu_viterbi.sharding.simulate import _ref_words32

N_FULL = int(sys.argv[1]) if len(sys.argv) > 1 else 128_000_000
N_HALF = int(sys.argv[2]) if len(sys.argv) > 2 else 64_000_000
DEC_LEN = int(sys.argv[3]) if len(sys.argv) > 3 else 2048
SNR = 5.5
cfg = DecoderConfig(channel_in=ChannelIn.SOFT8)


def stage_fns(n):
    m = cfg.get_message_len(2 * n)
    plan = plan_blocks(m, cfg.bits_per_pack, DEC_LEN)

    def red(x):
        return jnp.sum(x.view(jnp.int32) if x.dtype in
                       (jnp.uint32, jnp.uint16) else x.astype(jnp.int32))

    def gen(key):
        bits, packed = packed_workload(key, n, cfg.channel_in, SNR, 32.0)
        return red(bits) + red(packed)

    def gen_ref(key):
        bits, packed = packed_workload(key, n, cfg.channel_in, SNR, 32.0)
        return red(_ref_words32(bits, cfg, m)) + red(packed)

    def gen_decode(key):
        bits, packed = packed_workload(key, n, cfg.channel_in, SNR, 32.0)
        out = decode_packed_pallas(packed, cfg, plan)
        return red(bits) + red(out)

    def full(key):
        bits, packed = packed_workload(key, n, cfg.channel_in, SNR, 32.0)
        out = decode_packed_pallas(packed, cfg, plan)
        valid = out[: m // cfg.bits_per_pack].astype(jnp.uint32)
        ref = _ref_words32(bits, cfg, m)
        return jnp.sum(jax.lax.population_count(valid ^ ref)
                       .astype(jnp.int32))

    from tpu_viterbi.chain.genkernel import (packed_workload_pallas,
                                             ref_words_from_packs)

    def pgen(key):
        bp, packed = packed_workload_pallas(key, n, cfg.channel_in, SNR,
                                            32.0)
        return red(bp) + red(packed)

    def pgen_ref(key):
        bp, packed = packed_workload_pallas(key, n, cfg.channel_in, SNR,
                                            32.0)
        return red(ref_words_from_packs(bp, cfg.extra_l, m)) + red(packed)

    def pgen_decode(key):
        bp, packed = packed_workload_pallas(key, n, cfg.channel_in, SNR,
                                            32.0)
        out = decode_packed_pallas(packed, cfg, plan)
        return red(bp) + red(out)

    def pfull(key):
        bp, packed = packed_workload_pallas(key, n, cfg.channel_in, SNR,
                                            32.0)
        out = decode_packed_pallas(packed, cfg, plan)
        valid = out[: m // cfg.bits_per_pack].astype(jnp.uint32)
        ref = ref_words_from_packs(bp, cfg.extra_l, m)
        return jnp.sum(jax.lax.population_count(valid ^ ref)
                       .astype(jnp.int32))

    return [("gen", gen), ("gen+ref", gen_ref),
            ("gen+decode", gen_decode), ("full+BER", full),
            ("pallas gen", pgen), ("pallas gen+ref", pgen_ref),
            ("pallas gen+dec", pgen_decode), ("pallas full", pfull)]


def best_time(fn, keys):
    ts = []
    for k in keys:
        t0 = time.perf_counter()
        np.asarray(fn(k))
        ts.append(time.perf_counter() - t0)
    return min(ts)


full_fns = {name: jax.jit(f) for name, f in stage_fns(N_FULL)}
half_fns = {name: jax.jit(f) for name, f in stage_fns(N_HALF)}
for fns in (full_fns, half_fns):
    for f in fns.values():
        np.asarray(f(jax.random.PRNGKey(999)))

ratio = N_FULL / (N_FULL - N_HALF)
prev = 0.0
for i, name in enumerate(full_fns):
    if name == "pallas gen":
        prev = 0.0          # new cumulative-prefix chain starts here
    keys_f = [jax.random.PRNGKey(7000 + 10 * i + j) for j in range(4)]
    keys_h = [jax.random.PRNGKey(7500 + 10 * i + j) for j in range(4)]
    tf = best_time(full_fns[name], keys_f)
    th = best_time(half_fns[name], keys_h)
    slope = ratio * (tf - th)
    print(f"{name:11s} prefix {slope*1e3:7.1f} ms   "
          f"(this piece {1e3*(slope-prev):+7.1f} ms)   "
          f"raw full {tf*1e3:6.1f} / half {th*1e3:6.1f}", flush=True)
    prev = slope
