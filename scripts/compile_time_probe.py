"""Where does first-call compile time go? AOT lower/compile timings for the
three pieces of the in-graph simulation at a given message size:
  1. the workload chain (bits -> encode -> AWGN -> quantize/pack)
  2. the fused Pallas decode (decode_packed_pallas)
  3. the full sharded simulation (build_sharded_simulation, 1-device mesh)

Usage: python scripts/compile_time_probe.py [message_len] [dec_len]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from tpu_viterbi.chain import add_awgn, conv_encode, quantize_and_pack
from tpu_viterbi.chain.channel import snr_to_sigma
from tpu_viterbi.chain.source import random_bits
from tpu_viterbi.config import ChannelIn, DecoderConfig
from tpu_viterbi.decoder.core_xla import plan_blocks
from tpu_viterbi.decoder.core_pallas import decode_packed_pallas

N = int(sys.argv[1]) if len(sys.argv) > 1 else 4_000_000
DEC_LEN = int(sys.argv[2]) if len(sys.argv) > 2 else 8192


def timed(label, fn, *args):
    t0 = time.time()
    lowered = jax.jit(fn).lower(*args)
    t1 = time.time()
    lowered.compile()
    t2 = time.time()
    print(f"{label:30s} lower {t1-t0:6.1f}s   compile {t2-t1:6.1f}s",
          flush=True)


cfg = DecoderConfig(channel_in=ChannelIn.SOFT8)
plan = plan_blocks(cfg.get_message_len(2 * N), cfg.bits_per_pack, DEC_LEN)


def chain(key):
    k1, k2 = jax.random.split(key)
    bits = random_bits(k1, N)
    coded = conv_encode(bits)
    noisy = add_awgn(k2, coded, snr_to_sigma(5.5))
    return quantize_and_pack(noisy, ChannelIn.SOFT8, 32.0)


key = jax.random.PRNGKey(0)
timed("chain (gen->pack)", chain, key)

packed = jnp.zeros((cfg.get_input_words(2 * N),), jnp.int32)
timed("decode_packed_pallas", lambda p: decode_packed_pallas(p, cfg, plan),
      packed)

from tpu_viterbi.sharding.mesh import make_block_mesh
from tpu_viterbi.sharding.simulate import build_sharded_simulation

mesh = make_block_mesh(jax.devices()[:1])
t0 = time.time()
fn, m = build_sharded_simulation(cfg, N, mesh, snr_db=5.5, dec_len=DEC_LEN)
lowered = fn.lower(key)
t1 = time.time()
lowered.compile()
t2 = time.time()
print(f"{'sharded simulation (1 dev)':30s} lower {t1-t0:6.1f}s   "
      f"compile {t2-t1:6.1f}s", flush=True)
