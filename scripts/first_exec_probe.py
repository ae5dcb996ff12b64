"""First-execution (server-compile) cost by piece: on the axon relay the
real Mosaic/XLA server compile happens at first dispatch, not at AOT
.compile() (scripts/compile_time_probe.py measures ~1-5 s there while the
first execution of a fresh 32M-bit program takes minutes). This probe
times first vs second execution of each piece with a fresh dec_len so the
relay's cross-process program cache cannot hide the cost.

Usage: python scripts/first_exec_probe.py [message_len] [dec_len]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from tpu_viterbi.chain import add_awgn, conv_encode, quantize_and_pack
from tpu_viterbi.chain.channel import snr_to_sigma
from tpu_viterbi.chain.source import random_bits
from tpu_viterbi.config import ChannelIn, DecoderConfig
from tpu_viterbi.decoder.core_xla import plan_blocks
from tpu_viterbi.decoder.core_pallas import decode_packed_pallas

N = int(sys.argv[1]) if len(sys.argv) > 1 else 4_000_000
DEC_LEN = int(sys.argv[2]) if len(sys.argv) > 2 else 4096

cfg = DecoderConfig(channel_in=ChannelIn.SOFT8)
plan = plan_blocks(cfg.get_message_len(2 * N), cfg.bits_per_pack, DEC_LEN)


def first_vs_second(label, fn, fresh_arg):
    t0 = time.time()
    jax.block_until_ready(fn(fresh_arg(0)))
    t1 = time.time()
    jax.block_until_ready(fn(fresh_arg(1)))
    t2 = time.time()
    print(f"{label:28s} first {t1-t0:7.1f}s   second {t2-t1:7.3f}s",
          flush=True)


@jax.jit
def chain(key):
    k1, k2 = jax.random.split(key)
    bits = random_bits(k1, N)
    coded = conv_encode(bits)
    noisy = add_awgn(k2, coded, snr_to_sigma(5.5))
    return quantize_and_pack(noisy, ChannelIn.SOFT8, 32.0)


first_vs_second("chain (gen->pack)", chain,
                lambda i: jax.random.PRNGKey(i))

n_words = cfg.get_input_words(2 * N)
rng = np.random.default_rng(0)


def fresh_packed(i):
    return jnp.asarray(rng.integers(-2**31, 2**31, size=(n_words,)),
                       dtype=jnp.int32)


first_vs_second("decode_packed_pallas",
                lambda p: decode_packed_pallas(p, cfg, plan), fresh_packed)

from tpu_viterbi.sharding.mesh import make_block_mesh
from tpu_viterbi.sharding.simulate import build_sharded_simulation

mesh = make_block_mesh(jax.devices()[:1])
fn, _ = build_sharded_simulation(cfg, N, mesh, snr_db=5.5, dec_len=DEC_LEN)
first_vs_second("sharded simulation (1 dev)", fn,
                lambda i: jax.random.PRNGKey(100 + i))
