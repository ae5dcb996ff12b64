"""Minimal Pallas kernel compile probe: one tiny config, prints timings."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax.numpy as jnp

from tpu_viterbi.config import ChannelIn, DecoderConfig
from tpu_viterbi.decoder.core_xla import plan_blocks
from tpu_viterbi.decoder.core_pallas import decode_blocks_pallas

t0 = time.time()
cfg = DecoderConfig(channel_in=ChannelIn.SOFT8)
dec_len, b = 96, 4
m = dec_len * b
plan = plan_blocks(m, cfg.bits_per_pack, dec_len)
rng = np.random.default_rng(7)
r = jnp.asarray(rng.integers(-100, 101, size=(m + 64, 2)), dtype=jnp.int32)
print(f"+{time.time()-t0:.1f}s tracing/compiling", flush=True)
out = np.asarray(decode_blocks_pallas(r, cfg, plan))
print(f"+{time.time()-t0:.1f}s done, out[0]={out[0]:#x}", flush=True)
