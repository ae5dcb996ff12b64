"""Isolate the Mosaic/server compile cost of the fused decode kernel as a
function of dec_len (n_packs), with relay-cache discipline:

  - every timed executable uses a FRESH (message_len, dec_len) pair so the
    relay's cross-process program cache cannot serve it;
  - first-execution timing fetches a scalar derived from the output
    (np.asarray on a sum), so asynchronous dispatch cannot fake completion;
  - AOT .lower()/.compile() is timed separately from first dispatch to see
    where the server does the real work.

Usage: python scripts/mosaic_compile_sweep.py [salt]
(salt shifts every message_len so reruns stay cache-cold)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from tpu_viterbi.config import ChannelIn, DecoderConfig
from tpu_viterbi.decoder.core_xla import plan_blocks
from tpu_viterbi.decoder.core_pallas import decode_packed_pallas

SALT = int(sys.argv[1]) if len(sys.argv) > 1 else 0

cfg = DecoderConfig(channel_in=ChannelIn.SOFT8)
rng = np.random.default_rng(7)

for dec_len in (8192, 6144, 4096, 2048):
    # fresh message_len per run: vary block count with the salt
    n_blocks = 130 + SALT
    m = dec_len * n_blocks
    plan = plan_blocks(m, cfg.bits_per_pack, dec_len)
    n_words = cfg.get_input_words(2 * (m + 64))

    def fresh():
        return jnp.asarray(rng.integers(-2**31, 2**31, size=(n_words,)),
                           dtype=jnp.int32)

    f = jax.jit(lambda p: jnp.sum(
        decode_packed_pallas(p, cfg, plan).view(jnp.int32)))
    x = fresh()
    t0 = time.time()
    lowered = f.lower(x)
    t1 = time.time()
    compiled = lowered.compile()
    t2 = time.time()
    s = int(np.asarray(compiled(x)))
    t3 = time.time()
    s2 = int(np.asarray(compiled(fresh())))
    t4 = time.time()
    print(f"dec_len {dec_len:5d}  n_packs {plan.n_packs:4d}  "
          f"lower {t1-t0:5.1f}s  compile {t2-t1:6.1f}s  "
          f"first-exec {t3-t2:6.1f}s  second-exec {t4-t3:6.2f}s",
          flush=True)
