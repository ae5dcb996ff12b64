"""A/B slope timing at 32M bits: decode_packed_pallas fused staging
(block-major words into the kernel, transpose in VMEM) vs the separate
stage_words_pallas pass.  Same process, same inputs, slope methodology."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from timing_util import slope  # noqa: E402

import numpy as np
import jax
import jax.numpy as jnp

from tpu_viterbi.config import ChannelIn, DecoderConfig
from tpu_viterbi.decoder import core_pallas
from tpu_viterbi.decoder.core_xla import plan_blocks

T0 = time.time()
M = 32_000_000


def log(s):
    print(f"+{time.time()-T0:6.1f}s {s}", flush=True)


def main():
    cfg = DecoderConfig(channel_in=ChannelIn.SOFT8)
    plan = plan_blocks(M, 32, 2048)
    n_words = 2 * (M + 64) // cfg.enc_data_per_pack

    gen = jax.jit(lambda k: jax.random.randint(
        k, (n_words,), -(2 ** 31), 2 ** 31 - 1, dtype=jnp.int32))
    xs = [gen(jax.random.PRNGKey(i)) for i in range(8)]
    np.asarray(sum(jnp.sum(x[:8]) for x in xs))

    def mk(fused):
        def mk_k(k):
            return jax.jit(lambda *ws: sum(
                jnp.sum(core_pallas.decode_packed_pallas(
                    w, cfg, plan, fused=fused).view(jnp.int32))
                for w in ws))
        return mk_k

    for name, fused in (("unfused", False), ("fused", True),
                        ("unfused2", False), ("fused2", True)):
        t = slope(mk(fused), xs)
        log(f"{name:9s}: {t*1e3:6.2f} ms  ({M/t/1e9:.2f} Gb/s)")


if __name__ == "__main__":
    main()
