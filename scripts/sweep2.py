"""(lane_tile, dec_len) sweep for the word-mode kernel at 32M bits,
slope-timed (k1/k5)."""

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
    n_words = 2 * (M + 64) // cfg.enc_data_per_pack
    gen = jax.jit(lambda k: jax.random.randint(
        k, (n_words,), -(2 ** 31), 2 ** 31 - 1, dtype=jnp.int32))
    xs = [gen(jax.random.PRNGKey(i)) for i in range(8)]
    np.asarray(sum(jnp.sum(x[:8]) for x in xs))

    for lt, dl in [(128, 2048), (256, 2048), (128, 4096), (256, 4096),
                   (128, 8192), (512, 2048)]:
        plan = plan_blocks(M, 32, dl)

        def mk(k, lt=lt, plan=plan):
            return jax.jit(lambda *ws: sum(
                jnp.sum(core_pallas.decode_packed_pallas(
                    w, cfg, plan, lane_tile=lt).view(jnp.int32))
                for w in ws))
        try:
            t = slope(mk, xs)
            log(f"lt={lt:3d} dec_len={dl:5d}: {t*1e3:6.2f} ms = "
                f"{M/t/1e9:5.2f} Gb/s")
        except Exception as e:
            log(f"lt={lt} dec_len={dl}: FAILED {str(e)[:120]}")


if __name__ == "__main__":
    main()

