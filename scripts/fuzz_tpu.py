"""On-hardware randomized fuzz: decode_packed_pallas vs decode_packed_xla
on the real chip over random valid configs, message lengths, and block
lengths with full-range random words.  The CPU suite fuzzes the XLA core
against the golden oracle (tests/test_fuzz.py); this closes the loop by
fuzzing the Pallas kernel against that XLA core where both actually run.

Usage: python scripts/fuzz_tpu.py [n_trials] [seed0]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax.numpy as jnp

from tpu_viterbi.config import ALL_VALID_CONFIGS, ChannelIn, CompMode
from tpu_viterbi.decoder.core_pallas import decode_packed_pallas
from tpu_viterbi.decoder.core_xla import decode_packed_xla, plan_blocks

T0 = time.time()


def trial(i, seed):
    rng = np.random.default_rng(seed)
    cfgs = [c for c in ALL_VALID_CONFIGS if c.comp_mode == CompMode.REG]
    cfg = cfgs[rng.integers(len(cfgs))]
    bpp = cfg.bits_per_pack
    message_len = int(rng.integers(4, 200)) * bpp
    dec_len = int(rng.integers(1, 12)) * bpp
    plan = plan_blocks(message_len, bpp, dec_len)
    n_vals = 2 * (message_len + 64)
    if cfg.channel_in == ChannelIn.FP32:
        words = jnp.asarray(rng.integers(-8, 8, size=(n_vals,))
                            .astype(np.float32))
    else:
        dpp = cfg.enc_data_per_pack
        words = jnp.asarray(rng.integers(-2 ** 31, 2 ** 31,
                                         size=(n_vals // dpp,))
                            .astype(np.int32))
    a = np.asarray(decode_packed_xla(words, cfg, plan))
    b = np.asarray(decode_packed_pallas(words, cfg, plan))
    ok = np.array_equal(a, b)
    print(f"+{time.time()-T0:6.1f}s trial {i:3d}: "
          f"{cfg.channel_in.name:6s}/{cfg.metric.name:6s}/"
          f"{cfg.decode_out.name} m={message_len:5d} dec_len={dec_len:4d} "
          f"blocks={plan.num_blocks:3d} -> {'OK' if ok else 'MISMATCH'}",
          flush=True)
    return ok


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 24
    seed0 = int(sys.argv[2]) if len(sys.argv) > 2 else 5000
    bad = sum(not trial(i, seed0 + i) for i in range(n))
    print(f"{n - bad}/{n} trials OK")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
