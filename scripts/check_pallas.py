"""Quick on-device check: Pallas kernel vs golden oracle on random input."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax.numpy as jnp

from tpu_viterbi.config import ChannelIn, DecoderConfig
from tpu_viterbi.decoder.core_xla import plan_blocks
from tpu_viterbi.decoder.core_pallas import decode_blocks_pallas
from tpu_viterbi.decoder.golden import golden_decode_block
from tpu_viterbi.utils.bits import unpack_msb_first


def check(cfg, dec_len, b, extra_m=0):
    rng = np.random.default_rng(7)
    m = dec_len * b + extra_m
    plan = plan_blocks(m, cfg.bits_per_pack, dec_len)
    s = m + 64
    r = rng.integers(-100, 101, size=(s, 2)).astype(np.int32)
    out = np.asarray(decode_blocks_pallas(jnp.asarray(r), cfg, plan))
    bits = unpack_msb_first(out, cfg.bits_per_pack)
    need = (plan.num_blocks - 1) * dec_len + plan.block_len
    rp = r if len(r) >= need else np.concatenate(
        [r, np.zeros((need - len(r), 2), r.dtype)])
    for k, off in enumerate(plan.offsets()):
        want = golden_decode_block(rp[off:off + dec_len + 64]
                                   .astype(np.int64), dec_len)
        got = bits[off: off + dec_len]
        # natural framing: block k owns [off, min(off+dec_len, m))
        lo = 0
        n = min(len(want), m - off)
        if not np.array_equal(got[lo:n], want[lo:n]):
            bad = np.nonzero(got[lo:n] != want[lo:n])[0]
            print(f"  MISMATCH block {k} off={off} nbad={len(bad)} "
                  f"first={bad[:8]}")
            return False
    print(f"  OK {cfg.decode_out.name} dec_len={dec_len} blocks="
          f"{plan.num_blocks} overlap={plan.overlap_bits}")
    return True


def main():
    from tpu_viterbi.config import DecodeOut
    ok = True
    ok &= check(DecoderConfig(channel_in=ChannelIn.SOFT8), 96, 130)
    ok &= check(DecoderConfig(channel_in=ChannelIn.SOFT8,
                              decode_out=DecodeOut.O_B16), 96, 5)
    ok &= check(DecoderConfig(channel_in=ChannelIn.SOFT8), 128, 3,
                extra_m=64)   # overlapped last block
    ok &= check(DecoderConfig(channel_in=ChannelIn.SOFT8), 32, 40)
                # dec_len < 64: halo spans multiple following blocks
    print("PALLAS matches golden on all blocks" if ok else "FAILURES")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
