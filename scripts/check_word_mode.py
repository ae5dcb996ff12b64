"""TPU qualification for the kernel's word-mode input path: for every
integer channel format x pack width, decoding straight from packed channel
words (decode_packed_pallas, in-kernel unpack) must be bit-identical to
decoding the same soft values through the value-mode staging
(decode_blocks_pallas, golden-checked by check_pallas.py).  FP32 checks the
clamped value staging path with in-range values."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax.numpy as jnp

from tpu_viterbi.chain.quantize import quantize_and_pack, unpack_to_soft
from tpu_viterbi.config import ChannelIn, DecodeOut, DecoderConfig
from tpu_viterbi.decoder.core_pallas import (decode_blocks_pallas,
                                             decode_packed_pallas)
from tpu_viterbi.decoder.core_xla import plan_blocks

T0 = time.time()


def check(channel, decode_out, dec_len=96, b=130, extra_m=0):
    cfg = DecoderConfig(channel_in=channel, decode_out=decode_out)
    m = dec_len * b + extra_m
    plan = plan_blocks(m, cfg.bits_per_pack, dec_len)
    n_vals = 2 * (m + 64)
    rng = np.random.default_rng(11)

    if channel == ChannelIn.FP32:
        # stay inside the +-2^(FP_PRECISION-1) clamp so the packed path's
        # clamp (viterbiBM.cuh:139-151) is a no-op and both paths see the
        # same values
        vals = rng.integers(-7, 8, size=(n_vals,)).astype(np.float32)
        words = quantize_and_pack(jnp.asarray(vals), channel, 1.0)
        r = jnp.asarray(vals.reshape(-1, 2))
    else:
        dpp = cfg.enc_data_per_pack
        words = jnp.asarray(rng.integers(-2 ** 31, 2 ** 31,
                                         size=(n_vals // dpp,))
                            .astype(np.int32))
        r = unpack_to_soft(words, channel)[:n_vals].reshape(-1, 2)

    out_v = np.asarray(decode_blocks_pallas(r, cfg, plan))
    out_w = np.asarray(decode_packed_pallas(words, cfg, plan))
    ok = np.array_equal(out_v, out_w)
    print(f"+{time.time()-T0:6.1f}s {channel.name:6s} x {decode_out.name}: "
          f"{'OK' if ok else 'MISMATCH'} ({plan.num_blocks} blocks, "
          f"m={m})", flush=True)
    return ok


def main():
    ok = True
    for ch in (ChannelIn.HARD, ChannelIn.SOFT4, ChannelIn.SOFT8,
               ChannelIn.SOFT16, ChannelIn.FP32):
        ok &= check(ch, DecodeOut.O_B32)
    ok &= check(ChannelIn.HARD, DecodeOut.O_B16)
    ok &= check(ChannelIn.SOFT8, DecodeOut.O_B16)
    # overlapped (left-shifted) last block
    ok &= check(ChannelIn.SOFT4, DecodeOut.O_B32, dec_len=128, b=3,
                extra_m=64)
    # dec_len < 64: the halo spans multiple following blocks
    ok &= check(ChannelIn.SOFT8, DecodeOut.O_B32, dec_len=32, b=40)
    ok &= check(ChannelIn.SOFT4, DecodeOut.O_B16, dec_len=48, b=9)
    print("word mode matches value mode on all configs" if ok
          else "FAILURES")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
