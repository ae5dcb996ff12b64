"""On-hardware randomized fuzz: decode_packed_pallas vs decode_packed_xla
on the real chip over random valid configs, message lengths, and block
lengths with full-range random words.  The CPU suite fuzzes the XLA core
against the golden oracle (tests/test_fuzz.py); this closes the loop by
fuzzing the Pallas kernel against that XLA core where both actually run.

A second family fuzzes the WINDOWED survivor kernel against the full
store on CODED input (random message -> conv encode -> AWGN -> quantize):
the >= 64-merged-stage chase must make the two bit-identical there
(tests/test_survivor_window.py is the interpret-mode CI twin; on random
non-coded words the two may legitimately differ — unmerged paths — so
this family generates real coded streams).

Usage: python scripts/fuzz_tpu.py [n_trials] [seed0] [n_window_trials]
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


def wtrial(i, seed):
    """Windowed-vs-full on coded input (the only domain where they must
    be bit-identical; see module docstring)."""
    from tpu_viterbi.chain.encode import conv_encode_np
    from tpu_viterbi.chain.quantize import quantize_and_pack
    from tpu_viterbi.config import DecodeOut, DecoderConfig
    from tpu_viterbi.sharding.simulate import DEFAULT_SCALES

    rng = np.random.default_rng(seed)
    channels = [ChannelIn.HARD, ChannelIn.SOFT4, ChannelIn.SOFT8,
                ChannelIn.SOFT16, ChannelIn.FP32]
    ch = channels[rng.integers(len(channels))]
    out = DecodeOut.O_B16 if rng.integers(2) else DecodeOut.O_B32
    cfg = DecoderConfig(channel_in=ch, decode_out=out)
    bpp = cfg.bits_per_pack
    n = int(rng.integers(40, 400)) * bpp
    sigma = float(rng.uniform(0.0, 0.6))
    bits = rng.integers(0, 2, n).astype(np.uint8)
    sym = 2 * conv_encode_np(bits).astype(np.float32) - 1
    if sigma:
        sym = sym + rng.normal(0, sigma, sym.shape).astype(np.float32)
    packed = jnp.asarray(np.asarray(
        quantize_and_pack(jnp.asarray(sym), ch, DEFAULT_SCALES[ch])))
    m = cfg.get_message_len(2 * n)
    # dec_len >= 64 stages keeps the roll-halo fused path in play
    plan = plan_blocks(m, bpp, int(rng.integers(max(2, 64 // bpp + 1), 12))
                       * bpp)
    full = np.asarray(decode_packed_pallas(packed, cfg, plan, window=False))
    win = np.asarray(decode_packed_pallas(packed, cfg, plan, window=True))
    ok = np.array_equal(full, win)
    print(f"+{time.time()-T0:6.1f}s wtrial {i:3d}: "
          f"{ch.name:6s}/{out.name} m={m:5d} dec_len={plan.dec_len:4d} "
          f"sigma={sigma:.2f} blocks={plan.num_blocks:3d} -> "
          f"{'OK' if ok else 'MISMATCH'}", flush=True)
    return ok


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 24
    seed0 = int(sys.argv[2]) if len(sys.argv) > 2 else 5000
    n_win = int(sys.argv[3]) if len(sys.argv) > 3 else max(8, n // 2)
    bad = sum(not trial(i, seed0 + i) for i in range(n))
    bad += sum(not wtrial(i, seed0 + 10_000 + i) for i in range(n_win))
    print(f"{n + n_win - bad}/{n + n_win} trials OK")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
