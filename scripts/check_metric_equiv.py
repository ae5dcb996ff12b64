"""Metric-dtype equivalence check on TPU: the reference sizes its renorm
strides so int16 PMs never wrap (threshold 16000 + max growth/stride <
32767, viterbiACS.cuh:320 + viterbi.cu:173) and restricts fp16 to channels
whose PMs stay integer-exact below 2048 (OptionsValid, viterbi.h:22-41) —
the metric dtype is a performance knob, not a semantics knob.  Therefore
the b16/fp16 XLA cores must decode bit-identically to the int32 Pallas
kernel.  This script stress-checks that with full-range random channel
words (worst-case branch-metric magnitudes) before api.py routes all
metric modes through the Pallas kernel on TPU."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from tpu_viterbi.config import ChannelIn, DecoderConfig, Metric
from tpu_viterbi.decoder.core_pallas import decode_packed_pallas
from tpu_viterbi.decoder.core_xla import decode_packed_xla, plan_blocks

T0 = time.time()


def check(metric, channel, m=500_000, dec_len=2048, seed=3):
    cfg = DecoderConfig(channel_in=channel, metric=metric)
    plan = plan_blocks(m, cfg.bits_per_pack, dec_len)
    rng = np.random.default_rng(seed)
    n_words = cfg.get_input_words(2 * m)
    if channel == ChannelIn.FP32:
        words = jnp.asarray(rng.integers(-8, 8, size=(n_words,))
                            .astype(np.float32))
    else:
        words = jnp.asarray(rng.integers(-2 ** 31, 2 ** 31, size=(n_words,))
                            .astype(np.int32))
    a = np.asarray(decode_packed_xla(words, cfg, plan))
    b = np.asarray(decode_packed_pallas(words, cfg, plan))
    ok = np.array_equal(a, b)
    if not ok:
        nbad = int(np.count_nonzero(a != b))
        print(f"+{time.time()-T0:6.1f}s {metric.name:6s} x {channel.name:6s}"
              f": MISMATCH ({nbad}/{len(a)} words differ)", flush=True)
    else:
        print(f"+{time.time()-T0:6.1f}s {metric.name:6s} x {channel.name:6s}"
              f": OK (m={m})", flush=True)
    return ok


def main():
    ok = True
    for ch in (ChannelIn.HARD, ChannelIn.SOFT4, ChannelIn.SOFT8,
               ChannelIn.FP32):
        ok &= check(Metric.M_B16, ch)
    for ch in (ChannelIn.HARD, ChannelIn.SOFT4, ChannelIn.FP32):
        ok &= check(Metric.M_FP16, ch)
    print("all metric dtypes decode identically to the int32 kernel"
          if ok else "FAILURES — keep XLA routing for non-b32 metrics")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
