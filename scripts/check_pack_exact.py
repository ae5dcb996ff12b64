"""On-chip exactness check for the MXU precision choices in the staging
matmuls (r3):

1. pack_words / pack_words_2streams at DEFAULT precision for field widths
   <= 8 (quantize._pack_precision): every packed word must equal the
   numpy shift-or reference on full-range random fields.  SOFT16 (width
   16) stays HIGHEST and is checked too.
2. fp32_ud_words' one-hot deinterleave at HIGHEST precision: each matmul
   output must be an exact f32 COPY, so trunc(r0 +- r1) must match the
   numpy float32 reference bit for bit — including adversarial pairs
   constructed to land within 1 ulp of integer boundaries, where any
   copy/sum rounding difference flips the trunc.  (HIGH/bf16_3x was
   MEASURED inexact for these copies on chip — r3; DEFAULT truncates the
   operand outright.)
3. End to end: FP32 decode through the u/d word path vs the XLA float
   core at 2M noisy bits — outputs bit-identical on chip.

Usage: timeout 1200 python scripts/check_pack_exact.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

T0 = time.time()


def log(s):
    print(f"+{time.time()-T0:6.1f}s {s}", flush=True)


def np_pack(fields, width):
    per = 32 // width
    f = np.asarray(fields, dtype=np.uint64).reshape(-1, per)
    w = np.zeros(f.shape[0], np.uint64)
    for j in range(per):
        w = (w << np.uint64(width)) | f[:, j]
    return w.astype(np.uint32)


def check_pack_widths():
    rng = np.random.default_rng(11)
    ok = True
    from tpu_viterbi.chain.quantize import pack_words, pack_words_2streams
    for width in (1, 4, 8, 16):
        n = 1 << 20
        q = rng.integers(0, 1 << width, size=n).astype(np.uint32)
        got = np.asarray(pack_words(jnp.asarray(q), width))
        want = np_pack(q, width)
        same = np.array_equal(got, want)
        log(f"pack_words width={width:2d}: {'OK' if same else 'MISMATCH'}")
        ok &= same
        if width < 32:
            q0 = rng.integers(0, 1 << width, size=n // 2).astype(np.uint32)
            q1 = rng.integers(0, 1 << width, size=n // 2).astype(np.uint32)
            inter = np.empty(n, np.uint32)
            inter[0::2] = q0
            inter[1::2] = q1
            got2 = np.asarray(pack_words_2streams(jnp.asarray(q0),
                                                  jnp.asarray(q1), width))
            want2 = np_pack(inter, width)
            same2 = np.array_equal(got2, want2)
            log(f"pack_2streams width={width:2d}: "
                f"{'OK' if same2 else 'MISMATCH'}")
            ok &= same2
    return ok


def check_fp32_ud():
    from tpu_viterbi.decoder.core_xla import fp32_ud_words
    rng = np.random.default_rng(13)
    n2 = 1 << 20
    vals = (rng.standard_normal(n2) * 5.0).astype(np.float32)
    # adversarial pairs: r1 chosen so r0 + r1 sits within float spacing of
    # an integer — any deinterleave copy error flips the trunc
    k = n2 // 4
    targets = rng.integers(-14, 15, size=k).astype(np.float32)
    eps = (rng.integers(0, 2, size=k) * 2 - 1).astype(np.float32) * 1e-6
    vals[0:2 * k:2] = rng.uniform(-7.9, 6.9, size=k).astype(np.float32)
    vals[1:2 * k:2] = (targets + eps - vals[0:2 * k:2]).astype(np.float32)

    got = np.asarray(fp32_ud_words(jnp.asarray(vals))).view(np.uint32)

    c = np.clip(vals.astype(np.float32), -8.0, 7.0).astype(np.float32)
    r0, r1 = c[0::2], c[1::2]
    qu = np.trunc((r0 + r1).astype(np.float32)).astype(np.int32) & 0xFF
    qd = np.trunc((r0 - r1).astype(np.float32)).astype(np.int32) & 0xFF
    inter = np.empty(n2, np.uint32)
    inter[0::2] = qu.astype(np.uint32)
    inter[1::2] = qd.astype(np.uint32)
    want = np_pack(inter, 8)
    same = np.array_equal(got[:len(want)], want)
    if not same:
        bad = np.nonzero(got[:len(want)] != want)[0]
        log(f"fp32_ud_words MISMATCH: {len(bad)} words, first {bad[:5]}")
    else:
        log("fp32_ud_words: OK (incl. trunc-boundary adversarial pairs)")
    return same


def check_fp32_decode():
    from tpu_viterbi.chain import packed_workload
    from tpu_viterbi.config import ChannelIn, DecoderConfig
    from tpu_viterbi.decoder.core_pallas import decode_packed_pallas
    from tpu_viterbi.decoder.core_xla import decode_packed_xla, plan_blocks
    rng = np.random.default_rng(17)
    n = 2_000_000
    cfg = DecoderConfig(channel_in=ChannelIn.FP32)
    # random (non-coded) floats: valid for ud-vs-xla (identical continuous
    # chase either way), NOT for windowed-vs-full (the per-slide fresh
    # chase only equals the continuous one after path merging, which
    # random input does not guarantee)
    vals = (rng.standard_normal(2 * n) * 4.0).astype(np.float32)
    plan = plan_blocks(cfg.get_message_len(2 * n), cfg.bits_per_pack, 8192)
    x = jnp.asarray(vals)
    ud = np.asarray(decode_packed_pallas(x, cfg, plan))
    xl = np.asarray(decode_packed_xla(x, cfg, plan))
    same = np.array_equal(ud, xl)
    log(f"fp32 decode ud-vs-xla @2M: {'OK' if same else 'MISMATCH'}")
    # windowed equality on CODED input (5.5 dB noisy wire-format floats)
    _, fvals = packed_workload(jax.random.PRNGKey(5), n, ChannelIn.FP32,
                               5.5, 4.0)
    full = np.asarray(decode_packed_pallas(fvals, cfg, plan))
    win = np.asarray(decode_packed_pallas(fvals, cfg, plan, window=True))
    same2 = np.array_equal(full, win)
    log(f"fp32 decode windowed (coded): {'OK' if same2 else 'MISMATCH'}")
    return same and same2


def check_window_equality():
    """Survivor-window kernel vs full store on chip, noisy SOFT8 @ 2M."""
    from tpu_viterbi.chain import packed_workload
    from tpu_viterbi.config import ChannelIn, DecoderConfig
    from tpu_viterbi.decoder.core_pallas import decode_packed_pallas
    from tpu_viterbi.decoder.core_xla import plan_blocks
    cfg = DecoderConfig(channel_in=ChannelIn.SOFT8)
    n = 2_000_000
    _, packed = packed_workload(jax.random.PRNGKey(3), n, ChannelIn.SOFT8,
                                5.5, 32.0)
    plan = plan_blocks(cfg.get_message_len(2 * n), cfg.bits_per_pack, 8192)
    full = np.asarray(decode_packed_pallas(packed, cfg, plan))
    win = np.asarray(decode_packed_pallas(packed, cfg, plan, window=True))
    same = np.array_equal(full, win)
    log(f"soft8 windowed-vs-full @2M noisy: {'OK' if same else 'MISMATCH'}")
    return same


def main():
    log(f"backend={jax.default_backend()}")
    ok = check_pack_widths()
    ok &= check_fp32_ud()
    ok &= check_fp32_decode()
    ok &= check_window_equality()
    print("PACK/UD EXACTNESS OK" if ok else "FAILURES")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
