"""FP32 staging: can the HIGHEST-precision one-hot deinterleave matmuls
(fp32_ud_words) be replaced by a manual 3-way bf16 split at DEFAULT
precision?

HIGHEST runs 6 bf16 passes (both operands split 3-way); but our MATRIX
operand is one-hot (0/1 — exactly bf16) and only the DATA operand needs
splitting: v = v1 + v2 + v3 with v1 = bf16(v), v2 = bf16(v - v1),
v3 = bf16(v - v1 - v2) covers the full 24-bit mantissa, each vi is
bf16-exact, and the per-output sum of three exact f32 terms is exact
(8+8+8 mantissa bits <= 24).  So three DEFAULT passes reproduce the
HIGHEST result bit-for-bit at half the MXU work.  (The HW 'HIGH'
(bf16_3x) path was measured INEXACT for these copies on this chip —
56% of packed words wrong, scripts/check_pack_exact.py r3 — so the
manual split is the only sub-HIGHEST exact route.)

Checks exactness on adversarial values (trunc boundaries, full-mantissa
randoms), then k-multi-slopes fp32_ud_words vs the split-3 variant and
the full FP32 decode with each, at 32M bits.

Usage: timeout 2400 python scripts/fp32_split3_probe.py [message_bits]
"""

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

T0 = time.time()


def log(msg):
    print(f"+{time.time()-T0:6.1f}s {msg}", flush=True)


def make_split3():
    import jax
    import jax.numpy as jnp

    from tpu_viterbi.chain.quantize import (_interleave_matrices,
                                            pack_words_2streams)
    from tpu_viterbi.config import FP_PRECISION

    def fp32_ud_words_split3(vals):
        lo = float(-(1 << (FP_PRECISION - 1)))
        hi = float((1 << (FP_PRECISION - 1)) - 1)
        v = jnp.clip(vals.astype(jnp.float32), lo, hi)
        pad = (-v.shape[0]) % 256
        if pad:
            v = jnp.concatenate([v, jnp.zeros((pad,), jnp.float32)])
        s0, s1 = _interleave_matrices()
        rows = v.reshape(-1, 128)
        v1 = rows.astype(jnp.bfloat16).astype(jnp.float32)
        v2 = (rows - v1).astype(jnp.bfloat16).astype(jnp.float32)
        v3 = rows - v1 - v2
        m0 = jnp.asarray(s0.T)
        m1 = jnp.asarray(s1.T)

        def dot3(m):
            acc = None
            for piece in (v1, v2, v3):
                d = jnp.dot(piece, m, preferred_element_type=jnp.float32)
                acc = d if acc is None else acc + d
            return acc.reshape(-1)

        r0 = dot3(m0)
        r1 = dot3(m1)
        qu = jnp.trunc(r0 + r1).astype(jnp.int32).astype(jnp.uint32) \
            & jnp.uint32(0xFF)
        qd = jnp.trunc(r0 - r1).astype(jnp.int32).astype(jnp.uint32) \
            & jnp.uint32(0xFF)
        return pack_words_2streams(qu, qd, 8).astype(jnp.int32)

    return fp32_ud_words_split3


def main():
    import numpy as np
    import jax
    import jax.numpy as jnp

    from tpu_viterbi.config import ChannelIn, DecoderConfig
    from tpu_viterbi.decoder import core_pallas as cp
    from tpu_viterbi.decoder.core_xla import fp32_ud_words, plan_blocks

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 32_000_000
    split3 = make_split3()
    log(f"device: {jax.devices()[0]}")

    # --- exactness: adversarial near-trunc-boundary pairs + randoms ---
    rng = np.random.default_rng(5)
    vals = np.concatenate([
        rng.standard_normal(1 << 18).astype(np.float32) * 6,
        (rng.integers(-15, 15, 1 << 18) +
         rng.choice([0.0, 1e-7, -1e-7, 0.5, 0.4999999], 1 << 18))
        .astype(np.float32) * 0.5,
        rng.standard_normal(1 << 18).astype(np.float32) * 1e-4,
    ])
    a = np.asarray(jax.jit(fp32_ud_words)(jnp.asarray(vals)))
    b = np.asarray(jax.jit(split3)(jnp.asarray(vals)))
    same = np.array_equal(a, b)
    log(f"exactness vs HIGHEST on {len(vals)} adversarial values: "
        f"{'BIT-EXACT' if same else f'MISMATCH {np.count_nonzero(a != b)}'}")
    if not same:
        return 1

    # --- timing: staging alone and full decode, k-multi slope ---
    cfg = DecoderConfig(channel_in=ChannelIn.FP32)
    m = cfg.get_message_len(2 * n)
    plan = plan_blocks(m, 32, 8192)
    words = cfg.get_input_words(2 * n)
    gen = jax.jit(lambda k: jax.random.normal(k, (words,), jnp.float32) * 4)
    xs = [gen(jax.random.PRNGKey(i)) for i in range(7)]
    jax.block_until_ready(xs)

    def tslope(label, fn, stages, reps=4, k_hi=4):
        j1, jh = jax.jit(fn), jax.jit(fn)
        np.asarray(j1(xs[0]))
        np.asarray(jh(*xs[:k_hi]))
        nn = len(xs)
        tl, th = [], []
        for j in range(reps):
            t0 = time.perf_counter()
            np.asarray(j1(xs[1 + (j % (nn - 1))]))
            tl.append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            np.asarray(jh(*(xs[(j + 2 + i) % nn] for i in range(k_hi))))
            th.append(time.perf_counter() - t0)
        t = (min(th) - min(tl)) / (k_hi - 1)
        log(f"{label:22s} {t*1e3:7.2f} ms ({t*1e9/stages:5.2f} ns/stage)")
        return t

    b_pad = -(-plan.num_blocks // 128) * 128
    stages = (b_pad // 128) * plan.n_packs * 32

    def stage_hi(*vs):
        return sum(jnp.sum(fp32_ud_words(v), dtype=jnp.int32)
                   for v in vs)

    def stage_s3(*vs):
        return sum(jnp.sum(split3(v), dtype=jnp.int32)
                   for v in vs)

    def dec_hi(*vs):
        tot = jnp.int32(0)
        for v in vs:
            out = cp.decode_packed_pallas(v, cfg, plan)
            tot += jnp.sum(jax.lax.population_count(out).astype(jnp.int32))
        return tot

    tslope("staging HIGHEST", stage_hi, stages)
    tslope("staging split3", stage_s3, stages)
    tslope("decode (HIGHEST now)", dec_hi, stages)
    return 0


if __name__ == "__main__":
    sys.exit(main())
