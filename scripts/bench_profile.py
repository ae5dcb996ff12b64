"""Decompose the BENCH slope at the exact bench config (VERDICT r1 item 1a):
where do the ~3 ms between the ~6.6-7.2 ms kernel number (verify_and_time,
dec_len 2048, pre-staged word-major inputs) and the ~10 ms bench slope
(dec_len 8192, decode_packed_pallas + BER check) go?

Pieces, each timed with the k-multi slope (one dispatch runs the piece k
times on distinct pre-staged inputs; (t_k5 - t_k1)/4 cancels the relay
floor):

  stage    _block_major_words reshapes (body/halo construction)
  kraw     staging + raw fused pallas_call (no transpose/assemble)
  decode   full decode_packed_pallas (staging + kernel + assemble)
  check    XOR + popcount + int64-sum BER check on prestaged outputs
  d+c      decode + check fused in one jit (the bench's timed function)

Usage: timeout 1800 python scripts/bench_profile.py [message_len] [dec_len]
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpu_viterbi.config import ChannelIn, DecoderConfig, NUM_STATES
from tpu_viterbi.decoder import core_pallas as cp
from tpu_viterbi.decoder.core_xla import WARMUP, plan_blocks

T0 = time.time()


def log(s):
    print(f"[profile +{time.time()-T0:6.1f}s] {s}", flush=True)


def kslope(name, fn, xs, reps=4, ks=(1, 5)):
    """fn(*inputs_tuple) summed k times in one jit; xs = distinct inputs."""
    def kmulti(*args):
        return sum(fn(a) for a in args)
    k_lo = jax.jit(kmulti)
    k_hi = jax.jit(kmulti)
    n = len(xs)
    np.asarray(k_lo(xs[0]))
    np.asarray(k_hi(*xs[:ks[1]]))
    tl, th = [], []
    for j in range(reps):
        t0 = time.perf_counter()
        np.asarray(k_lo(*(xs[(j + 1 + i) % n] for i in range(ks[0]))))
        tl.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        np.asarray(k_hi(*(xs[(j + 2 + i) % n] for i in range(ks[1]))))
        th.append(time.perf_counter() - t0)
    t = (min(th) - min(tl)) / (ks[1] - ks[0])
    log(f"{name:8s} {t*1e3:7.2f} ms   (t1={[f'{x*1e3:.0f}' for x in tl]} "
        f"t{ks[1]}={[f'{x*1e3:.0f}' for x in th]})")
    return t


def main():
    m = int(sys.argv[1]) if len(sys.argv) > 1 else 32_000_000
    dec_len = int(sys.argv[2]) if len(sys.argv) > 2 else 8192
    cfg = DecoderConfig(channel_in=ChannelIn.SOFT8)
    plan = plan_blocks(cfg.get_message_len(2 * m), 32, dec_len)
    lt = cp.LANE_TILE
    b_pad = -(-plan.num_blocks // lt) * lt
    n_words = cfg.get_input_words(2 * m)
    n_out = plan.message_len // 32
    log(f"m={m} dec_len={dec_len} blocks={plan.num_blocks} "
        f"tiles={b_pad//lt} n_packs={plan.n_packs} backend="
        f"{jax.default_backend()}")

    gen = jax.jit(lambda k: jax.random.randint(
        k, (n_words,), -2 ** 31, 2 ** 31 - 1, dtype=jnp.int32))
    xs = [gen(jax.random.PRNGKey(i)) for i in range(7)]
    jax.block_until_ready(xs)
    log("inputs staged")

    # --- staging only ---
    def stage_piece(x):
        body, halo = cp._block_major_words(x, cfg, plan, b_pad)
        return jnp.sum(body[:, 0]) + jnp.sum(halo[:, 0])
    t_stage = kslope("stage", stage_piece, xs)

    # --- staging + raw fused kernel (no transpose / assemble) ---
    bpp = plan.bits_per_pack
    n_conv = -(-(cfg.extra_r - bpp) // bpp)
    n_emit = plan.dec_len // bpp

    def kraw(x):
        body, halo = cp._block_major_words(x, cfg, plan, b_pad)
        wpb, wph = body.shape[1], halo.shape[1]
        wpp = (wpb + wph) // plan.n_packs
        kernel = functools.partial(
            cp._viterbi_kernel_fused, n_packs=plan.n_packs, bpp=bpp,
            n_conv=n_conv, n_emit=n_emit, vpw=cfg.enc_data_per_pack,
            width=cfg.enc_data_width)
        out = pl.pallas_call(
            kernel,
            grid=(b_pad // lt,),
            in_specs=[pl.BlockSpec((lt, wpb), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((lt, wph), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((n_emit, lt), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n_emit, b_pad), jnp.int32),
            scratch_shapes=[pltpu.VMEM((plan.n_packs, NUM_STATES, lt),
                                       jnp.int32),
                            pltpu.VMEM((plan.n_packs, wpp, lt), jnp.int32)],
        )(body, halo)
        return jnp.sum(out[:, ::64])
    t_kraw = kslope("kraw", kraw, xs)

    # --- full decode ---
    def dec(x):
        return jnp.sum(cp.decode_packed_pallas(x, cfg, plan).view(jnp.int32))
    t_dec = kslope("decode", dec, xs)

    # --- BER check on prestaged outputs ---
    gen_out = jax.jit(lambda k: jax.random.randint(
        k, (2, n_out), -2 ** 31, 2 ** 31 - 1, dtype=jnp.int32))
    ys = [gen_out(jax.random.PRNGKey(100 + i)) for i in range(7)]
    jax.block_until_ready(ys)

    def check(y):
        return jnp.sum(jax.lax.population_count(y[0] ^ y[1])
                       .astype(jnp.int64))
    t_chk = kslope("check", check, ys)

    # --- decode + check (the bench's timed jit) ---
    rs = [gen_out(jax.random.PRNGKey(200 + i))[0].view(jnp.uint32)
          for i in range(7)]
    jax.block_until_ready(rs)

    def dc(x, r):
        out = cp.decode_packed_pallas(x, cfg, plan)
        ben = jnp.sum(jax.lax.population_count(out ^ r).astype(jnp.int64))
        return jnp.stack([jnp.sum(out.view(jnp.int32)).astype(jnp.int64),
                          ben])

    def kmulti_dc(*pairs):
        return sum(dc(*p)[1] for p in pairs)
    pairs = [(x, r) for x, r in zip(xs, rs)]
    k1, k5 = jax.jit(kmulti_dc), jax.jit(kmulti_dc)
    np.asarray(k1(pairs[0]))
    np.asarray(k5(*pairs[:5]))
    tl, th = [], []
    for j in range(4):
        t0 = time.perf_counter()
        np.asarray(k1(pairs[(j + 1) % 7]))
        tl.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        np.asarray(k5(*(pairs[(j + 2 + i) % 7] for i in range(5))))
        th.append(time.perf_counter() - t0)
    t_dc = (min(th) - min(tl)) / 4
    log(f"{'d+c':8s} {t_dc*1e3:7.2f} ms   "
        f"(t1={[f'{x*1e3:.0f}' for x in tl]} "
        f"t5={[f'{x*1e3:.0f}' for x in th]})")

    log("---- attribution ----")
    log(f"staging            {t_stage*1e3:7.2f} ms")
    log(f"kernel (raw-stage) {(t_kraw-t_stage)*1e3:7.2f} ms")
    log(f"assemble (dec-raw) {(t_dec-t_kraw)*1e3:7.2f} ms")
    log(f"check              {t_chk*1e3:7.2f} ms")
    log(f"decode total       {t_dec*1e3:7.2f} ms "
        f"({m/t_dec/1e9:.2f} Gb/s)")
    log(f"decode+check       {t_dc*1e3:7.2f} ms "
        f"({m/t_dc/1e9:.2f} Gb/s)")
    stages = (b_pad // lt) * plan.n_packs * bpp
    log(f"ns/stage (kernel)  {(t_kraw-t_stage)*1e9/stages:.1f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
