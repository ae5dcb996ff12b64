"""Can FP32 skip its staging chain entirely?  fp32_split3_probe.py showed
the HIGHEST deinterleave matmuls cost ~nothing — FP32's ~11 ns/stage over
SOFT8 is the staging chain's HBM round trips (clip -> deinterleave ->
trunc -> qu/qd -> pack: several full-size intermediates that dots force
XLA to materialize).  This probes a fused VALUE kernel that reads the raw
interleaved f32 wire directly through the r4 zero-copy staging (bitcast
body + roll halo — per-stage values are adjacent SUBLANE rows after the
in-VMEM transpose, so no deinterleave exists at all) and does
clip + u/d + trunc in-kernel.

VMEM: the f32 value block is 2x the SOFT16 word block, so dec_len 4096 +
windowed survivor is the production point (dec_len 2048 full also fits).

Checks bit-equality vs the shipped u/d-word path (trunc is odd, so both
compute identical branch metrics), then k-multi slope at 32M bits.

Usage: timeout 2400 python scripts/fp32_fused_value_probe.py [bits]
"""

import functools
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

T0 = time.time()


def log(msg):
    print(f"+{time.time()-T0:6.1f}s {msg}", flush=True)


def main():
    import numpy as np
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from tpu_viterbi.config import (FP_PRECISION, NUM_STATES, ChannelIn,
                                    DecoderConfig)
    from tpu_viterbi.decoder import core_pallas as cp
    from tpu_viterbi.decoder.core_xla import (WARMUP, assemble_output,
                                              plan_blocks)

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 32_000_000
    cfg = DecoderConfig(channel_in=ChannelIn.FP32)
    lo = float(-(1 << (FP_PRECISION - 1)))
    hi = float((1 << (FP_PRECISION - 1)) - 1)
    log(f"device: {jax.devices()[0]}")

    def kernel(body_ref, edge_ref, out_ref, surv_ref, vals_ref, *, n_packs,
               bpp, n_conv, n_emit, window):
        lt = out_ref.shape[1]
        vpp = vals_ref.shape[1]              # 2*bpp values per pack
        nb = body_ref.shape[1] // vpp
        nh = n_packs - nb
        vals_ref[:nb] = body_ref[...].T.reshape(nb, vpp, lt)
        edge_col = edge_ref[0].T             # (128, 1)
        lane = jax.lax.broadcasted_iota(jnp.int32, (vpp, lt), 1)
        for j in range(nh):
            rolled = pltpu.roll(vals_ref[j], lt - 1, 1)
            vals_ref[nb + j] = jnp.where(
                lane == lt - 1, edge_col[j * vpp:(j + 1) * vpp], rolled)

        def make_ud(p):
            rp = jnp.clip(vals_ref[p], lo, hi)   # (2*bpp, LT) f32

            def ud(s):
                r0 = rp[2 * s: 2 * s + 1]
                r1 = rp[2 * s + 1: 2 * s + 2]
                return r0 + r1, r0 - r1
            return ud

        cp._decode_core(make_ud, out_ref, surv_ref, n_packs=n_packs,
                        bpp=bpp, n_conv=n_conv, n_emit=n_emit,
                        is_float=True, renorm=False, window=window)

    def build(dec_len, window, nbits):
        m = cfg.get_message_len(2 * nbits)
        plan = plan_blocks(m, 32, dec_len)
        bpp, n_packs = 32, plan.n_packs
        n_conv = -(-(cfg.extra_r - bpp) // bpp)
        n_emit = dec_len // bpp
        b_pad = -(-plan.num_blocks // 128) * 128
        vpb = 2 * dec_len                    # f32 values per block body
        vph = 2 * WARMUP
        tiles = b_pad // 128
        surv_slots = cp.survivor_window_slots(cfg) if window else n_packs
        kern = functools.partial(kernel, n_packs=n_packs, bpp=bpp,
                                 n_conv=n_conv, n_emit=n_emit,
                                 window=window)
        call = pl.pallas_call(
            kern,
            grid=(tiles,),
            in_specs=[pl.BlockSpec((128, vpb), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((1, 1, 128), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((n_emit, 128), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n_emit, b_pad), jnp.int32),
            scratch_shapes=[pltpu.VMEM((surv_slots, NUM_STATES, 128),
                                       jnp.int32),
                            pltpu.VMEM((n_packs, 2 * bpp, 128),
                                       jnp.float32)],
        )
        need = b_pad * vpb + vph

        def decode(vals):
            if vals.shape[0] < need:
                vals = jnp.concatenate(
                    [vals, jnp.zeros((need - vals.shape[0],), jnp.float32)])
            body = vals[: b_pad * vpb].reshape(b_pad, vpb)
            span = 128 * vpb
            rows = []
            for i in range(tiles):
                a = (i + 1) * span
                if a + vph <= need:
                    rows.append(jax.lax.slice(vals, (a,), (a + vph,)))
                else:
                    rows.append(jnp.zeros((vph,), jnp.float32))
            edge = (jnp.stack(rows) if tiles > 1 else rows[0][None])
            edge = jnp.pad(edge, ((0, 0), (0, 128 - vph)))[:, None, :]
            out = call(body, edge)
            out_packs = out.transpose(1, 0)[:plan.num_blocks] \
                .view(jnp.uint32)
            return assemble_output(out_packs, cfg, plan)
        return decode, plan

    # --- bit-equality vs the shipped u/d-word path at 2M ---
    n_small = 2_000_000
    m_s = cfg.get_message_len(2 * n_small)
    # full survivor on both sides: windowed/full legitimately differ on
    # non-coded (random) input, so equality needs matched survivor modes
    plan_s = plan_blocks(m_s, 32, 2048)
    rng = np.random.default_rng(3)
    vals_s = jnp.asarray(rng.standard_normal(4 * n_small) * 5, jnp.float32)
    want = np.asarray(cp.decode_packed_pallas(vals_s, cfg, plan_s))

    dec_s, _ = build(2048, False, n_small)
    got = np.asarray(jax.jit(dec_s)(vals_s))
    same = np.array_equal(got, want)
    log(f"bit-equality vs u/d-word path @2M: "
        f"{'OK' if same else 'MISMATCH ' + str(np.count_nonzero(got != want))}")
    if not same:
        return 1

    # --- timing at 32M ---
    words = cfg.get_input_words(2 * n)
    gen = jax.jit(lambda k: jax.random.normal(k, (words,), jnp.float32) * 4)
    xs = [gen(jax.random.PRNGKey(i)) for i in range(6)]
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
        m = cfg.get_message_len(2 * n)
        log(f"{label:28s} {t*1e3:7.2f} ms ({t*1e9/stages:5.2f} ns/stage, "
            f"{m/t/1e9:.3f} Gb/s)")
        return t

    for dl, win in ((4096, True), (2048, False)):
        dec, plan = build(dl, win, n)
        b_pad = -(-plan.num_blocks // 128) * 128
        stages = (b_pad // 128) * plan.n_packs * 32

        def full(*vs, dec=dec):
            tot = jnp.int32(0)
            for v in vs:
                out = dec(v)
                tot += jnp.sum(jax.lax.population_count(out)
                               .astype(jnp.int32))
            return tot
        tslope(f"fused-value dl={dl} win={win}", full, stages)

    # shipped u/d-word path for comparison, same session
    plan8 = plan_blocks(cfg.get_message_len(2 * n), 32, 8192)
    b_pad8 = -(-plan8.num_blocks // 128) * 128
    stages8 = (b_pad8 // 128) * plan8.n_packs * 32

    def ud_full(*vs):
        tot = jnp.int32(0)
        for v in vs:
            out = cp.decode_packed_pallas(v, cfg, plan8)
            tot += jnp.sum(jax.lax.population_count(out).astype(jnp.int32))
        return tot
    tslope("shipped ud-words dl=8192", ud_full, stages8)
    return 0


if __name__ == "__main__":
    sys.exit(main())
