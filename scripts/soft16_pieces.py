"""Split SOFT16's production gap into kernel-resident vs XLA-side shares.

soft16_fix.py: all four in-kernel unpack formulations identical (~32 ns vs
SOFT8's 28).  soft16_ablation.py: in a clean harness the SOFT16 unpack and
its 2x input DMA cost NOTHING over SOFT8.  So the production gap must live
either in the XLA-side staging/assembly around the kernel or in an
interaction specific to the production kernel configuration.  This probe
times, same process, same k-multi slope:

  kernel-only — the exact production pallas_call (fused transpose + decode,
                production shapes) on PRE-STAGED body/halo arrays, reduced
                with a jnp.sum instead of assemble_output
  full        — decode_packed_pallas + ref XOR/popcount (what
                channel_throughput.py reports)

for SOFT8/8192, SOFT16/4096(full), SOFT16/8192(window).

Usage: timeout 3600 python scripts/soft16_pieces.py [message_bits]
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
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from tpu_viterbi.chain import packed_workload
    from tpu_viterbi.chain.quantize import pack_words
    from tpu_viterbi.config import NUM_STATES, ChannelIn, DecoderConfig
    from tpu_viterbi.decoder import core_pallas as cp
    from tpu_viterbi.decoder.core_xla import needs_int32_renorm, plan_blocks
    from tpu_viterbi.sharding.simulate import DEFAULT_SCALES

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 32_000_000
    log(f"device: {jax.devices()[0]}")

    def kmulti_time(fn, inputs, label, stages, reps=5, k_hi=4):
        j1, jh = jax.jit(fn), jax.jit(fn)
        flat = lambda t: [x for tup in t for x in tup]
        np.asarray(j1(*flat(inputs[:1])))
        np.asarray(jh(*flat(inputs[:k_hi])))
        m = len(inputs)
        tl, th = [], []
        for j in range(reps):
            t0 = time.perf_counter()
            np.asarray(j1(*flat([inputs[1 + (j % (m - 1))]])))
            tl.append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            np.asarray(jh(*flat([inputs[(j + 2 + i) % m]
                                 for i in range(k_hi)])))
            th.append(time.perf_counter() - t0)
        s = (min(th) - min(tl)) / (k_hi - 1)
        log(f"{label:28s} {s*1e3:7.2f} ms  {s*1e9/stages:6.2f} ns/stage")
        return s

    def run_config(ch, dec_len, survivor="auto"):
        cfg = DecoderConfig(channel_in=ch)
        m = cfg.get_message_len(2 * n)
        plan = plan_blocks(m, 32, dec_len)
        win = cp.resolve_window(survivor, cfg, plan)
        b_pad = -(-plan.num_blocks // 128) * 128
        tiles = b_pad // 128
        stages = tiles * plan.n_packs * 32
        label = f"{ch.name.lower()}/{dec_len}{'w' if win else ''}"

        # --- pre-staged inputs for the kernel-only variant ---
        @jax.jit
        def mk(key):
            bits, packed = packed_workload(key, n, ch, 5.5,
                                           DEFAULT_SCALES[ch])
            ref = pack_words(bits[cfg.extra_l: cfg.extra_l + m]
                             .astype(jnp.uint32), 1)
            body, halo = cp._block_major_words(packed.astype(jnp.int32),
                                               cfg, plan, b_pad)
            return packed, ref, body, halo

        ws = [jax.block_until_ready(mk(jax.random.PRNGKey(51 + i)))
              for i in range(6)]

        bpp, n_packs = 32, plan.n_packs
        n_conv = -(-(cfg.extra_r - bpp) // bpp)
        n_emit = dec_len // bpp
        wpb, wph = ws[0][2].shape[1], ws[0][3].shape[1]
        wpp = (wpb + wph) // n_packs
        kernel = functools.partial(
            cp._viterbi_kernel_fused, n_packs=n_packs, bpp=bpp,
            n_conv=n_conv, n_emit=n_emit, vpw=cfg.enc_data_per_pack,
            width=cfg.enc_data_width,
            renorm=needs_int32_renorm(cfg, plan), window=win)
        surv_slots = cp.survivor_window_slots(cfg) if win else n_packs
        call = pl.pallas_call(
            kernel,
            grid=(tiles,),
            in_specs=[pl.BlockSpec((128, wpb), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((128, wph), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((n_emit, 128), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n_emit, b_pad), jnp.int32),
            scratch_shapes=[pltpu.VMEM((surv_slots, NUM_STATES, 128),
                                       jnp.int32),
                            pltpu.VMEM((n_packs, wpp, 128), jnp.int32)],
        )

        def kernel_only(*flat):
            tot = jnp.int32(0)
            for b, h in zip(flat[0::2], flat[1::2]):
                tot = tot + jnp.sum(call(b, h)[:, ::64], dtype=jnp.int32)
            return tot

        def full(*flat):
            tot = jnp.int32(0)
            for p, r in zip(flat[0::2], flat[1::2]):
                out = cp.decode_packed_pallas(p, cfg, plan, window=win)
                tot = tot + jnp.sum(jax.lax.population_count(out ^ r)
                                    .astype(jnp.int32))
            return tot

        kmulti_time(kernel_only, [(w[2], w[3]) for w in ws],
                    f"{label} kernel-only", stages)
        kmulti_time(full, [(w[0], w[1]) for w in ws],
                    f"{label} full", stages)
        del ws

    run_config(ChannelIn.SOFT8, 8192)
    run_config(ChannelIn.SOFT16, 4096)
    run_config(ChannelIn.SOFT16, 8192)
    return 0


if __name__ == "__main__":
    sys.exit(main())
