"""Where does the ~1.25 ms between the raw kernel (6.05 ms prestaged) and
the full decode (7.30 ms) go at the 32M SOFT8 bench config?

soft16_pieces.py showed the production pallas_call on PRE-STAGED body/halo
runs 23.6 ns/stage while the full path runs 28.5 — r2's bench_profile
attribution hid the staging cost inside its "kernel" row because its kraw
built body/halo in-graph too.  Suspects: the last-block patch
(body.at[B-1].set -> a full copy of the 64 MB body, because body is a
bitcast of the input and cannot be donated), the halo construction
(overlapped_windows), and the output assemble/check.

Variants (same process, k-multi slope, raw-sum consumer):

  pre        — kernel on prestaged body/halo (baseline)
  graph      — in-graph staging + kernel, overlap_bits > 0 (patch ACTIVE)
  graph0     — in-graph staging + kernel at message_len' = B*dec_len
               (overlap_bits == 0: NO patch, same size/tiles)
  full       — decode_packed_pallas + popcount check (the bench path)
  full0      — same at message_len' (no patch)

graph - graph0 = the patch copy.  graph0 - pre = halo build + input copy.
full - graph = assemble + check.

Usage: timeout 3600 python scripts/staging_cost.py [message_bits]
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

    from tpu_viterbi.config import NUM_STATES, ChannelIn, DecoderConfig
    from tpu_viterbi.decoder import core_pallas as cp
    from tpu_viterbi.decoder.core_xla import plan_blocks

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 32_000_000
    dl = 8192
    cfg = DecoderConfig(channel_in=ChannelIn.SOFT8)
    m = cfg.get_message_len(2 * n)
    plan = plan_blocks(m, 32, dl)
    m0 = (plan.num_blocks - 1) * dl          # overlap_bits == 0 plan
    plan0 = plan_blocks(m0, 32, dl)
    assert plan0.overlap_bits == 0
    log(f"device={jax.devices()[0]}  m={m} (ov={plan.overlap_bits})  "
        f"m0={m0} (ov=0)")

    def build_call(p):
        b_pad = -(-p.num_blocks // 128) * 128
        bpp = p.bits_per_pack
        n_conv = -(-(cfg.extra_r - bpp) // bpp)
        n_emit = p.dec_len // bpp
        wpb = 2 * p.dec_len // cfg.enc_data_per_pack
        wph = 2 * 64 // cfg.enc_data_per_pack
        wpp = (wpb + wph) // p.n_packs
        kernel = functools.partial(
            cp._viterbi_kernel_fused, n_packs=p.n_packs, bpp=bpp,
            n_conv=n_conv, n_emit=n_emit, vpw=cfg.enc_data_per_pack,
            width=cfg.enc_data_width)
        return pl.pallas_call(
            kernel,
            grid=(b_pad // 128,),
            in_specs=[pl.BlockSpec((128, wpb), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((128, wph), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((n_emit, 128), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n_emit, b_pad), jnp.int32),
            scratch_shapes=[pltpu.VMEM((p.n_packs, NUM_STATES, 128),
                                       jnp.int32),
                            pltpu.VMEM((p.n_packs, wpp, 128), jnp.int32)],
        ), b_pad

    call, b_pad = build_call(plan)
    call0, b_pad0 = build_call(plan0)
    n_words = cfg.get_input_words(2 * n)
    gen = jax.jit(lambda k: jax.random.randint(
        k, (n_words,), -2 ** 31, 2 ** 31 - 1, dtype=jnp.int32))
    xs = [gen(jax.random.PRNGKey(i)) for i in range(7)]
    jax.block_until_ready(xs)

    @jax.jit
    def mk_staged(x):
        return cp._block_major_words(x, cfg, plan0, b_pad0)
    st = [jax.block_until_ready(mk_staged(x)) for x in xs]

    def kslope(name, fn, inputs, stages, reps=5, k_hi=4):
        j1, jh = jax.jit(fn), jax.jit(fn)
        flat = lambda t: [x for tup in t for x in tup]
        np.asarray(j1(*flat(inputs[:1])))
        np.asarray(jh(*flat(inputs[:k_hi])))
        mm = len(inputs)
        tl, th = [], []
        for j in range(reps):
            t0 = time.perf_counter()
            np.asarray(j1(*flat([inputs[1 + (j % (mm - 1))]])))
            tl.append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            np.asarray(jh(*flat([inputs[(j + 2 + i) % mm]
                                 for i in range(k_hi)])))
            th.append(time.perf_counter() - t0)
        s = (min(th) - min(tl)) / (k_hi - 1)
        log(f"{name:8s} {s*1e3:7.2f} ms  {s*1e9/stages:6.2f} ns/stage")
        return s

    stages = (b_pad // 128) * plan.n_packs * 32
    stages0 = (b_pad0 // 128) * plan0.n_packs * 32

    def pre(*flat):
        return sum(jnp.sum(call0(b, h)[:, ::64], dtype=jnp.int32)
                   for b, h in zip(flat[0::2], flat[1::2]))

    def graph(*xs_):
        tot = jnp.int32(0)
        for x in xs_:
            body, halo = cp._block_major_words(x, cfg, plan, b_pad)
            tot += jnp.sum(call(body, halo)[:, ::64], dtype=jnp.int32)
        return tot

    def graph0(*xs_):
        tot = jnp.int32(0)
        for x in xs_:
            body, halo = cp._block_major_words(x, cfg, plan0, b_pad0)
            tot += jnp.sum(call0(body, halo)[:, ::64], dtype=jnp.int32)
        return tot

    def full(*xs_):
        tot = jnp.int32(0)
        for x in xs_:
            out = cp.decode_packed_pallas(x, cfg, plan)
            tot += jnp.sum(jax.lax.population_count(out).astype(jnp.int32))
        return tot

    def full0(*xs_):
        tot = jnp.int32(0)
        for x in xs_:
            out = cp.decode_packed_pallas(x, cfg, plan0)
            tot += jnp.sum(jax.lax.population_count(out).astype(jnp.int32))
        return tot

    # input PRE-PADDED to `need` so _block_major_words takes its no-concat
    # path: isolates the pad-concat copy of the full stream
    wpb = 2 * dl // cfg.enc_data_per_pack
    wph = 2 * 64 // cfg.enc_data_per_pack
    need = b_pad * wpb + wpb + wph
    genp = jax.jit(lambda k: jax.random.randint(
        k, (need,), -2 ** 31, 2 ** 31 - 1, dtype=jnp.int32))
    xp = [genp(jax.random.PRNGKey(50 + i)) for i in range(7)]
    jax.block_until_ready(xp)

    def graphP(*xs_):
        tot = jnp.int32(0)
        for x in xs_:
            body, halo = cp._block_major_words(x, cfg, plan, b_pad)
            tot += jnp.sum(call(body, halo)[:, ::64], dtype=jnp.int32)
        return tot

    # ---- views variant: zero staging work ----
    # body = bitcast reshape of the padded stream; halo = the SAME stream
    # shifted one block-row, reshaped (b_pad, wpb), with the kernel's halo
    # BlockSpec reading only the first wph columns of each 128-row block.
    # No patch (last block wrong for this probe — timing only).
    def build_call_views(p):
        b_pad_ = -(-p.num_blocks // 128) * 128
        bpp = p.bits_per_pack
        n_conv = -(-(cfg.extra_r - bpp) // bpp)
        n_emit = p.dec_len // bpp
        wpp = (wpb + wph) // p.n_packs
        kernel = functools.partial(
            cp._viterbi_kernel_fused, n_packs=p.n_packs, bpp=bpp,
            n_conv=n_conv, n_emit=n_emit, vpw=cfg.enc_data_per_pack,
            width=cfg.enc_data_width)
        return pl.pallas_call(
            kernel,
            grid=(b_pad_ // 128,),
            in_specs=[pl.BlockSpec((128, wpb), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((128, 128), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((n_emit, 128), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n_emit, b_pad_), jnp.int32),
            scratch_shapes=[pltpu.VMEM((p.n_packs, NUM_STATES, 128),
                                       jnp.int32),
                            pltpu.VMEM((p.n_packs, wpp, 128), jnp.int32)],
        )

    callV = build_call_views(plan)

    def views(*xs_):
        tot = jnp.int32(0)
        for x in xs_:                       # x pre-padded to `need`
            body = x[: b_pad * wpb].reshape(b_pad, wpb)
            halo = x[wpb: (b_pad + 1) * wpb].reshape(b_pad, wpb)
            tot += jnp.sum(callV(body, halo)[:, ::64], dtype=jnp.int32)
        return tot

    # ---- roll variant: body bitcast ONLY; halo packs derived in-kernel
    # from the body transpose by a -1 lane roll (tile-edge lane left
    # garbage — timing probe only; production adds a tiny per-tile edge
    # input).  Zero XLA-side staging.
    def _kernel_roll(body_ref, out_ref, surv_ref, words_ref, *, n_packs,
                     bpp, n_conv, n_emit, vpw, width):
        lt = out_ref.shape[1]
        wpp_ = words_ref.shape[1]
        nb = body_ref.shape[1] // wpp_
        words_ref[:nb] = body_ref[...].T.reshape(nb, wpp_, lt)
        for j in range(n_packs - nb):
            words_ref[nb + j] = pltpu.roll(words_ref[j], 127, 1)
        cp._viterbi_kernel(words_ref, out_ref, surv_ref, n_packs=n_packs,
                           bpp=bpp, n_conv=n_conv, n_emit=n_emit,
                           is_float=False, vpw=vpw, width=width)

    def build_call_roll(p):
        b_pad_ = -(-p.num_blocks // 128) * 128
        bpp = p.bits_per_pack
        n_conv = -(-(cfg.extra_r - bpp) // bpp)
        n_emit = p.dec_len // bpp
        wpp_ = (wpb + wph) // p.n_packs
        kernel = functools.partial(
            _kernel_roll, n_packs=p.n_packs, bpp=bpp,
            n_conv=n_conv, n_emit=n_emit, vpw=cfg.enc_data_per_pack,
            width=cfg.enc_data_width)
        return pl.pallas_call(
            kernel,
            grid=(b_pad_ // 128,),
            in_specs=[pl.BlockSpec((128, wpb), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((n_emit, 128), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n_emit, b_pad_), jnp.int32),
            scratch_shapes=[pltpu.VMEM((p.n_packs, NUM_STATES, 128),
                                       jnp.int32),
                            pltpu.VMEM((p.n_packs, wpp_, 128), jnp.int32)],
        )

    callR = build_call_roll(plan)

    def rollv(*xs_):
        tot = jnp.int32(0)
        for x in xs_:
            body = x[: b_pad * wpb].reshape(b_pad, wpb)
            tot += jnp.sum(callR(body)[:, ::64], dtype=jnp.int32)
        return tot

    t_pre = kslope("pre", pre, st, stages0)
    t_r = kslope("roll", rollv, [(x,) for x in xp], stages)
    t_v = kslope("views", views, [(x,) for x in xp], stages)
    t_gp = kslope("graphP", graphP, [(x,) for x in xp], stages)
    t_g = kslope("graph", graph, [(x,) for x in xs], stages)
    t_g0 = kslope("graph0", graph0, [(x,) for x in xs], stages0)
    t_f = kslope("full", full, [(x,) for x in xs], stages)
    t_f0 = kslope("full0", full0, [(x,) for x in xs], stages0)
    log("---- attribution ----")
    log(f"patch copy (graph-graph0)   {(t_g-t_g0)*1e3:6.2f} ms")
    log(f"pad-concat (graph-graphP)   {(t_g-t_gp)*1e3:6.2f} ms")
    log(f"halo+input (graphP-pre)     {(t_gp-t_pre)*1e3:6.2f} ms")
    log(f"assemble+check (full-graph) {(t_f-t_g)*1e3:6.2f} ms")
    log(f"full0 vs full               {(t_f-t_f0)*1e3:6.2f} ms")
    return 0


if __name__ == "__main__":
    sys.exit(main())
