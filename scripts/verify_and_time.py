"""One-process kernel qualification: golden bit-exactness at small scale,
then 32M-bit kernel timing (compiles paid once, no persistent cache on this
backend)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from tpu_viterbi.config import ChannelIn, DecoderConfig
from tpu_viterbi.decoder import core_pallas
from tpu_viterbi.decoder.core_xla import plan_blocks
from tpu_viterbi.decoder.golden import golden_decode_block
from tpu_viterbi.utils.bits import unpack_msb_first

T0 = time.time()


def log(s):
    print(f"+{time.time()-T0:6.1f}s {s}", flush=True)


def golden_check():
    cfg = DecoderConfig(channel_in=ChannelIn.SOFT8)
    dec_len, b = 96, 130
    m = dec_len * b
    plan = plan_blocks(m, cfg.bits_per_pack, dec_len)
    rng = np.random.default_rng(7)
    r = rng.integers(-100, 101, size=(m + 64, 2)).astype(np.int32)
    out = np.asarray(core_pallas.decode_blocks_pallas(
        jnp.asarray(r), cfg, plan))
    bits = unpack_msb_first(out, cfg.bits_per_pack)
    bad = 0
    for k, off in enumerate(plan.offsets()):
        want = golden_decode_block(r[off:off + dec_len + 64].astype(np.int64),
                                   dec_len)
        lo = plan.overlap_bits if k == plan.num_blocks - 1 else 0
        n = len(want) if k == plan.num_blocks - 1 else min(
            len(want), max(0, (m - dec_len) - off))
        if not np.array_equal(bits[off + lo: off + n], want[lo:n]):
            bad += 1
    log(f"golden check: {'OK' if bad == 0 else f'{bad} BAD BLOCKS'}")
    return bad == 0


def time_32m():
    m = 32_000_000
    cfg = DecoderConfig(channel_in=ChannelIn.SOFT8)
    plan = plan_blocks(m, 32, 2048)
    lt = core_pallas.LANE_TILE
    b_pad = -(-plan.num_blocks // lt) * lt
    n_words = 2 * (m + 64) // cfg.enc_data_per_pack

    gen = jax.jit(lambda k: jax.random.randint(
        k, (n_words,), -(2 ** 20), 2 ** 20, dtype=jnp.int32))
    stage = jax.jit(
        lambda x: core_pallas._stage_layout_packed(x, cfg, plan, b_pad))
    kern = jax.jit(lambda rs: jnp.sum(
        core_pallas._run_kernel(rs, cfg, plan, lt).view(jnp.int32)))
    nul = jax.jit(lambda rs: jnp.sum(rs[0, 0, 0]))

    rss = [stage(gen(jax.random.PRNGKey(i))) for i in range(4)]
    np.asarray(sum(jnp.sum(r[0, 0]) for r in rss))
    log("inputs staged")

    np.asarray(nul(rss[0]))
    floors = []
    for r in rss:
        t0 = time.perf_counter()
        np.asarray(nul(r))
        floors.append(time.perf_counter() - t0)
    floor = min(floors)
    log(f"floor={floor*1e3:.1f}ms")

    np.asarray(kern(rss[0]))  # compile
    ts = []
    for r in rss[1:]:
        t0 = time.perf_counter()
        np.asarray(kern(r))
        ts.append(time.perf_counter() - t0)
    t = min(ts) - floor
    log(f"kernel 32M: raw={[f'{x*1e3:.0f}ms' for x in ts]} floor-adj="
        f"{t*1e3:.1f}ms -> {m/t/1e9:.2f} Gb/s  "
        f"({t*1e9/(b_pad//lt)/plan.n_packs/32:.0f} ns/stage/tile)")


if __name__ == "__main__":
    ok = golden_check()
    time_32m()
    sys.exit(0 if ok else 1)
