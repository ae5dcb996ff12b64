"""TPU qualification + timing for the fused Pallas workload generator.

1. Parity: on-chip kernel output must be bit-identical to interpret mode
   (the kernel is a deterministic function of (key, position)) for every
   integer channel, noisy and noiseless.
2. Slope timing at 128M bits vs the XLA chain (packed_workload).
"""

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from timing_util import slope  # noqa: E402

import numpy as np
import jax
import jax.numpy as jnp

from tpu_viterbi.chain.genkernel import packed_workload_pallas
from tpu_viterbi.chain.workload import packed_workload
from tpu_viterbi.config import ChannelIn

T0 = time.time()


def log(s):
    print(f"+{time.time()-T0:6.1f}s {s}", flush=True)


def check(channel, snr, n=100_000, scale=32.0):
    key = jax.random.PRNGKey(11)
    bp_t, w_t = packed_workload_pallas(key, n, channel, snr, scale)
    bp_i, w_i = packed_workload_pallas(key, n, channel, snr, scale,
                                       interpret=True)
    ok = (np.array_equal(np.asarray(bp_t), np.asarray(bp_i)) and
          np.array_equal(np.asarray(w_t), np.asarray(w_i)))
    log(f"{channel.name:6s} snr={snr}: "
        f"{'OK' if ok else 'MISMATCH'}")
    return ok


def main():
    ok = True
    for ch in (ChannelIn.HARD, ChannelIn.SOFT4, ChannelIn.SOFT8,
               ChannelIn.SOFT16):
        ok &= check(ch, 5.5)
    ok &= check(ChannelIn.SOFT8, math.inf)
    if not ok:
        print("FAILURES")
        return 1

    # ---- timing at 128M bits, SOFT8 5.5 dB ----
    N = 128_000_000
    keys = [jax.random.PRNGKey(100 + i) for i in range(8)]

    for name, rows in (("pallas r8", 8), ("pallas r32", 32),
                       ("pallas r64", 64)):
        def mk(k):
            return jax.jit(lambda *ks: sum(
                jnp.sum(packed_workload_pallas(
                    kk, N, ChannelIn.SOFT8, 5.5, 32.0, rows=rows)[1])
                for kk in ks))
        t = slope(mk, keys)
        log(f"{name:10s}: {t*1e3:6.2f} ms")

    def mk_xla(k):
        return jax.jit(lambda *ks: sum(
            jnp.sum(packed_workload(kk, N, ChannelIn.SOFT8, 5.5, 32.0)[1])
            for kk in ks))
    t = slope(mk_xla, keys)
    log(f"xla chain : {t*1e3:6.2f} ms")

    # ---- sharded entry on the 1-device mesh: parity + in-graph sim ----
    from tpu_viterbi.chain.genkernel import packed_workload_pallas_sharded
    from tpu_viterbi.config import DecoderConfig
    from tpu_viterbi.sharding.mesh import BLOCK_AXIS, make_block_mesh
    from tpu_viterbi.sharding.simulate import build_sharded_simulation

    mesh = make_block_mesh(jax.devices()[:1])
    key = jax.random.PRNGKey(11)
    n = 1_000_000
    bp_l, w_l = packed_workload_pallas(key, n, ChannelIn.SOFT8, 5.5, 32.0)
    bp_s, w_s = jax.jit(lambda k: packed_workload_pallas_sharded(
        k, n, ChannelIn.SOFT8, 5.5, 32.0, mesh, BLOCK_AXIS))(key)
    ok = (np.array_equal(np.asarray(bp_s)[: bp_l.shape[0]],
                         np.asarray(bp_l)) and
          np.array_equal(np.asarray(w_s)[: w_l.shape[0]], np.asarray(w_l)))
    log(f"sharded(1-dev mesh) vs local: {'OK' if ok else 'MISMATCH'}")
    if not ok:
        return 1

    cfg = DecoderConfig(channel_in=ChannelIn.SOFT8)
    for gen_name in ("pallas", "xla"):
        fn, m = build_sharded_simulation(cfg, N, mesh, snr_db=5.5,
                                         generator=gen_name)
        def mk(k):
            return jax.jit(lambda *ks: sum(fn(kk) for kk in ks))
        t = slope(mk, keys)
        log(f"in-graph sim {gen_name:6s}: {t*1e3:6.2f} ms "
            f"({m / t / 1e9:.2f} Gb/s e2e)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
