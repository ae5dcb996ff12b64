"""FP32 channel at production scale on TPU (VERDICT r1 item 4).

Validates the carve-out removals end to end on the chip:
  1. 128M-bit FP32 in-graph simulation with the fused Pallas generator
     (chain/genkernel.py _gen_kernel_f32) at 5.5 dB -> BEN 0, timed.
  2. 128M-bit FP32 host-free decode path sanity via the xla generator at
     the same size (flat two-stream workload + interleave matmul +
     two-stream kernel staging).
Reference contract: viterbiBM.cuh:128-153 (FP32 BMs at any n).

Usage: timeout 3600 python scripts/check_fp32_scale.py [message_bits]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

from tpu_viterbi.config import ChannelIn, DecoderConfig
from tpu_viterbi.sharding.mesh import make_block_mesh
from tpu_viterbi.sharding.simulate import build_sharded_simulation

T0 = time.time()


def log(s):
    print(f"+{time.time()-T0:6.1f}s {s}", flush=True)


def run(gen, n, snr=5.5, dec_len=4096):
    # dec_len 4096: the FP32 two-stream kernel's staged inputs are f32
    # values (2x the SOFT8 word bytes), so the production 8192 plan busts
    # the 16M scoped-vmem budget; 4096 fits (~13M) and keeps the halo
    # amortized
    cfg = DecoderConfig(channel_in=ChannelIn.FP32)
    mesh = make_block_mesh(jax.devices()[:1])
    fn, m = build_sharded_simulation(cfg, n, mesh, snr_db=snr,
                                     dec_len=dec_len, generator=gen)
    ben = int(np.asarray(jax.block_until_ready(
        fn(jax.random.PRNGKey(7)))))
    log(f"{gen}: compiled+first call done, BEN={ben} (m={m})")
    ts = []
    for i in range(3):
        t0 = time.perf_counter()
        np.asarray(fn(jax.random.PRNGKey(10 + i)))
        ts.append(time.perf_counter() - t0)
    log(f"{gen}: per-call {[f'{t*1e3:.1f}ms' for t in ts]} "
        f"(incl. dispatch floor)")
    return ben, m


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 128_000_000
    log(f"backend={jax.default_backend()} n={n}")
    ok = True
    for gen in ("pallas", "xla"):
        ben, m = run(gen, n)
        if ben != 0:
            log(f"FAIL: {gen} BEN={ben} != 0 at 5.5 dB")
            ok = False
    log("FP32 at scale OK" if ok else "FP32 at scale FAILED")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
