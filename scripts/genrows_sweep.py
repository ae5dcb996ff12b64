"""Sweep EFFECTIVE generator rows per channel (ADVICE r1): _plan rounds
the requested rows up to a multiple of 8*wpl, so the meaningful sweep
values differ per channel — SOFT8 {128, 256, 512}, SOFT16 {256, 512},
HARD/SOFT4 {64, 128, 256}.  k-multi slope per config (distinct keys per
dispatch; the relay memoizes).

Usage: timeout 2400 python scripts/genrows_sweep.py [message_bits]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from tpu_viterbi.chain.genkernel import packed_workload_pallas
from tpu_viterbi.config import ChannelIn

T0 = time.time()


def log(s):
    print(f"+{time.time()-T0:6.1f}s {s}", flush=True)


def time_rows(channel, rows, n, reps=3, k=5):
    def gen_k(*keys):
        acc = jnp.int32(0)
        for key in keys:
            bits, words = packed_workload_pallas(
                key, n, channel, 4.0, 32.0, rows=rows)
            acc = acc + jnp.sum(bits[::64]) + jnp.sum(
                words[::512].astype(jnp.int32))
        return acc
    j1, jk = jax.jit(gen_k), jax.jit(gen_k)
    keys = [jax.random.PRNGKey(100 * rows + i) for i in range(k + 3)]
    np.asarray(j1(keys[0]))
    np.asarray(jk(*keys[:k]))
    tl, th = [], []
    for j in range(reps):
        t0 = time.perf_counter()
        np.asarray(j1(keys[(j + 1) % len(keys)]))
        tl.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        np.asarray(jk(*(keys[(j + 2 + i) % len(keys)] for i in range(k))))
        th.append(time.perf_counter() - t0)
    t = (min(th) - min(tl)) / (k - 1)
    log(f"{channel.name:6s} rows={rows:4d}: {t*1e3:7.2f} ms "
        f"({n/t/1e9:.1f} Gbit/s gen)")
    return t


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 32_000_000
    log(f"backend={jax.default_backend()} n={n}")
    sweeps = {
        ChannelIn.SOFT8: (128, 256, 512),
        ChannelIn.SOFT16: (256, 512),
        ChannelIn.HARD: (64, 128, 256),
        ChannelIn.SOFT4: (64, 128, 256),
        ChannelIn.FP32: (512, 1024),
    }
    best = {}
    for ch, rows_list in sweeps.items():
        ts = {r: time_rows(ch, r, n) for r in rows_list}
        best[ch.name] = min(ts, key=ts.get)
    log(f"best rows per channel: {best}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
