"""A/B the generator's dedup'd encoder-window path (fast_window) against
the naive per-word threefry recompute, on chip, in ONE process (k-multi
slope over distinct keys; the relay memoizes identical dispatches).

Also verifies the two paths produce bit-identical outputs first.

Usage: timeout 2400 python scripts/genwin_ab.py [message_bits]
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


def main():
    from tpu_viterbi.chain.genkernel import packed_workload_pallas
    from tpu_viterbi.config import ChannelIn

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 128_000_000
    log(f"backend={jax.default_backend()}  n={n}")

    def make(fast):
        def f(key):
            bits, words = packed_workload_pallas(
                key, n, ChannelIn.SOFT8, 5.5, 32.0, fast_window=fast)
            return jnp.sum(bits) + jnp.sum(words)

        def fk(*keys):
            return sum(f(k) for k in keys)
        return fk

    # bit-exactness first (sums alone could mask reorders; compare fully
    # at a small n)
    small = 4_000_000
    b1, w1 = packed_workload_pallas(jax.random.PRNGKey(9), small,
                                    ChannelIn.SOFT8, 5.5, 32.0,
                                    fast_window=True)
    b2, w2 = packed_workload_pallas(jax.random.PRNGKey(9), small,
                                    ChannelIn.SOFT8, 5.5, 32.0,
                                    fast_window=False)
    same = (np.array_equal(np.asarray(b1), np.asarray(b2)) and
            np.array_equal(np.asarray(w1), np.asarray(w2)))
    log(f"bit-exact fast-vs-naive @4M: {'OK' if same else 'MISMATCH'}")
    if not same:
        return 1

    k_hi = 4
    keys = [jax.random.PRNGKey(100 + i) for i in range(k_hi + 4)]
    results = {}
    for fast in (True, False):
        j1 = jax.jit(make(fast))
        jh = jax.jit(make(fast))
        np.asarray(j1(keys[0]))
        np.asarray(jh(*keys[:k_hi]))
        tl, th = [], []
        nk = len(keys)
        for j in range(4):
            t0 = time.perf_counter()
            np.asarray(j1(keys[1 + (j % (nk - 1))]))
            tl.append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            np.asarray(jh(*(keys[(j + 2 + i) % nk] for i in range(k_hi))))
            th.append(time.perf_counter() - t0)
        s = (min(th) - min(tl)) / (k_hi - 1)
        results[fast] = s
        log(f"fast_window={fast}: {s*1e3:7.2f} ms/gen "
            f"(t1={[f'{x*1e3:.1f}' for x in tl]} "
            f"tk={[f'{x*1e3:.1f}' for x in th]})")
    f, nf = results[True], results[False]
    log(f"verdict: fast {f*1e3:.2f} vs naive {nf*1e3:.2f} ms "
        f"({'fast wins' if f < nf else 'NEGATIVE'}, "
        f"{(nf-f)*1e3:+.2f} ms)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
