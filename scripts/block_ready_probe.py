"""Pin down jax.block_until_ready semantics on the axon relay backend.

Hypothesis from gen_cost_probe: block_until_ready on a relay output may
return before execution completes (raw "times" of 1-4 ms at 128M bits,
below the ~25-35 ms dispatch floor).  If true, any harness that uses
block_until_ready as a pre-timing barrier (bench.py's workload setup)
could leak setup work into the timed window.

Method: run an expensive fresh-input computation, (a) time
block_until_ready(y), then (b) time np.asarray(y) immediately after.  If
block_until_ready really waits, (b) is pure fetch (~floor or less); if it
returns early, (b) absorbs the execution time.  Tested for a scalar
output and a large-array output.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

N = 128_000_000

scalar_f = jax.jit(lambda k: jnp.sum(
    jax.random.normal(k, (N,), dtype=jnp.float32)))
array_f = jax.jit(lambda k: jax.random.normal(k, (N,), jnp.float32)
                  .reshape(-1, 1024).sum(axis=1))  # 125k floats out

for name, f in (("scalar", scalar_f), ("array", array_f)):
    np.asarray(f(jax.random.PRNGKey(0)))          # compile + warm
    for j in range(3):
        y = f(jax.random.PRNGKey(100 * (j + 1)))
        t0 = time.perf_counter()
        jax.block_until_ready(y)
        t_block = time.perf_counter() - t0
        t0 = time.perf_counter()
        np.asarray(y)
        t_fetch = time.perf_counter() - t0
        print(f"{name}: block_until_ready {t_block*1e3:7.1f} ms   "
              f"then fetch {t_fetch*1e3:7.1f} ms", flush=True)
