"""Feasibility probe for the fused Pallas workload-generation kernel:

1. threefry2x32-20 implemented with int32 vector ops — verify against
   JAX's own threefry_2x32 (numpy path) and check Mosaic lowers it.
2. f32 log/sqrt inside a Pallas kernel (needed for the normal transform)
   — lowering + numeric check vs XLA.
3. Throughput estimate for the threefry inner loop.

Run on CPU (interpret semantics via real backend check is TPU):
  env PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python scripts/genkernel_probe.py --interpret
On TPU: python scripts/genkernel_probe.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

INTERPRET = "--interpret" in sys.argv

# the production implementation under probe — keep a single copy of the
# rotation schedule and round loop
from tpu_viterbi.chain.genkernel import threefry2x32  # noqa: E402


def tf_kernel(c_ref, o0_ref, o1_ref, *, k0, k1):
    x0, x1 = threefry2x32(jnp.int32(k0), jnp.int32(k1), c_ref[0], c_ref[1])
    o0_ref[...] = x0
    o1_ref[...] = x1


def log_kernel(x_ref, o_ref):
    x = x_ref[...]
    o_ref[...] = jnp.log(x) + jnp.sqrt(x)


def main():
    R, L = 8, 128
    c0 = np.arange(R * L, dtype=np.uint32).reshape(R, L)
    c1 = np.full((R, L), 7, np.uint32)
    k0, k1 = 0xDEADBEEF, 0x12345678

    # ---- ground truth via jax's own threefry (XLA path) ----
    from jax._src.prng import threefry_2x32
    key = jnp.array([k0, k1], dtype=jnp.uint32)
    want = threefry_2x32(key, jnp.stack([jnp.asarray(c0).ravel(),
                                         jnp.asarray(c1).ravel()]))
    w0 = np.asarray(want[0]).reshape(R, L)
    w1 = np.asarray(want[1]).reshape(R, L)

    import functools
    got0, got1 = pl.pallas_call(
        functools.partial(tf_kernel, k0=np.int32(np.uint32(k0).view(np.int32)),
                          k1=np.int32(np.uint32(k1).view(np.int32))),
        out_shape=[jax.ShapeDtypeStruct((R, L), jnp.int32)] * 2,
        interpret=INTERPRET,
    )(jnp.stack([jnp.asarray(c0).view(np.int32),
                 jnp.asarray(c1).view(np.int32)]).astype(jnp.int32))
    ok0 = np.array_equal(np.asarray(got0).view(np.uint32), w0)
    ok1 = np.array_equal(np.asarray(got1).view(np.uint32), w1)
    print(f"threefry2x32 parity vs jax: x0 {'OK' if ok0 else 'MISMATCH'}, "
          f"x1 {'OK' if ok1 else 'MISMATCH'}", flush=True)
    if not (ok0 and ok1):
        print("first rows:", np.asarray(got0).view(np.uint32)[0, :4], w0[0, :4])

    # ---- f32 log/sqrt in-kernel ----
    x = np.linspace(0.01, 9.0, R * L, dtype=np.float32).reshape(R, L)
    got = pl.pallas_call(
        log_kernel, out_shape=jax.ShapeDtypeStruct((R, L), jnp.float32),
        interpret=INTERPRET,
    )(jnp.asarray(x))
    want = np.log(x) + np.sqrt(x)
    err = np.max(np.abs(np.asarray(got) - want) / np.maximum(np.abs(want), 1e-3))
    print(f"log+sqrt in-kernel: max rel err {err:.2e}", flush=True)

    if INTERPRET:
        return

    # ---- throughput: threefry chain over a big grid ----
    def many_kernel(c_ref, o_ref, *, k0, k1, reps):
        acc = jnp.zeros_like(c_ref[0])
        c0v, c1v = c_ref[0], c_ref[1]
        for r in range(reps):
            x0, x1 = threefry2x32(jnp.int32(k0), jnp.int32(k1),
                                  c0v + jnp.int32(r), c1v)
            acc = acc ^ x0 ^ x1
        o_ref[...] = acc

    RB, G = 256, 64
    cbig = jnp.stack([
        jax.lax.broadcasted_iota(jnp.int32, (G * RB, L), 0),
        jnp.full((G * RB, L), 3, jnp.int32)])
    for reps in (4, 8):
        f = pl.pallas_call(
            functools.partial(many_kernel, k0=1, k1=2, reps=reps),
            grid=(G,),
            in_specs=[pl.BlockSpec((2, RB, L), lambda i: (0, i, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((RB, L), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((G * RB, L), jnp.int32),
        )
        jf = jax.jit(lambda c: jnp.sum(f(c)))
        np.asarray(jf(cbig))
        ts = []
        for j in range(4):
            t0 = time.perf_counter()
            np.asarray(jf(cbig + jnp.int32(j + 1)))
            ts.append(time.perf_counter() - t0)
        calls = G * RB * L * reps
        print(f"reps={reps}: best {min(ts)*1e3:.2f} ms for {calls/1e6:.1f}M "
              f"threefry calls", flush=True)


if __name__ == "__main__":
    main()
