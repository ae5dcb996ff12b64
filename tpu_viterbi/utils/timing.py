"""Kernel timing that survives high-latency remote backends.

The axon relay adds ~30ms of dispatch+fetch latency per call and memoizes
identical dispatches, so naive wall-clock timing of one call measures RPC,
not compute.  `time_in_graph` runs the function k times *inside one jitted
computation* (each iteration perturbing the input so no two iterations are
identical) and differences two repetition counts to cancel the fixed
overhead — the moral equivalent of the reference's cudaEvent boundary around
the kernel alone (reference: src/viterbi/viterbi.cu:224-232)."""

from __future__ import annotations

import time
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np


def _repeat_graph(fn: Callable, k: int):
    """Build jitted g(x) that runs fn k times with perturbed inputs and
    reduces every output to one scalar (forces full execution)."""

    @jax.jit
    def g(x):
        def body(i, acc):
            xi = jax.tree.map(
                lambda a: a + i.astype(a.dtype) if a.dtype != jnp.bool_
                else a, x)
            out = fn(xi)
            leaves = jax.tree_util.tree_leaves(out)
            s = acc
            for leaf in leaves:
                s = s + jnp.sum(leaf.astype(jnp.int64)
                                if leaf.dtype in (jnp.uint32, jnp.uint16)
                                else leaf).astype(jnp.float32)
            return s
        return jax.lax.fori_loop(0, k, body, jnp.float32(0.0))

    return g


def _run_fetch(g, x) -> float:
    t0 = time.perf_counter()
    np.asarray(g(x))
    return time.perf_counter() - t0


def time_in_graph(fn: Callable, x, k1: int = 1, k2: int = 4,
                  repeats: int = 3) -> float:
    """Seconds per single fn(x) execution, overhead-cancelled."""
    g1 = _repeat_graph(fn, k1)
    g2 = _repeat_graph(fn, k2)
    _run_fetch(g1, x)  # compile
    _run_fetch(g2, x)

    def perturb(x, j):
        # every timed dispatch must be first-seen: the relay memoizes
        # identical (program, input) pairs, so repeats need fresh inputs
        return jax.tree.map(
            lambda a: a if a.dtype == jnp.bool_
            else a + jnp.asarray(j + 1, a.dtype), x)

    best = float("inf")
    for j in range(repeats):
        xj = jax.block_until_ready(perturb(x, j))
        t1 = _run_fetch(g1, xj)
        t2 = _run_fetch(g2, xj)
        best = min(best, (t2 - t1) / (k2 - k1))
    return max(best, 1e-9)
