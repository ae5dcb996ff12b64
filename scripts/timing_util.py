"""Shared slope-timing helper for the TPU probe scripts.

The axon relay adds a fluctuating ~25-35 ms dispatch+fetch floor and
memoizes identical dispatches, so: (a) never time a single dispatch and
floor-subtract, (b) every timed dispatch must see first-seen inputs.
slope() times the same computation at two workload counts and returns the
per-item difference, which cancels the floor exactly.
"""

import time

import numpy as np


def amplified_slope(make_k, xs, K, reps=3):
    """Fori-amplified slope for sub-ms computations (the k-multi
    differential vanishes inside the relay's ~ms dispatch jitter below
    ~8M bits): make_k(k) -> jitted fn of ONE staged input that runs the
    computation k times on in-graph-perturbed variants (x + i, distinct
    every iteration); returns (t_K - t_1)/(K - 1) seconds per iteration.

    Memoization safety: f_1 and f_K are DISTINCT programs, so each may
    rotate through the same inputs — but within a program every timed
    dispatch must be first-seen.  xs[0] warms both programs; timed reps
    walk xs[1], xs[2], ... so ``len(xs) >= reps + 1`` is required.  (The
    first versions of the sweep scripts re-derived this rotation ad hoc
    and re-dispatched the warmup input, collapsing min() to the memoized
    floor — the exact corruption this helper exists to prevent.)

    The returned slope is NOT clamped: under relay jitter it can come out
    <= 0, and callers must flag such rows instead of publishing them."""
    if len(xs) < reps + 1:
        raise ValueError(f"need >= reps+1 = {reps + 1} distinct staged "
                         f"inputs, got {len(xs)}")
    f1, fK = make_k(1), make_k(K)
    np.asarray(f1(xs[0]))                  # compile + warm
    np.asarray(fK(xs[0]))
    t1s, tKs = [], []
    for j in range(reps):
        t0 = time.perf_counter()
        np.asarray(f1(xs[1 + j]))
        t1s.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        np.asarray(fK(xs[1 + j]))
        tKs.append(time.perf_counter() - t0)
    return (min(tKs) - min(t1s)) / (K - 1)


def slope(make_k, xs, reps=4, ks=(1, 5)):
    """make_k(k) -> jitted fn of k inputs; returns per-item seconds.

    xs must hold >= ks[1] + 2 distinct pre-staged inputs; the rotating
    (j + offset + i) % n indexing keeps every timed dispatch's input tuple
    first-seen across reps."""
    f_lo, f_hi = make_k(ks[0]), make_k(ks[1])
    np.asarray(f_lo(*xs[:ks[0]]))          # compile + warm
    np.asarray(f_hi(*xs[:ks[1]]))
    t_lo, t_hi = [], []
    n = len(xs)
    for j in range(reps):
        t0 = time.perf_counter()
        np.asarray(f_lo(*(xs[(j + 1 + i) % n] for i in range(ks[0]))))
        t_lo.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        np.asarray(f_hi(*(xs[(j + 2 + i) % n] for i in range(ks[1]))))
        t_hi.append(time.perf_counter() - t0)
    return (min(t_hi) - min(t_lo)) / (ks[1] - ks[0])
