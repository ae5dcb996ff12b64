"""Shared slope-timing helper for the TPU probe scripts.

The axon relay adds a fluctuating ~25-35 ms dispatch+fetch floor and
memoizes identical dispatches, so: (a) never time a single dispatch and
floor-subtract, (b) every timed dispatch must see first-seen inputs.
slope() times the same computation at two workload counts and returns the
per-item difference, which cancels the floor exactly.
"""

import time

import numpy as np


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
