"""Random message-bit source (reference: src/viterbiDF.h:20-33, RandBitGen).

Uses the JAX counter-based PRNG (threefry) instead of mt19937 — parity with
the reference is statistical (same Bernoulli(1/2) bit stream), and the seed
is exposed for deterministic fixtures (reference: main.cpp:132 commented
fixed-seed mode).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .pipeline import ComputeElement


def random_bits(key: jax.Array, n: int) -> jax.Array:
    """(n,) uint8 array of uniform bits."""
    return jax.random.bernoulli(key, 0.5, (n,)).astype(jnp.uint8)


class RandBitGen(ComputeElement):
    def __init__(self, n: int, seed: int = 0):
        super().__init__()
        self.n = int(n)
        self.key = jax.random.PRNGKey(seed)

    def process(self, data):
        del data
        # split per call: repeated pipe.run() must draw fresh messages
        self.key, sub = jax.random.split(self.key)
        return random_bits(sub, self.n)
