"""BPSK map + AWGN channel (reference: src/viterbiDF.h:66-95, AddNoise).

Conventions kept exactly:
  - BPSK: bit 1 -> +1.0, bit 0 -> -1.0 (viterbiDF.h:81-92);
  - noise stddev sigma = 10^(-SNR/5), the project's own SNR convention set by
    the driver (main.cpp:135);
  - sigma = inf means noiseless passthrough (viterbiDF.h:79-85).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from .pipeline import ComputeElement


def snr_to_sigma(snr_db: float) -> float:
    """sigma = 10^(-SNR/5) (reference: main.cpp:135)."""
    return float(10.0 ** (-snr_db / 5.0))


def bpsk(bits: jnp.ndarray) -> jnp.ndarray:
    return bits.astype(jnp.float32) * 2.0 - 1.0


def add_awgn(key: jax.Array, coded_bits: jnp.ndarray,
             sigma: float) -> jnp.ndarray:
    """Map coded bits to +-1.0 and add N(0, sigma^2); sigma in {0, inf}
    disables noise."""
    symbols = bpsk(coded_bits)
    if sigma == 0.0 or math.isinf(sigma):
        return symbols
    noise = jax.random.normal(key, symbols.shape, dtype=jnp.float32) * sigma
    return symbols + noise


class AddNoise(ComputeElement):
    def __init__(self, sigma: float = math.inf, seed: int = 0):
        super().__init__()
        self.sigma = float(sigma)
        self.key = jax.random.PRNGKey(seed)

    def process(self, coded_bits):
        # split per call: repeated pipe.run() must draw fresh noise, or a
        # multi-run BER sweep accumulates N copies of one realization
        self.key, sub = jax.random.split(self.key)
        return add_awgn(sub, coded_bits, self.sigma)
