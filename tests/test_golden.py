"""Golden-model (oracle) validation: on noiseless channels the golden
decoder must recover the transmitted bits exactly — the property the
reference validates only end-to-end (SURVEY.md §4)."""

import numpy as np

from tpu_viterbi.chain.encode import conv_encode_np
from tpu_viterbi.decoder.golden import (golden_decode_block,
                                        golden_decode_full)

EXTRA_L = 26


def _noiseless_r(bits):
    coded = conv_encode_np(bits).astype(np.int64)
    sym = 2 * coded - 1  # BPSK
    return sym.reshape(-1, 2)


def test_golden_full_noiseless(rng):
    n = 1000
    bits = rng.integers(0, 2, n).astype(np.uint8)
    r = _noiseless_r(bits)
    m = (n - 64) // 32 * 32
    out = golden_decode_full(r, m)
    assert np.array_equal(out, bits[EXTRA_L: EXTRA_L + m])


def test_golden_block_noiseless(rng):
    dec_len = 128
    n = dec_len + 64
    bits = rng.integers(0, 2, n).astype(np.uint8)
    r = _noiseless_r(bits)
    out = golden_decode_block(r, dec_len)
    assert np.array_equal(out, bits[EXTRA_L: EXTRA_L + dec_len])


def test_golden_corrects_isolated_errors(rng):
    """Flip a few well-separated hard bits: the code (free distance 10) must
    correct them all."""
    n = 600
    bits = rng.integers(0, 2, n).astype(np.uint8)
    r = _noiseless_r(bits).copy()
    for pos in [100, 300, 500, 700, 900]:
        r[pos // 2, pos % 2] *= -1
    m = (n - 64) // 32 * 32
    out = golden_decode_full(r, m)
    assert np.array_equal(out, bits[EXTRA_L: EXTRA_L + m])


def test_golden_soft_beats_hard(rng):
    """At moderate noise, soft-decision metrics must yield <= the hard BER
    (sanity of the metric math)."""
    n = 4000
    bits = rng.integers(0, 2, n).astype(np.uint8)
    coded = conv_encode_np(bits).astype(np.float64)
    sym = 2 * coded - 1
    noisy = sym + rng.normal(0, 0.8, sym.shape)
    m = (n - 64) // 32 * 32
    # soft (scaled+quantized to int8-ish range)
    r_soft = np.clip(np.rint(noisy * 32), -128, 127).astype(
        np.int64).reshape(-1, 2)
    out_soft = golden_decode_full(r_soft, m)
    # hard
    r_hard = np.where(noisy > 0, 1, -1).astype(np.int64).reshape(-1, 2)
    out_hard = golden_decode_full(r_hard, m)
    ref = bits[EXTRA_L: EXTRA_L + m]
    ber_soft = np.count_nonzero(out_soft != ref)
    ber_hard = np.count_nonzero(out_hard != ref)
    assert ber_soft <= ber_hard
    assert ber_soft < 0.05 * m
