"""Bit packing/unpacking and BER accounting helpers.

Conventions follow the reference driver exactly: decoded output packs hold
the earliest bit in the MSB (reference: main.cpp:160 unpacks bit i as
word[i/bpp] >> (bpp-1 - i%bpp)), and decoded bit i corresponds to original
message bit i + extra_l (main.cpp:161).

A native C++ fast path for error counting lives in utils/native.py; these
NumPy versions are the portable fallback and the test reference.
"""

from __future__ import annotations

import numpy as np


def unpack_msb_first(words: np.ndarray, bits_per_pack: int) -> np.ndarray:
    """Packed words -> (n*bpp,) bits, earliest (MSB) first."""
    w = np.asarray(words).astype(np.int64) & ((1 << bits_per_pack) - 1)
    shifts = np.arange(bits_per_pack - 1, -1, -1)
    return ((w[:, None] >> shifts[None, :]) & 1).astype(np.uint8).reshape(-1)


def pack_msb_first(bits: np.ndarray, bits_per_pack: int) -> np.ndarray:
    """(n,) bits -> packed words, earliest bit in MSB."""
    bits = np.asarray(bits, dtype=np.int64).reshape(-1, bits_per_pack)
    shifts = np.arange(bits_per_pack - 1, -1, -1)
    words = (bits << shifts[None, :]).sum(axis=1)
    dtype = np.uint16 if bits_per_pack == 16 else np.uint32
    return words.astype(dtype)


def count_bit_errors(decoded_words: np.ndarray, bits_per_pack: int,
                     message_bits: np.ndarray, offset: int) -> int:
    """BEN: errors of the decoded stream vs message_bits[offset:...]
    (reference BER loop: main.cpp:151-171)."""
    from .native import native_count_bit_errors
    n = len(decoded_words) * bits_per_pack
    ref = np.asarray(message_bits[offset: offset + n], dtype=np.uint8)
    fast = native_count_bit_errors(decoded_words, bits_per_pack, ref)
    if fast is not None:
        return fast
    dec = unpack_msb_first(decoded_words, bits_per_pack)[: len(ref)]
    return int(np.count_nonzero(dec != ref))
