"""Native C++ BER accounting (csrc/host_ops.cpp via ctypes) must agree
bit-for-bit with the NumPy reference implementation, including ragged
tails where the ground-truth bit stream is shorter than the decoded words."""

import numpy as np
import pytest

from tpu_viterbi.utils.bits import unpack_msb_first
from tpu_viterbi.utils.native import get_lib, native_count_bit_errors


def _numpy_count(words, bpp, ref_bits):
    dec = unpack_msb_first(words, bpp)[: len(ref_bits)]
    return int(np.count_nonzero(dec != ref_bits[: len(dec)]))


@pytest.mark.skipif(get_lib() is None,
                    reason="native toolchain unavailable")
@pytest.mark.parametrize("bpp", [32, 16])
@pytest.mark.parametrize("n_words,n_bits_off", [(100, 0), (100, -7), (1, 0),
                                                (3, -1)])
def test_native_matches_numpy(rng, bpp, n_words, n_bits_off):
    dtype = np.uint32 if bpp == 32 else np.uint16
    words = rng.integers(0, 2 ** bpp, size=n_words).astype(dtype)
    n_bits = n_words * bpp + n_bits_off
    ref = rng.integers(0, 2, size=n_bits).astype(np.uint8)
    got = native_count_bit_errors(words, bpp, ref)
    assert got is not None
    assert got == _numpy_count(words, bpp, ref)


@pytest.mark.skipif(get_lib() is None,
                    reason="native toolchain unavailable")
def test_native_zero_errors(rng):
    from tpu_viterbi.utils.bits import pack_msb_first
    bits = rng.integers(0, 2, size=320).astype(np.uint8)
    words = pack_msb_first(bits, 32)
    assert native_count_bit_errors(words, 32, bits) == 0
    flipped = bits.copy()
    flipped[::37] ^= 1
    assert (native_count_bit_errors(words, 32, flipped)
            == int(np.count_nonzero(bits != flipped)))


def test_native_quantize_pack_matches_jnp():
    import jax.numpy as jnp
    from tpu_viterbi.chain.quantize import quantize_and_pack, unpack_to_soft
    from tpu_viterbi.config import ChannelIn
    from tpu_viterbi.utils.native import (native_quantize_pack,
                                          native_unpack_soft)

    rng = np.random.default_rng(5)
    vals = (rng.normal(size=(4096 + 3,)) * 3.0).astype(np.float32)
    widths = {ChannelIn.HARD: 1, ChannelIn.SOFT4: 4, ChannelIn.SOFT8: 8,
              ChannelIn.SOFT16: 16}
    for ch, width in widths.items():
        want = np.asarray(quantize_and_pack(jnp.asarray(vals), ch,
                                            scale=2.5)).astype(np.int32)
        got = native_quantize_pack(vals, width, scale=2.5)
        if got is None:
            pytest.skip("native library unavailable")
        np.testing.assert_array_equal(got, want, err_msg=ch.name)

        soft_want = np.asarray(unpack_to_soft(jnp.asarray(want), ch))
        soft_got = native_unpack_soft(want, width)
        np.testing.assert_array_equal(soft_got, soft_want, err_msg=ch.name)
