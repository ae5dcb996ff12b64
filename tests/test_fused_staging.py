"""The fused-staging kernel path (decode_packed_pallas fused=True: block-
major words enter the kernel and the word transpose happens in VMEM,
core_pallas._viterbi_kernel_fused) must be bit-identical to the separate
staging-pass path (fused=False, stage_words_pallas -> word-mode kernel),
which is itself golden-checked on hardware (scripts/check_word_mode.py).
Interpret mode executes both exact kernel programs on CPU.

Covers the structural hazards: the left-shifted last block patch, the
dec_len < 64 halo that spans several following blocks' bodies, HARD-channel
bit unpack, and O_B16 packs.  Small shapes — interpret mode is slow."""

import numpy as np
import jax.numpy as jnp
import pytest

from tpu_viterbi.config import ChannelIn, DecodeOut, DecoderConfig
from tpu_viterbi.decoder.core_pallas import decode_packed_pallas
from tpu_viterbi.decoder.core_xla import plan_blocks


# slow tier: the SOFT16/O_B16 case (also the only sub-WARMUP non-roll
# staging with 16-bit packs in the fast tier) and HARD (halo spanning
# multiple blocks, unique to this file) stay fast; rest with --full
@pytest.mark.parametrize("channel,decode_out,dec_len,b,extra_m", [
    pytest.param(ChannelIn.SOFT8, DecodeOut.O_B32, 96, 3, 0,
                 marks=pytest.mark.slow),
    pytest.param(ChannelIn.SOFT4, DecodeOut.O_B32, 128, 2, 64,
                 marks=pytest.mark.slow),              # partial last block
    (ChannelIn.HARD, DecodeOut.O_B32, 32, 5, 0),      # halo spans blocks
    (ChannelIn.SOFT16, DecodeOut.O_B16, 48, 3, 0),
])
def test_fused_matches_staged(rng, channel, decode_out, dec_len, b, extra_m):
    cfg = DecoderConfig(channel_in=channel, decode_out=decode_out)
    m = dec_len * b + extra_m
    plan = plan_blocks(m, cfg.bits_per_pack, dec_len)
    n_words = 2 * (m + 64) // cfg.enc_data_per_pack
    words = jnp.asarray(
        rng.integers(-2 ** 31, 2 ** 31, size=(n_words,)).astype(np.int32))

    want = np.asarray(decode_packed_pallas(words, cfg, plan, fused=False,
                                           interpret=True))
    got = np.asarray(decode_packed_pallas(words, cfg, plan, fused=True,
                                          interpret=True))
    np.testing.assert_array_equal(got, want)
