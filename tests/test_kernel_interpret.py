"""Pallas-kernel correctness WITHOUT TPU hardware: interpret mode executes
the exact kernel program (rotating-layout ACS, register exchange, in-kernel
traceback) with Python/numpy semantics on the CPU backend, checked against
the golden full-history oracle.  Complements the on-hardware qualification
scripts (scripts/check_pallas.py etc.) by keeping the kernel inside CI.
Small shapes only — interpret mode is slow."""

import numpy as np
import jax.numpy as jnp
import pytest

from tpu_viterbi.config import ChannelIn, DecodeOut, DecoderConfig
from tpu_viterbi.decoder.core_pallas import decode_blocks_pallas
from tpu_viterbi.decoder.core_xla import plan_blocks
from tpu_viterbi.decoder.golden import golden_decode_block
from tpu_viterbi.utils.bits import unpack_msb_first


@pytest.mark.parametrize("decode_out,dec_len,b",
                         [pytest.param(DecodeOut.O_B32, 96, 3,
                                       marks=pytest.mark.slow),
                          (DecodeOut.O_B16, 64, 2)])
def test_kernel_interpret_matches_golden(rng, decode_out, dec_len, b):
    cfg = DecoderConfig(channel_in=ChannelIn.SOFT8, decode_out=decode_out)
    m = dec_len * b
    plan = plan_blocks(m, cfg.bits_per_pack, dec_len)
    r = rng.integers(-100, 101, size=(m + 64, 2)).astype(np.int32)

    out = np.asarray(decode_blocks_pallas(jnp.asarray(r), cfg, plan,
                                          interpret=True))
    bits = unpack_msb_first(out, cfg.bits_per_pack)
    for k, off in enumerate(plan.offsets()):
        want = golden_decode_block(
            r[off:off + plan.block_len].astype(np.int64), dec_len)
        assert np.array_equal(bits[off:off + dec_len], want), f"block {k}"


@pytest.mark.slow   # 4 interpret compiles (~3 min); the shipped 'pack'
                    # layout is covered fast by test_word_mode_golden
def test_soft16_unpack_layouts(rng):
    """The four SOFT16 per-stage unpack structures (s16= kwarg:
    pack/halves/lazy/group — measured identical on chip by
    scripts/soft16_fix.py) must decode BIT-identically: same adds on the
    same sign-extended fields, different slicing only.  Locks the
    alternate unpack branches of _viterbi_kernel (core_pallas.py) in CI
    so the on-chip 'all layouts identical' conclusion stays auditable."""
    import jax

    from tpu_viterbi.decoder.core_pallas import decode_packed_pallas

    jax.clear_caches()   # big interpret HLO graphs; see test_word_mode_golden
    cfg = DecoderConfig(channel_in=ChannelIn.SOFT16)
    bpp = cfg.bits_per_pack
    dec_len, message_len = 2 * bpp, 5 * bpp   # partial (natural-framed) last block
    plan = plan_blocks(message_len, bpp, dec_len)
    n_vals = 2 * (message_len + 64)
    words = rng.integers(-2 ** 31, 2 ** 31,
                         size=(n_vals // cfg.enc_data_per_pack,)) \
        .astype(np.int32)

    outs = {
        lay: np.asarray(decode_packed_pallas(jnp.asarray(words), cfg, plan,
                                             interpret=True, s16=lay))
        for lay in ("pack", "halves", "lazy", "group")}
    for lay in ("halves", "lazy", "group"):
        assert np.array_equal(outs[lay], outs["pack"]), lay
