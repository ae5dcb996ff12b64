"""One-pointer sliding-window survivor buffer (VERDICT r2 item 4).

window=True reproduces the reference's actual C15 mechanism — a
forward_len-deep circular VMEM scratch (viterbi.cu:99-100, write index
stage % forwardLen viterbiACS.cuh:460) with a FRESH per-slide traceback
interleaved into the pack loop (viterbiTB.cuh:4-21) — instead of storing
every survivor pack.  On coded input the n_conv*bpp-stage discard depth
merges paths, so the windowed decode must equal the full-store decode bit
for bit; these tests lock that plus the VMEM footprint decoupling."""

import numpy as np
import jax.numpy as jnp
import pytest

from tpu_viterbi.chain.encode import conv_encode_np
from tpu_viterbi.chain.quantize import quantize_and_pack
from tpu_viterbi.config import ChannelIn, DecodeOut, DecoderConfig
from tpu_viterbi.decoder.core_pallas import (decode_packed_pallas,
                                             survivor_window_slots,
                                             vmem_footprint_bytes)
from tpu_viterbi.decoder.core_xla import plan_blocks

# canonical per-channel scales (sharding/simulate.py); HARD's scale is
# sign-irrelevant so the shared table's 1.0 is equivalent to any positive
from tpu_viterbi.sharding.simulate import DEFAULT_SCALES as _SCALES


@pytest.fixture(autouse=True)
def _fresh_compiler_state():
    # see tests/test_word_mode_golden.py: keep the CPU XLA compiler's live-
    # executable set small across interpret-mode kernel compiles
    import jax
    jax.clear_caches()
    yield


def _coded(n, sigma, channel, seed):
    rng = np.random.default_rng(seed)
    bits = rng.integers(0, 2, n).astype(np.uint8)
    sym = 2 * conv_encode_np(bits).astype(np.float32) - 1
    if sigma:
        sym = sym + rng.normal(0, sigma, sym.shape).astype(np.float32)
    return np.asarray(quantize_and_pack(jnp.asarray(sym), channel,
                                        _SCALES[channel]))


# slow tier (each case is a pair of interpret compiles, ~45-60 s): the
# SOFT8/noisy case stays fast as the representative; the full channel x
# sigma matrix runs with --full and on-chip via check_pack_exact.py
@pytest.mark.parametrize("sigma", [
    pytest.param(0.0, marks=pytest.mark.slow, id="clean"),
    pytest.param(0.5, id="noisy"),
])
@pytest.mark.parametrize("channel", [
    pytest.param(ChannelIn.HARD, marks=pytest.mark.slow, id="HARD"),
    pytest.param(ChannelIn.SOFT4, marks=pytest.mark.slow, id="SOFT4"),
    pytest.param(ChannelIn.SOFT8, id="SOFT8"),
    pytest.param(ChannelIn.SOFT16, marks=pytest.mark.slow, id="SOFT16"),
    pytest.param(ChannelIn.FP32, marks=pytest.mark.slow, id="FP32"),
])
def test_window_matches_full(rng, channel, sigma):
    cfg = DecoderConfig(channel_in=channel)
    bpp = cfg.bits_per_pack
    n = 4000
    packed = _coded(n, sigma, channel, seed=17)
    plan = plan_blocks(cfg.get_message_len(2 * n), bpp, 7 * bpp)
    full = np.asarray(decode_packed_pallas(jnp.asarray(packed), cfg, plan,
                                           interpret=True, window=False))
    win = np.asarray(decode_packed_pallas(jnp.asarray(packed), cfg, plan,
                                          interpret=True, window=True))
    assert np.array_equal(full, win), (channel, sigma)


def test_window_b16_output(rng):
    cfg = DecoderConfig(channel_in=ChannelIn.SOFT8,
                        decode_out=DecodeOut.O_B16)
    n = 2048
    packed = _coded(n, 0.4, ChannelIn.SOFT8, seed=23)
    plan = plan_blocks(cfg.get_message_len(2 * n), cfg.bits_per_pack,
                       5 * cfg.bits_per_pack)
    full = np.asarray(decode_packed_pallas(jnp.asarray(packed), cfg, plan,
                                           interpret=True, window=False))
    win = np.asarray(decode_packed_pallas(jnp.asarray(packed), cfg, plan,
                                          interpret=True, window=True))
    assert np.array_equal(full, win)


def test_window_frees_vmem():
    """The windowed survivor store must decouple VMEM from dec_len: at the
    bench config (SOFT8, dec_len 8192) the full store is ~8.5 MiB and the
    window is n_conv+3 = 4 slots = 128 KiB — enabling dec_len 8192 for
    SOFT16 and lane_tile 256 (VERDICT r2 items 4-5; the r4 +1 slot gives
    every emitted pack >= 64 merged stages, fixing the measured ~3x BER
    penalty of the 32-stage chase — see survivor_window_slots)."""
    cfg = DecoderConfig(channel_in=ChannelIn.SOFT8)
    assert survivor_window_slots(cfg) == 4
    plan = plan_blocks(32_000_000 - 64, 32, 8192)
    full = vmem_footprint_bytes(cfg, plan, window=False)
    win = vmem_footprint_bytes(cfg, plan, window=True)
    assert full - win > 8 * 10 ** 6
    # SOFT16 at dec_len 8192 fits only with the window
    cfg16 = DecoderConfig(channel_in=ChannelIn.SOFT16)
    plan16 = plan_blocks(32_000_000 - 64, 32, 8192)
    assert vmem_footprint_bytes(cfg16, plan16, window=False) > 16 * 10 ** 6
    assert vmem_footprint_bytes(cfg16, plan16, window=True) < 16 * 10 ** 6
