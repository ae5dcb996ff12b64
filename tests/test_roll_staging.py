"""Zero-copy roll-halo staging (r4): the fused kernel derives each
block's halo from its right neighbor's body words by an in-kernel lane
roll, with tile-edge lanes fed from the tiny static-slice edge input
(core_pallas._body_and_edge / roll_halo=True).  These tests lock the
structural hazards on the XLA-core oracle, in interpret mode (the exact
production kernel program):

  - multi-tile plans (the tile-edge lane's halo crosses into the next
    tile's first block, exercising the edge input)
  - the input-length contract: exact-length, pre-padded
    (padded_input_words), and over-length streams must decode identically
  - the partial tile-edge window (stream ends inside an edge slice)
  - natural last-block framing with a discarded tail (overlap_bits > 0)
"""

import numpy as np
import jax.numpy as jnp
import pytest

from tpu_viterbi.config import ChannelIn, DecoderConfig


@pytest.fixture(autouse=True)
def _fresh_compiler_state():
    """These interpret-mode kernels compile to very large CPU HLO graphs;
    with a long pytest process' worth of live executables the XLA CPU
    compiler can SEGFAULT (the test_word_mode_golden.py failure class —
    a full-suite run died after this file was added while solo runs
    pass).  Drop the jit caches before each case."""
    import jax
    jax.clear_caches()
    yield
from tpu_viterbi.decoder.core_pallas import (decode_packed_pallas,
                                             padded_input_words)
from tpu_viterbi.decoder.core_xla import decode_packed_xla, plan_blocks


# slow tier (interpret compiles, ~30-60 s each): the FP32 case stays in
# the fast tier as the representative (u/d word mode rides the same
# body/edge staging); the full matrix runs with --full
@pytest.mark.parametrize("channel,dec_len,n", [
    pytest.param(ChannelIn.SOFT8, 96, 20_000,
                 marks=pytest.mark.slow),  # 208 blocks -> 2 tiles
    pytest.param(ChannelIn.HARD, 64, 20_000,
                 marks=pytest.mark.slow),  # zero-word tail unpacks to -1
    pytest.param(ChannelIn.SOFT16, 64, 9_000,
                 marks=pytest.mark.slow),  # double-width words
    (ChannelIn.FP32, 64, 9_000),      # u/d word mode rides the same path
])
def test_roll_staging_matches_xla_core(rng, channel, dec_len, n):
    cfg = DecoderConfig(channel_in=channel)
    m = cfg.get_message_len(2 * n)
    plan = plan_blocks(m, 32, dec_len)
    assert plan.num_blocks > 128, "must span >1 tile to exercise the edge"
    assert dec_len >= 64, "roll path requires dec_len >= WARMUP"
    w = cfg.get_input_words(2 * n)
    if channel == ChannelIn.FP32:
        packed = jnp.asarray(rng.standard_normal(w) * 6, jnp.float32)
    else:
        packed = jnp.asarray(
            rng.integers(-2 ** 31, 2 ** 31, size=w), jnp.int32)
    want = np.asarray(decode_packed_xla(packed, cfg, plan))
    got = np.asarray(decode_packed_pallas(packed, cfg, plan,
                                          interpret=True))
    np.testing.assert_array_equal(got, want)


@pytest.mark.slow
def test_roll_staging_pad_contract(rng):
    """Exact-length, zero-copy-padded, and over-padded inputs decode
    identically (padded_input_words is advisory, never semantic)."""
    cfg = DecoderConfig(channel_in=ChannelIn.SOFT8)
    n = 20_000
    m = cfg.get_message_len(2 * n)
    plan = plan_blocks(m, 32, 96)
    w = cfg.get_input_words(2 * n)
    packed = jnp.asarray(rng.integers(-2 ** 31, 2 ** 31, size=w), jnp.int32)
    want = np.asarray(decode_packed_xla(packed, cfg, plan))
    pw = padded_input_words(cfg, plan)
    assert pw > w
    for length in (w, w + 7, pw, pw + 17):
        x = packed if length == w else jnp.concatenate(
            [packed, jnp.zeros((length - w,), jnp.int32)])
        got = np.asarray(decode_packed_pallas(x, cfg, plan,
                                              interpret=True))
        np.testing.assert_array_equal(got, want, err_msg=f"len={length}")


@pytest.mark.slow   # the tail_halo contract also runs every round in
                    # dryrun_multichip + tests/test_sharded_aligned.py
def test_tail_halo_matches_concat(rng):
    """The sharded zero-copy path delivers the cross-device halo via the
    tile-edge side input (decode_packed_pallas tail_halo) instead of
    concatenating it onto the shard stream — must be bit-identical to
    decoding the concatenated stream (sharding/blocks.py aligned path)."""
    cfg = DecoderConfig(channel_in=ChannelIn.SOFT8)
    dl = 64
    B = 256                                # 2 tiles, lane_tile multiple
    m = B * dl
    plan = plan_blocks(m, 32, dl)
    assert plan.num_blocks == B
    wpb = 2 * dl // cfg.enc_data_per_pack
    wph = 2 * 64 // cfg.enc_data_per_pack
    words = jnp.asarray(rng.integers(-2 ** 31, 2 ** 31, size=B * wpb),
                        jnp.int32)
    halo = jnp.asarray(rng.integers(-2 ** 31, 2 ** 31, size=wph),
                       jnp.int32)
    want = np.asarray(decode_packed_pallas(
        jnp.concatenate([words, halo]), cfg, plan, interpret=True))
    got = np.asarray(decode_packed_pallas(words, cfg, plan, interpret=True,
                                          tail_halo=halo))
    np.testing.assert_array_equal(got, want)
