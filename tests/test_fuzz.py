"""Cross-config fuzz: decode_packed_xla vs the golden full-history oracle
over randomly drawn valid configs, message lengths, block lengths, and
full-range random channel words.  Catches framing/unpack/assembly bugs the
fixed-shape tests miss (odd last-block overlaps, single-block plans,
message lengths not multiples of dec_len, every channel x pack-width mix).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from tpu_viterbi.chain.quantize import unpack_to_soft_np
from tpu_viterbi.config import (ALL_VALID_CONFIGS, ChannelIn, CompMode,
                                DecoderConfig)
from tpu_viterbi.decoder.core_xla import decode_packed_xla, plan_blocks
from tpu_viterbi.decoder.golden import golden_decode_block
from tpu_viterbi.utils.bits import unpack_msb_first

N_TRIALS = 12


@pytest.mark.parametrize("trial", range(N_TRIALS))
def test_fuzz_decode_matches_golden(trial):
    rng = np.random.default_rng(1000 + trial)
    # draw among valid configs (comp mode never changes semantics)
    cfgs = [c for c in ALL_VALID_CONFIGS if c.comp_mode == CompMode.REG]
    cfg = cfgs[rng.integers(len(cfgs))]
    bpp = cfg.bits_per_pack
    message_len = int(rng.integers(2, 40)) * bpp
    dec_len = int(rng.integers(1, 6)) * bpp

    plan = plan_blocks(message_len, bpp, dec_len)
    n_vals = 2 * (message_len + 64)
    if cfg.channel_in == ChannelIn.FP32:
        words = rng.integers(-8, 8, size=(n_vals,)).astype(np.float32)
    else:
        dpp = cfg.enc_data_per_pack
        words = rng.integers(-2 ** 31, 2 ** 31,
                             size=(n_vals // dpp,)).astype(np.int32)

    out = np.asarray(decode_packed_xla(jnp.asarray(words), cfg, plan))
    bits = unpack_msb_first(out, bpp)

    if cfg.channel_in == ChannelIn.FP32:
        r = words[:n_vals].reshape(-1, 2).astype(np.float64)
        r = np.trunc(np.clip(r, -8, 7))  # FP_PRECISION clamp + trunc
    else:
        r = unpack_to_soft_np(words, cfg.channel_in)[:n_vals] \
            .reshape(-1, 2).astype(np.int64)

    # natural framing: block k owns bits [k*dec_len, min((k+1)*dec_len, m));
    # the last block's input tail past the stream is zero WORDS — which
    # unpack to -1 under HARD — so golden must see the same fill
    need = (plan.num_blocks - 1) * plan.dec_len + plan.block_len
    if len(r) < need:
        fill = -1 if cfg.channel_in == ChannelIn.HARD else 0
        r = np.concatenate(
            [r, np.full((need - len(r), 2), fill, r.dtype)])
    for k, off in enumerate(plan.offsets()):
        want = golden_decode_block(r[off:off + plan.block_len], plan.dec_len)
        n = min(plan.dec_len, message_len - off)
        assert np.array_equal(bits[off: off + n], want[:n]), (
            f"trial={trial} cfg={cfg} block={k} off={off}")


@pytest.mark.parametrize("trial", range(6))
def test_fuzz_streaming_noiseless_exact(trial):
    """Chunked decode of a noiseless coded stream must reproduce the exact
    message bits (output bit i = message bit i + extra_l) for random
    channels, block lengths, and chunk sizes.  (Bit-for-bit equality with a
    one-shot decode only holds on convergent — i.e. actual coded — input,
    so the fuzz drives the real contract, not raw random words.)"""
    from tpu_viterbi.chain.encode import conv_encode_np
    from tpu_viterbi.chain.quantize import quantize_and_pack
    from tpu_viterbi.decoder.streaming import StreamingViterbi

    rng = np.random.default_rng(2000 + trial)
    channels = [ChannelIn.HARD, ChannelIn.SOFT4, ChannelIn.SOFT8,
                ChannelIn.SOFT16]
    scales = {ChannelIn.HARD: 1.0, ChannelIn.SOFT4: 4.0,
              ChannelIn.SOFT8: 32.0, ChannelIn.SOFT16: 8192.0}
    ch = channels[rng.integers(len(channels))]
    cfg = DecoderConfig(channel_in=ch)
    dec_len = int(rng.integers(2, 6)) * cfg.bits_per_pack

    n = int(rng.integers(6, 30)) * 1024
    bits = rng.integers(0, 2, n).astype(np.uint8)
    sym = (2 * conv_encode_np(bits).astype(np.float32) - 1)
    packed = np.asarray(quantize_and_pack(jnp.asarray(sym), ch, scales[ch]))

    stream = StreamingViterbi(cfg, dec_len=dec_len, backend="xla")
    chunk_words = int(rng.integers(1, 8)) * 64
    outs = []
    for a in range(0, len(packed), chunk_words):
        outs.append(stream.push(packed[a:a + chunk_words]))
    outs.append(stream.flush())
    got = np.concatenate([unpack_msb_first(o, cfg.bits_per_pack)
                          for o in outs if len(o)])


    usable = n - cfg.extra_l - 64
    assert len(got) >= usable > 0
    np.testing.assert_array_equal(
        got[:usable], bits[cfg.extra_l: cfg.extra_l + usable],
        err_msg=f"trial={trial} ch={ch.name} dec_len={dec_len} "
                f"chunk={chunk_words}")
