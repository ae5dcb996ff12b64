"""SDR chain element tests: bit conventions, quantizer saturation/rounding,
MSB-first packing, channel statistics (reference: src/viterbiDF.h)."""

import numpy as np
import jax
import jax.numpy as jnp

from tpu_viterbi.chain import (AddNoise, ConvolutionalEncoder, Pipeline,
                               RandBitGen, SoftDecisionPacker, conv_encode,
                               quantize_and_pack, snr_to_sigma,
                               unpack_to_soft, unpack_to_soft_np)
from tpu_viterbi.config import ChannelIn


def test_snr_convention():
    # sigma = 10^(-snr/5): reference main.cpp:135
    assert np.isclose(snr_to_sigma(15.0), 1e-3)
    assert np.isclose(snr_to_sigma(0.0), 1.0)


def test_conv_encode_jnp_matches_np(rng):
    from tpu_viterbi.chain.encode import conv_encode_np
    bits = rng.integers(0, 2, 1000).astype(np.uint8)
    out_j = np.asarray(conv_encode(jnp.asarray(bits)))
    assert np.array_equal(out_j, conv_encode_np(bits))


def test_hard_pack_msb_first():
    # 32 bits -> one word, earliest bit at MSB (viterbiDF.h:157-163)
    vals = np.full(32, -1.0, dtype=np.float32)
    vals[0] = 1.0   # earliest value positive -> bit 1 at MSB
    vals[31] = 1.0  # latest -> LSB
    w = np.asarray(quantize_and_pack(jnp.asarray(vals), ChannelIn.HARD))
    assert w.shape == (1,)
    assert np.uint32(w[0]) == np.uint32(0x80000001)


def test_hard_strict_positive():
    # v > 0 maps to 1; v == 0 maps to 0 (viterbiDF.h quantFuncs HARD)
    vals = jnp.asarray([0.0, 1e-9, -1e-9, 0.5])
    w = np.asarray(quantize_and_pack(vals, ChannelIn.HARD))
    # 4 values padded to 32: bits 0,1,0,1 then zeros
    assert np.uint32(w[0]) >> 28 == 0b0101


def test_soft4_saturation_and_masking():
    vals = jnp.asarray([100.0, -100.0, 3.4, -3.6, 0.5, -0.5, 7.0, -8.0])
    w = np.asarray(quantize_and_pack(vals, ChannelIn.SOFT4))
    # q: 7, -8, 3, -4, 0, -0(->0), 7, -8 ; rint(0.5)=0 (half to even)
    nibbles = [(int(w[0]) >> (28 - 4 * i)) & 0xF for i in range(8)]
    assert nibbles == [7, 8, 3, 12, 0, 0, 7, 8]


def test_soft8_roundtrip(rng):
    vals = rng.normal(0, 50, 256).astype(np.float32)
    w = quantize_and_pack(jnp.asarray(vals), ChannelIn.SOFT8)
    r = np.asarray(unpack_to_soft(w, ChannelIn.SOFT8))
    expect = np.clip(np.rint(vals), -128, 127).astype(np.int32)
    assert np.array_equal(r, expect)


def test_soft16_roundtrip(rng):
    vals = rng.normal(0, 20000, 64).astype(np.float32)
    w = quantize_and_pack(jnp.asarray(vals), ChannelIn.SOFT16)
    r = np.asarray(unpack_to_soft(w, ChannelIn.SOFT16))
    expect = np.clip(np.rint(vals), -32768, 32767).astype(np.int32)
    assert np.array_equal(r, expect)


def test_unpack_np_matches_jnp(rng):
    for chan in [ChannelIn.HARD, ChannelIn.SOFT4, ChannelIn.SOFT8,
                 ChannelIn.SOFT16]:
        words = rng.integers(-2**31, 2**31, 32).astype(np.int32)
        a = np.asarray(unpack_to_soft(jnp.asarray(words), chan))
        b = unpack_to_soft_np(words, chan)
        assert np.array_equal(a, b), chan


def test_fp32_passthrough_scale():
    vals = jnp.asarray([0.25, -1.5])
    out = np.asarray(quantize_and_pack(vals, ChannelIn.FP32, scale=4.0))
    assert np.allclose(out, [1.0, -6.0])
    # decoder-side clamp to [-8, 7] (viterbiBM.cuh:139-151)
    clamped = np.asarray(unpack_to_soft(jnp.asarray([100.0, -100.0, 3.0]),
                                        ChannelIn.FP32))
    assert np.allclose(clamped, [7.0, -8.0, 3.0])


def test_noiseless_channel_is_bpsk():
    from tpu_viterbi.chain import add_awgn
    bits = jnp.asarray([0, 1, 1, 0], dtype=jnp.uint8)
    out = np.asarray(add_awgn(jax.random.PRNGKey(0), bits, float("inf")))
    assert np.array_equal(out, [-1.0, 1.0, 1.0, -1.0])


def test_awgn_statistics():
    from tpu_viterbi.chain import add_awgn
    bits = jnp.ones(20000, dtype=jnp.uint8)
    out = np.asarray(add_awgn(jax.random.PRNGKey(3), bits, 0.5))
    assert abs(out.mean() - 1.0) < 0.02
    assert abs(out.std() - 0.5) < 0.02


def test_pipeline_probe_and_timing():
    pipe = (RandBitGen(1024, seed=7).probe() | ConvolutionalEncoder()
            | AddNoise(float("inf")) | SoftDecisionPacker(ChannelIn.HARD))
    result = pipe.run()
    assert len(result.probed_outputs) == 1
    assert result.probed_outputs[0].shape == (1024,)
    assert np.asarray(result.final_output).shape == (2048 // 32,)
    for e in pipe.elements:
        assert "Elapsed run time" in e.status
    assert any("Elapsed run time" in ln for ln in pipe.status_lines())


# --- production workload builder (chain/workload.py) ---

def test_packed_workload_noiseless_matches_element_pipeline(rng):
    """The flat-layout builder must produce bit-identical packed words to
    the element pipeline when noiseless (same key -> same bits; the
    interleave is ridden on the pack matmul)."""
    import math
    from tpu_viterbi.chain import add_awgn, packed_workload

    scales = {ChannelIn.HARD: 1.0, ChannelIn.SOFT4: 4.0,
              ChannelIn.SOFT8: 32.0, ChannelIn.SOFT16: 8192.0,
              ChannelIn.FP32: 4.0}
    for chan, scale in scales.items():
        for n in (1000, 2048):  # non-multiple and multiple of a word
            key = jax.random.PRNGKey(21)
            bits, packed = packed_workload(key, n, chan, math.inf, scale)
            k1, _, _ = jax.random.split(key, 3)
            from tpu_viterbi.chain.source import random_bits
            bits_ref = random_bits(k1, n)
            assert np.array_equal(np.asarray(bits), np.asarray(bits_ref))
            coded = conv_encode(bits_ref)
            sym = add_awgn(jax.random.PRNGKey(0), coded, 0.0)
            packed_ref = quantize_and_pack(sym, chan, scale)
            assert np.allclose(np.asarray(packed), np.asarray(packed_ref)), \
                f"{chan.name} n={n}"


def test_pack_words_2streams_matches_interleaved(rng):
    """Strided 2-stream packing == pack_words on the interleaved stream,
    for every field width."""
    from tpu_viterbi.chain import pack_words_2streams
    from tpu_viterbi.chain.quantize import pack_words

    for width in (1, 4, 8, 16):
        n = 977  # odd, not a multiple of anything relevant
        q0 = rng.integers(0, 1 << width, n).astype(np.uint32)
        q1 = rng.integers(0, 1 << width, n).astype(np.uint32)
        inter = np.empty(2 * n, np.uint32)
        inter[0::2] = q0
        inter[1::2] = q1
        per_word = 32 // width
        n_pad = (-2 * n) % per_word
        inter_p = np.pad(inter, (0, n_pad))
        ref = np.asarray(pack_words(jnp.asarray(inter_p), width))
        got = np.asarray(pack_words_2streams(jnp.asarray(q0),
                                             jnp.asarray(q1), width))
        assert np.array_equal(got, ref), f"width={width}"


def test_packed_workload_noisy_decodes():
    """Noisy builder workload must decode error-free at high SNR through
    the production decoder (statistical path sanity)."""
    from tpu_viterbi.chain import packed_workload
    from tpu_viterbi.config import DecoderConfig
    from tpu_viterbi.decoder.api import ViterbiTPU
    from tpu_viterbi.utils.bits import count_bit_errors

    cfg = DecoderConfig(channel_in=ChannelIn.SOFT8)
    n = 20000
    bits, packed = packed_workload(jax.random.PRNGKey(4), n,
                                   ChannelIn.SOFT8, 6.0, 32.0)
    dec = ViterbiTPU(cfg, dec_len=1024, backend="xla")
    out, _ = dec.run(np.asarray(packed), 2 * n)
    ben = count_bit_errors(out, cfg.bits_per_pack,
                           np.asarray(bits)[cfg.extra_l:], offset=0)
    assert ben == 0
