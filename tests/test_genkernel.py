"""Fused Pallas workload generator (chain/genkernel.py) correctness:

- threefry2x32 is bit-identical to JAX's own threefry function;
- the Box-Muller normal transform matches its closed form and produces
  exact Gaussian statistics incl. deep tails;
- noiseless generated channel words are bit-exact the encode+quantize+pack
  of the generated bits through the LOCKED chain functions (every integer
  channel, tail-pack masking, word-order interleave);
- ref_words_from_packs matches sharding.simulate._ref_words32;
- the noisy value distribution has the right sigma and Gaussian tails;
- end-to-end: noiseless pallas workload decodes to BER 0 via the XLA core.

Interpret mode executes the exact kernel program on CPU."""

import math

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tpu_viterbi.chain.genkernel import (normal_pair, packed_workload_pallas,
                                         ref_words_from_packs, threefry2x32)
from tpu_viterbi.chain.encode import conv_encode_streams
from tpu_viterbi.chain.quantize import (pack_words_2streams, quantize_fields,
                                        unpack_to_soft)
from tpu_viterbi.config import ChannelIn, DecoderConfig
from tpu_viterbi.utils.bits import unpack_msb_first


def test_threefry_matches_jax():
    from jax._src.prng import threefry_2x32
    rng = np.random.default_rng(5)
    c0 = rng.integers(0, 2 ** 32, size=(512,), dtype=np.uint32)
    c1 = rng.integers(0, 2 ** 32, size=(512,), dtype=np.uint32)
    k = rng.integers(0, 2 ** 32, size=(2,), dtype=np.uint32)
    want = threefry_2x32(jnp.asarray(k),
                         jnp.stack([jnp.asarray(c0), jnp.asarray(c1)]))
    got0, got1 = threefry2x32(
        jnp.asarray(k[0]).view(jnp.int32), jnp.asarray(k[1]).view(jnp.int32),
        jnp.asarray(c0).view(jnp.int32), jnp.asarray(c1).view(jnp.int32))
    np.testing.assert_array_equal(np.asarray(got0).view(np.uint32),
                                  np.asarray(want[0]))
    np.testing.assert_array_equal(np.asarray(got1).view(np.uint32),
                                  np.asarray(want[1]))


def test_normal_pair_box_muller():
    """normal_pair matches the Box-Muller closed form on its 24-bit
    uniforms, and a large sample passes Gaussian moment/tail checks
    (the BER waterfall lives in the 3-5.4 sigma region)."""
    rng = np.random.default_rng(11)
    x0 = rng.integers(0, 2 ** 32, size=(1 << 16,), dtype=np.uint32)
    x1 = rng.integers(0, 2 ** 32, size=(1 << 16,), dtype=np.uint32)
    z0, z1 = normal_pair(jnp.asarray(x0).view(jnp.int32),
                         jnp.asarray(x1).view(jnp.int32))
    u1 = ((x0 & 0xFFFFFF).astype(np.float64) + 1.0) * 2.0 ** -24
    u2 = (x1 & 0xFFFFFF).astype(np.float64) * 2.0 ** -24
    r = np.sqrt(-2.0 * np.log(u1))
    want0 = r * np.cos(2 * np.pi * u2)
    want1 = r * np.sin(2 * np.pi * u2)
    np.testing.assert_allclose(np.asarray(z0), want0, rtol=0, atol=2e-4)
    np.testing.assert_allclose(np.asarray(z1), want1, rtol=0, atol=2e-4)
    z = np.concatenate([np.asarray(z0), np.asarray(z1)]).astype(np.float64)
    assert abs(np.mean(z)) < 0.01
    assert abs(np.std(z) - 1.0) < 0.01
    p3 = np.mean(np.abs(z) > 3.0)
    assert 1.5e-3 < p3 < 4.0e-3, f"3-sigma tail mass {p3}"
    assert np.max(np.abs(z)) < 5.8   # 24-bit granularity bound: 5.77 sigma


CHANNELS = [ChannelIn.HARD, ChannelIn.SOFT4, ChannelIn.SOFT8,
            ChannelIn.SOFT16]


@pytest.mark.parametrize("channel", CHANNELS)
def test_noiseless_words_match_chain(channel):
    """sigma=0: the kernel's encode+quantize+pack of its own bits must be
    bit-exact the locked chain functions applied to those bits."""
    n = 33 * 1024 + 13                      # non-multiple of 32: tail mask
    scale = {ChannelIn.HARD: 1.0, ChannelIn.SOFT4: 4.0,
             ChannelIn.SOFT8: 32.0, ChannelIn.SOFT16: 8192.0}[channel]
    bit_packs, words = packed_workload_pallas(
        jax.random.PRNGKey(3), n, channel, math.inf, scale, interpret=True)

    bits = unpack_msb_first(np.asarray(bit_packs).view(np.uint32), 32)[:n]
    o0, o1 = conv_encode_streams(jnp.asarray(bits))
    qs = []
    for o in (o0, o1):
        sym = o.astype(jnp.float32) * 2.0 - 1.0
        q, width = quantize_fields(sym, channel, scale)
        qs.append(q)
    want = pack_words_2streams(qs[0], qs[1], width).astype(jnp.int32)
    np.testing.assert_array_equal(np.asarray(words), np.asarray(want))


def test_ref_words_matches_simulate():
    from tpu_viterbi.sharding.simulate import _ref_words32
    n = 4096
    cfg = DecoderConfig(channel_in=ChannelIn.SOFT8)
    m = cfg.get_message_len(2 * n)
    bit_packs, _ = packed_workload_pallas(
        jax.random.PRNGKey(9), n, ChannelIn.SOFT8, math.inf, 32.0,
        interpret=True)
    bits = unpack_msb_first(np.asarray(bit_packs).view(np.uint32), 32)[:n]
    want = _ref_words32(jnp.asarray(bits), cfg, m)
    got = ref_words_from_packs(bit_packs, cfg.extra_l, m)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_noise_distribution():
    """SOFT8 fields at 3 dB: mean ~ +-scale, std ~ scale*sigma, Gaussian
    3-sigma tail mass present (the BER curve depends on the tails)."""
    n = 256 * 1024
    scale, snr = 32.0, 3.0
    sigma = 10 ** (-snr / 5)
    _, words = packed_workload_pallas(
        jax.random.PRNGKey(1), n, ChannelIn.SOFT8, snr, scale,
        interpret=True)
    vals = np.asarray(unpack_to_soft(words, ChannelIn.SOFT8))[: 2 * n]
    vals = vals.astype(np.float64)
    dev = np.where(vals > 0, vals - scale, vals + scale) / (scale * sigma)
    # quantization adds (1/12)/(scale*sigma)^2 variance: negligible here
    assert abs(np.mean(dev)) < 0.01
    assert abs(np.std(dev) - 1.0) < 0.01
    p3 = np.mean(np.abs(dev) > 3.0)
    assert 1.5e-3 < p3 < 4.5e-3, f"3-sigma tail mass {p3}"


def test_sharded_generator_bit_identical_across_mesh_shapes():
    """Counter-mode property: an 8-device sharded generation produces the
    same global bit and word streams as the single-device kernel."""
    from tpu_viterbi.sharding.mesh import BLOCK_AXIS, make_block_mesh
    n = 64 * 1024 + 7
    key = jax.random.PRNGKey(21)
    bp1, w1 = packed_workload_pallas(
        key, n, ChannelIn.SOFT8, 4.0, 32.0, interpret=True)
    mesh = make_block_mesh(jax.devices()[:8])
    from tpu_viterbi.chain.genkernel import packed_workload_pallas_sharded
    bp8, w8 = jax.jit(lambda k: packed_workload_pallas_sharded(
        k, n, ChannelIn.SOFT8, 4.0, 32.0, mesh, BLOCK_AXIS,
        interpret=True))(key)
    np.testing.assert_array_equal(np.asarray(bp8)[: bp1.shape[0]],
                                  np.asarray(bp1))
    np.testing.assert_array_equal(np.asarray(w8)[: w1.shape[0]],
                                  np.asarray(w1))
    # padded tails are zero (evenly-shardable contract)
    assert not np.any(np.asarray(bp8)[bp1.shape[0]:])
    assert not np.any(np.asarray(w8)[w1.shape[0]:])


@pytest.mark.parametrize("bpp_cfg", ["b32", "b16"])
def test_sharded_simulation_pallas_generator_ber0(bpp_cfg):
    from tpu_viterbi.config import DecodeOut
    from tpu_viterbi.sharding.mesh import make_block_mesh
    from tpu_viterbi.sharding.simulate import simulate_sharded
    cfg = DecoderConfig(channel_in=ChannelIn.SOFT8,
                        decode_out=DecodeOut.O_B16 if bpp_cfg == "b16"
                        else DecodeOut.O_B32)
    mesh = make_block_mesh(jax.devices()[:8])
    ben, m = simulate_sharded(cfg, 8 * 2048, mesh, snr_db=math.inf,
                              seed=5, dec_len=512, generator="pallas")
    assert m == cfg.get_message_len(2 * 8 * 2048)
    assert ben == 0


@pytest.mark.parametrize("gen", ["pallas", "xla"])
def test_sharded_simulation_b16_odd_halfword_count(gen):
    """Regression: m % 32 == 16 (odd number of 16-bit output packs) used
    to crash the xla-generator ref path (pack_words truncated the last 16
    message bits -> XOR shape mismatch (509,) vs (508,))."""
    from tpu_viterbi.config import DecodeOut
    from tpu_viterbi.sharding.mesh import make_block_mesh
    from tpu_viterbi.sharding.simulate import simulate_sharded
    cfg = DecoderConfig(channel_in=ChannelIn.SOFT8,
                        decode_out=DecodeOut.O_B16)
    n = 8 * 1024 + 16
    m = cfg.get_message_len(2 * n)
    assert m % 32 == 16, "test must hit the odd-halfword tail"
    mesh = make_block_mesh(jax.devices()[:8])
    ben, m2 = simulate_sharded(cfg, n, mesh, snr_db=math.inf,
                               seed=7, dec_len=512, generator=gen)
    assert m2 == m
    assert ben == 0


def test_unknown_generator_rejected():
    from tpu_viterbi.sharding.mesh import make_block_mesh
    from tpu_viterbi.sharding.simulate import build_sharded_simulation
    cfg = DecoderConfig(channel_in=ChannelIn.SOFT8)
    mesh = make_block_mesh(jax.devices()[:8])
    with pytest.raises(ValueError, match="unknown generator"):
        build_sharded_simulation(cfg, 8 * 2048, mesh, generator="Pallas")


def test_noiseless_decode_ber0():
    from tpu_viterbi.decoder.core_xla import decode_packed_xla, plan_blocks
    n = 65536
    cfg = DecoderConfig(channel_in=ChannelIn.SOFT8)
    m = cfg.get_message_len(2 * n)
    plan = plan_blocks(m, cfg.bits_per_pack, 2048)
    bit_packs, words = packed_workload_pallas(
        jax.random.PRNGKey(7), n, ChannelIn.SOFT8, math.inf, 32.0,
        interpret=True)
    out = decode_packed_xla(words, cfg, plan)
    ref = ref_words_from_packs(bit_packs, cfg.extra_l, m)
    ben = int(np.sum(np.bitwise_count(
        np.asarray(out ^ ref).view(np.uint32))))
    assert ben == 0


def test_generator_span_and_min_words_plan():
    """Shard-local sizing contract (ADVICE r1): generator_span_stages is
    the per-shard granularity, and min_words grows w_pad so the generated
    word array can exactly equal a consumer's padded input length."""
    from tpu_viterbi.chain.genkernel import _plan, generator_span_stages
    # SOFT8: effective rows 128 (wpl 16), vpw 4 -> 2 stages/word
    assert generator_span_stages(ChannelIn.SOFT8) == 128 * 128 * 2
    span8 = 8 * 128 * 128
    *_, w_pad, _ = _plan(1000, ChannelIn.SOFT8, 64, shards=8,
                         min_words=span8)
    assert w_pad == span8


def test_sharded_simulation_pallas_generator_aligned_span():
    """At an aligned size the sim's pad/slice is a no-op (the generated
    stream IS the decoder input, shard-local end to end) and the decode is
    still exact."""
    from tpu_viterbi.sharding.mesh import make_block_mesh
    from tpu_viterbi.sharding.simulate import simulate_sharded
    from tpu_viterbi.chain.genkernel import generator_span_stages
    cfg = DecoderConfig(channel_in=ChannelIn.SOFT8)
    g = generator_span_stages(ChannelIn.SOFT8)
    n = 8 * g                      # sd == g exactly -> aligned branch
    mesh = make_block_mesh(jax.devices()[:8])
    ben, m = simulate_sharded(cfg, n, mesh, snr_db=math.inf, seed=3,
                              dec_len=2048, generator="pallas")
    assert m == cfg.get_message_len(2 * n)
    assert ben == 0


# --- FP32 channel in the fused generator (VERDICT r1 item 4) ---

def test_f32_noiseless_vals_match_chain():
    """sigma=0 FP32: the kernel's encode+BPSK+scale+interleave of its own
    bits must be exactly the locked chain functions applied to those bits
    (+-scale floats, dpp=1 interleaved wire format)."""
    from tpu_viterbi.chain.quantize import interleave_2streams_f32
    n = 17 * 1024 + 13
    scale = 4.0
    bit_packs, vals = packed_workload_pallas(
        jax.random.PRNGKey(3), n, ChannelIn.FP32, math.inf, scale,
        interpret=True)
    assert vals.dtype == jnp.float32 and vals.shape == (2 * n,)

    bits = unpack_msb_first(np.asarray(bit_packs).view(np.uint32), 32)[:n]
    o0, o1 = conv_encode_streams(jnp.asarray(bits))
    s0 = (o0.astype(jnp.float32) * 2.0 - 1.0) * scale
    s1 = (o1.astype(jnp.float32) * 2.0 - 1.0) * scale
    want = interleave_2streams_f32(s0, s1)
    np.testing.assert_array_equal(np.asarray(vals), np.asarray(want))


def test_f32_sharded_bit_identical_across_mesh_shapes():
    from tpu_viterbi.sharding.mesh import BLOCK_AXIS, make_block_mesh
    from tpu_viterbi.chain.genkernel import packed_workload_pallas_sharded
    n = 64 * 1024 + 7
    key = jax.random.PRNGKey(21)
    bp1, v1 = packed_workload_pallas(
        key, n, ChannelIn.FP32, 4.0, 4.0, interpret=True)
    mesh = make_block_mesh(jax.devices()[:8])
    bp8, v8 = jax.jit(lambda k: packed_workload_pallas_sharded(
        k, n, ChannelIn.FP32, 4.0, 4.0, mesh, BLOCK_AXIS,
        interpret=True))(key)
    np.testing.assert_array_equal(np.asarray(bp8)[: bp1.shape[0]],
                                  np.asarray(bp1))
    np.testing.assert_array_equal(np.asarray(v8)[: v1.shape[0]],
                                  np.asarray(v1))
    assert not np.any(np.asarray(v8)[v1.shape[0]:])


def test_f32_noise_distribution():
    """FP32 values at 3 dB: mean +-scale, std scale*sigma (no quantizer)."""
    n = 128 * 1024
    scale, snr = 4.0, 3.0
    sigma = 10 ** (-snr / 5)
    _, vals = packed_workload_pallas(
        jax.random.PRNGKey(1), n, ChannelIn.FP32, snr, scale,
        interpret=True)
    v = np.asarray(vals, dtype=np.float64)[: 2 * n]
    dev = np.where(v > 0, v - scale, v + scale) / (scale * sigma)
    assert abs(np.mean(dev)) < 0.01
    assert abs(np.std(dev) - 1.0) < 0.01


def test_f32_sharded_simulation_pallas_generator_ber0():
    from tpu_viterbi.sharding.mesh import make_block_mesh
    from tpu_viterbi.sharding.simulate import simulate_sharded
    cfg = DecoderConfig(channel_in=ChannelIn.FP32)
    mesh = make_block_mesh(jax.devices()[:8])
    ben, m = simulate_sharded(cfg, 8 * 2048, mesh, snr_db=math.inf,
                              seed=5, dec_len=512, generator="pallas")
    assert m == cfg.get_message_len(2 * 8 * 2048)
    assert ben == 0


def test_fast_window_matches_naive():
    """The dedup'd encoder-window path (fast_window=True; a measured perf
    NEGATIVE kept for reproducibility, scripts/genwin_ab.py) must stay
    bit-identical to the per-word recompute it replaces."""
    import jax
    from tpu_viterbi.chain.genkernel import packed_workload_pallas
    from tpu_viterbi.config import ChannelIn

    n = 200_000
    outs = []
    for fast in (True, False):
        bits, words = packed_workload_pallas(
            jax.random.PRNGKey(77), n, ChannelIn.SOFT8, 5.5, 32.0,
            interpret=True, fast_window=fast)
        outs.append((np.asarray(bits), np.asarray(words)))
    assert np.array_equal(outs[0][0], outs[1][0])
    assert np.array_equal(outs[0][1], outs[1][1])
