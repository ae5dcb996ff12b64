"""Fused Pallas workload generator: message bits -> conv encode -> AWGN ->
quantize -> packed channel words, all inside one TPU kernel.

The XLA element chain (chain/workload.py, mirroring the reference driver
src/main.cpp:131-141) materializes every intermediate stream in HBM: the
float symbol streams alone are 8 bytes per message bit, and the measured
cost at 128M bits is ~24 ms (scripts/gen_cost_probe.py) — comparable to
the decode itself.  This kernel keeps everything in vector registers: the
only HBM traffic is the packed outputs (~0.63 B/bit at SOFT8), and the
random draws are recomputed from counters instead of stored.

RNG: threefry2x32 on int32 vector ops (bit-identical to JAX's threefry
function at 20 rounds, verified in tests/test_genkernel.py), driven in
counter mode at GEN_ROUNDS=13 — the BigCrush-passing minimum (Salmon et
al. SC'11), which cuts ~1/3 of the generator's ALU work vs 20 rounds:

  message-bit pack p (32 bits, MSB = earliest):
      pack = threefry(key, c0=p>>1, c1=1).x[p & 1]
  noise for the two streams of stage s of word w (j = s - w*vpw/2):
      (z0, z1) = box_muller(threefry(key, c0=w, c1=2 + j))

Every value is a pure function of (key, global position), so sharded
grids generate exactly the slices of one global stream — the same
property the partitionable-threefry XLA path provides (simulate.py).
The bit/noise STREAMS differ from the jax.random ones (different counter
assignment), so parity with chain/workload.py is statistical under noise
and bit-exact only in the derived quantities tests lock: encoding,
quantization, and packing of whatever bits were drawn (sigma=0), and the
BER curve under noise.

Normal draws: two u32 -> 24-bit uniforms -> Box-Muller (exact Gaussian,
no polynomial approximation error in the tails, which is what the BER
waterfall measures); |z| <= sqrt(-2 ln 2^-24) = 5.77 sigma, slightly
deeper than jax.random.normal's erfinv path at the same granularity.
TPU sin/cos/log/sqrt are single hardware transcendentals.

Encoder: the two parity streams are computed on whole 32-bit packs as
funnel-shifted XOR taps (reference shift register semantics,
src/viterbiDF.h:43-62, same tap algebra as chain/encode.py); the 6-bit
history crossing a pack boundary comes from recomputing the previous
pack's threefry call — recompute-over-communicate, the TPU idiom.

Packing: MSB = earliest, interleaved [out0, out1] per stage, identical
field layout to chain/quantize.pack_words_2streams (viterbiDF.h:157-163).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import CONST_LEN, POLY1, POLY2, ChannelIn
from .channel import snr_to_sigma
from .quantize import _QUANT_PARAMS

GEN_ROWS = 64         # requested sublane rows per kernel program; _plan
                      # rounds up to a multiple of 8*wpl, so the EFFECTIVE
                      # rows are 64 (HARD/SOFT4), 128 (SOFT8), 256 (SOFT16),
                      # 512 (FP32) — an r8/r32/r64 sweep times the identical
                      # SOFT8 kernel (ADVICE r1).  Per-channel sweep of
                      # effective values at 32M bits on v5e
                      # (scripts/genrows_sweep.py): the minimum effective
                      # rows wins for every channel (SOFT8 128: 2.80 ms vs
                      # 256: 3.16, 512: 3.54; HARD 64: 1.46 vs 128: 1.83;
                      # SOFT16 256: 4.79 vs 512: 5.29; FP32 512: 10.7 vs
                      # 1024: 11.3) — larger tiles only add VMEM pressure,
                      # so the default stays 64.

_ROTS = (13, 15, 26, 6, 17, 29, 16, 24)
_BITS_TAG = 1         # threefry c1 for message-bit draws
_NOISE_TAG = 2        # threefry c1 base for noise draws

# Rounds for the generator's in-kernel draws.  13 is the Threefry-2x32
# BigCrush-passing minimum (Salmon et al., "Parallel random numbers: as
# easy as 1, 2, 3", SC'11, Table 2) — the RNG is ~2/3 of the generator's
# ALU work, so dropping 20 -> 13 rounds cuts ~35% of it; statistical
# quality is gated by the BER-waterfall agreement check
# (scripts/check_gen_ber.py) and the Gaussian-tail tests
# (tests/test_genkernel.py).
GEN_ROUNDS = 13


def _rotl(x, r):
    return (x << r) | jax.lax.shift_right_logical(x, 32 - r)


def threefry2x32(k0, k1, c0, c1, rounds=20):
    """threefry2x32 on int32 arrays (wrapping int32 adds == uint32
    semantics); at the default 20 rounds bit-identical to
    jax._src.prng.threefry_2x32.  Key injection every 4 rounds per the
    Threefish/Threefry schedule, so any `rounds` is well-defined."""
    ks2 = jnp.int32(0x1BD11BDA) ^ k0 ^ k1
    ks = (k0, k1, ks2)
    x0 = c0 + k0
    x1 = c1 + k1
    r = g = 0
    while r < rounds:
        n = min(4, rounds - r)
        base = 4 * (g % 2)
        for i in range(n):
            x0 = x0 + x1
            x1 = _rotl(x1, _ROTS[base + i])
            x1 = x1 ^ x0
        r += n
        g += 1
        x0 = x0 + ks[g % 3]
        x1 = x1 + ks[(g + 1) % 3] + jnp.int32(g)
    return x0, x1


def normal_pair(x0, x1):
    """Two int32 random words -> two independent N(0,1) f32 draws via
    Box-Muller (exact Gaussian — no polynomial approximation error in the
    tails, which is what the BER waterfall measures).  24-bit uniform
    granularity bounds |z| <= sqrt(-2 ln 2^-24) = 5.77 sigma, slightly
    deeper than jax.random.normal's erfinv path (~5.4 sigma at the same
    granularity).  TPU sin/cos/log/sqrt are single hardware
    transcendentals (scripts/genkernel_probe.py checks lowering)."""
    two24 = jnp.float32(2.0 ** -24)
    u1 = ((x0 & jnp.int32(0xFFFFFF)).astype(jnp.float32) + 1.0) * two24
    u2 = (x1 & jnp.int32(0xFFFFFF)).astype(jnp.float32) * two24
    r = jnp.sqrt(jnp.float32(-2.0) * jnp.log(u1))
    theta = jnp.float32(2.0 * math.pi) * u2
    return r * jnp.cos(theta), r * jnp.sin(theta)


def _tap_ds(poly):
    return tuple(CONST_LEN - 1 - b for b in range(CONST_LEN)
                 if (poly >> b) & 1)


_TAPS_D0 = _tap_ds(POLY1)   # {6, 3, 2, 1, 0}
_TAPS_D1 = _tap_ds(POLY2)   # {6, 5, 3, 2, 0}


def _bit_pack(k0, k1, idx):
    """Message-bit pack `idx` (32 bits, MSB = earliest): half (idx & 1) of
    threefry call (idx >> 1, _BITS_TAG); packs at negative indices (the
    encoder's pre-history) are zero."""
    x0, x1 = threefry2x32(k0, k1, idx >> 1, jnp.int32(_BITS_TAG),
                          rounds=GEN_ROUNDS)
    pack = jnp.where((idx & 1) == 1, x1, x0)
    return jnp.where(idx < 0, 0, pack)


def _iota2(rows):
    """(rows, 128) row-major flat indices, built in-register."""
    return (jax.lax.broadcasted_iota(jnp.int32, (rows, 128), 0) * 128 +
            jax.lax.broadcasted_iota(jnp.int32, (rows, 128), 1))


def _gen_kernel(key_ref, bits_ref, words_ref, win_ref, *, n_bits, vpw, wpl,
                rows, width, lo, hi, scale, sigma, hard, fast_window=False):
    """One tile.  Lane ownership is strided so both outputs are emitted in
    flat stream order with zero relayout:

      words_ref (R, 128): element (r, lane) IS channel word
          w = base + program_id*R*128 + r*128 + lane; its encoder window
          (the 6-bit history plus the word's spw stages) is rebuilt from
          the two covering bit packs (recompute-over-communicate) via one
          variable funnel shift.
      bits_ref (R // wpl, 128): element = message-bit pack p (same affine
          indexing over the pack stream), masked to the first n_bits
          positions.

    Global positions are rebuilt in-register from program_id + iota + the
    SMEM base offset (key_ref[2], nonzero for non-first shards) — the only
    HBM traffic really is the packed outputs.

    An XLA-side layout fix-up is deliberately impossible to need: a
    (.., wpl)-minor transpose materializes padded 16 -> 128 lanes under
    TPU tiling (~12 ms hidden traffic at 128M bits, scripts/e2e_profile.py
    before this layout), and Mosaic cannot lower the in-kernel lane-merge
    reshape."""
    k0 = key_ref[0]
    k1 = key_ref[1]
    w0 = key_ref[2] + pl.program_id(0) * (rows * 128)
    w = w0 + _iota2(rows)
    spw = vpw // 2                              # stages per word

    # ---- message-bit packs output (pack-owner indexing) ----
    p = w0 // wpl + _iota2(rows // wpl)
    own = _bit_pack(k0, k1, p)
    keep = jnp.clip(n_bits - 32 * p, 0, 32)     # zero bits >= n_bits
    tail_mask = jnp.where(
        keep >= 32, jnp.int32(-1),
        jnp.where(keep <= 0, 0,
                  jnp.int32(-1) << (32 - jnp.minimum(keep, 31))))
    bits_ref[...] = own & tail_mask

    # ---- per-word encoder window: bits [w*spw - 6, w*spw + 26) ----
    if fast_window:                 # call site guarantees spw==2, rows==128
        # Dedup'd window packs (the r2 "genkernel residual", VERDICT r3
        # item 2): the naive path below recomputes 2 full threefry calls
        # per WORD, but a program's 16384 words share only rows*NJ + 2
        # distinct bit packs.  Compute those once at (NJ+2, rows) shape
        # (2 vregs instead of 16 per vector op), with the column-major
        # index mapping pack(a, b) = p0w - 1 + a + NJ*b chosen so ONE
        # VMEM transpose lands them word-row-major; then each lane
        # selects its covering pack from its row's NJ+1 window columns
        # (lane-broadcast + segmented select).  Bit-exact vs the naive
        # path (same draws, same funnel) — locked by
        # tests/test_genkernel.py::test_fast_window_matches_naive, and
        # on chip by scripts/genwin_ab.py.  PRECONDITION: the program's
        # base word offset w0 must be a multiple of 16 so
        # p0w = (w0*spw) >> 5 is exact — true for every current caller
        # (program spans are multiples of rows*128 words).
        #
        # MEASURED NEGATIVE, default OFF (r3, scripts/genwin_ab.py, 128M
        # bits, k-multi slope, one process): fast 9.45 vs naive 8.86
        # ms/gen — the 2*(NJ+1) per-program (rows,1)->(rows,128)
        # lane-broadcasts + the (NJ+2, rows) VMEM transpose cost more
        # than the ~94% of window-threefry lanes they deduplicate.  This
        # closes the r2 "genkernel residual": the per-word window
        # recompute IS the cheaper formulation on this backend; kept
        # behind fast_window for reproducibility.
        NJ = 4 * spw                    # window packs per word-row
        p0w = (w0 * spw) >> 5           # first pack of the program span
        a = jax.lax.broadcasted_iota(jnp.int32, (NJ + 2, rows), 0)
        b = jax.lax.broadcasted_iota(jnp.int32, (NJ + 2, rows), 1)
        win_ref[...] = _bit_pack(k0, k1, p0w - 1 + a + NJ * b).T
        lane = jax.lax.broadcasted_iota(jnp.int32, (rows, 128), 1)
        t = spw * lane + 32 - (CONST_LEN - 1)
        jsel = t >> 5                   # covering-pack column, 0..NJ
        sh = t & 31
        pcov = jnp.zeros_like(w)
        pnext = jnp.zeros_like(w)
        for j in range(NJ + 1):
            m = jsel == j
            pcov = pcov | jnp.where(
                m, jnp.broadcast_to(win_ref[:, j:j + 1], (rows, 128)), 0)
            pnext = pnext | jnp.where(
                m, jnp.broadcast_to(win_ref[:, j + 1:j + 2], (rows, 128)),
                0)
        u = (pcov << sh) | jnp.where(
            sh == 0, 0, jax.lax.shift_right_logical(pnext, 32 - sh))
    else:
        off = w * spw - (CONST_LEN - 1)
        pk = off >> 5
        sh = off & 31
        p1 = _bit_pack(k0, k1, pk)
        p2 = _bit_pack(k0, k1, pk + 1)
        u = (p1 << sh) | jnp.where(
            sh == 0, 0, jax.lax.shift_right_logical(p2, 32 - sh))

    # parity windows: bit q of o_k (from MSB) = stage (off + q) output =
    # XOR over tap delays d of window bit q - d; valid for q >= 6
    shifted = {0: u}
    for d in sorted(set(_TAPS_D0 + _TAPS_D1) - {0}):
        shifted[d] = jax.lax.shift_right_logical(u, d)
    o0 = shifted[_TAPS_D0[0]]
    for d in _TAPS_D0[1:]:
        o0 = o0 ^ shifted[d]
    o1 = shifted[_TAPS_D1[0]]
    for d in _TAPS_D1[1:]:
        o1 = o1 ^ shifted[d]

    # ---- noise, quantize, pack ----
    f_scale = jnp.float32(scale)
    f_nscale = jnp.float32(scale * sigma)
    field_mask = jnp.int32((1 << width) - 1) if width < 32 else jnp.int32(-1)

    acc = jnp.zeros_like(w)
    for j in range(spw):
        stage_ok = (w * spw + j) < n_bits       # one stage per message bit
        if sigma:
            zs = normal_pair(*threefry2x32(k0, k1, w,
                                           jnp.int32(_NOISE_TAG + j),
                                           rounds=GEN_ROUNDS))
        for stream, o_win in enumerate((o0, o1)):
            # stage w*spw+j is window bit 6+j (from MSB) = value bit 25-j
            bit = jax.lax.shift_right_logical(
                o_win, 32 - CONST_LEN - j) & 1
            sym = bit.astype(jnp.float32) * 2.0 - 1.0
            v = sym * f_scale
            if sigma:
                v = v + f_nscale * zs[stream]
            if hard:
                field = (v > 0.0).astype(jnp.int32)
            else:
                field = jnp.clip(jnp.rint(v), lo, hi).astype(jnp.int32)
            field = field & field_mask
            field = jnp.where(stage_ok, field, 0)
            f_pos = 2 * j + stream              # field index within word
            acc = acc | (field << (32 - (f_pos + 1) * width))
    words_ref[...] = acc


def _gen_kernel_f32(key_ref, bits_ref, vals_ref, *, n_bits, rows, scale,
                    sigma):
    """FP32-channel tile: element (r, lane) of vals_ref (R, 128) IS the
    interleaved channel value at flat position
    v = base + program_id*R*128 + r*128 + lane — stage v>>1, stream v&1 —
    so the kernel emits the FP32 wire format (dpp=1, scaled floats,
    [out0, out1] per stage, viterbiDF.h order) directly, with the same
    counter-mode bit stream as the packed channels (_bit_pack) and one
    Box-Muller noise pair per stage at counter (s, _NOISE_TAG).  bits_ref
    (R // 64, 128): 64 values = 32 message bits per pack."""
    k0 = key_ref[0]
    k1 = key_ref[1]
    v0 = key_ref[2] + pl.program_id(0) * (rows * 128)
    v = v0 + _iota2(rows)
    s = v >> 1                                  # stage = message-bit index
    stream = v & 1

    # ---- message-bit packs output (pack-owner indexing) ----
    p = v0 // 64 + _iota2(rows // 64)
    own = _bit_pack(k0, k1, p)
    keep = jnp.clip(n_bits - 32 * p, 0, 32)     # zero bits >= n_bits
    tail_mask = jnp.where(
        keep >= 32, jnp.int32(-1),
        jnp.where(keep <= 0, 0,
                  jnp.int32(-1) << (32 - jnp.minimum(keep, 31))))
    bits_ref[...] = own & tail_mask

    # ---- per-value encoder window: bits [s - 6, s + 26) ----
    off = s - (CONST_LEN - 1)
    pk = off >> 5
    sh = off & 31
    p1 = _bit_pack(k0, k1, pk)
    p2 = _bit_pack(k0, k1, pk + 1)
    u = (p1 << sh) | jnp.where(
        sh == 0, 0, jax.lax.shift_right_logical(p2, 32 - sh))

    shifted = {0: u}
    for d in sorted(set(_TAPS_D0 + _TAPS_D1) - {0}):
        shifted[d] = jax.lax.shift_right_logical(u, d)
    o0 = shifted[_TAPS_D0[0]]
    for d in _TAPS_D0[1:]:
        o0 = o0 ^ shifted[d]
    o1 = shifted[_TAPS_D1[0]]
    for d in _TAPS_D1[1:]:
        o1 = o1 ^ shifted[d]

    # stage s is window bit 6 (from MSB) of its own window
    b0 = jax.lax.shift_right_logical(o0, 32 - CONST_LEN) & 1
    b1 = jax.lax.shift_right_logical(o1, 32 - CONST_LEN) & 1
    bit = jnp.where(stream == 1, b1, b0)
    val = (bit.astype(jnp.float32) * 2.0 - 1.0) * jnp.float32(scale)
    if sigma:
        z0, z1 = normal_pair(*threefry2x32(k0, k1, s, jnp.int32(_NOISE_TAG),
                                           rounds=GEN_ROUNDS))
        val = val + jnp.float32(scale * sigma) * jnp.where(stream == 1,
                                                           z1, z0)
    vals_ref[...] = jnp.where(s < n_bits, val, jnp.float32(0.0))


# one bit-pack spans 64 interleaved FP32 values, so the bits block
# (rows // 64, 128) pins rows to a multiple of 8 * 64
_F32_ROW_QUANTUM = 512


def _plan_f32(n, rows, shards=1, min_vals=0):
    """FP32 tile plan: -> (rows, n_packs, n_vals, v_pad, p_pad)."""
    rows = -(-rows // _F32_ROW_QUANTUM) * _F32_ROW_QUANTUM
    n_packs = -(-n // 32)
    n_vals = 2 * n
    span = rows * 128 * shards
    v_pad = -(-max(n_vals, min_vals) // span) * span
    p_pad = v_pad // 64
    assert p_pad >= n_packs
    return rows, n_packs, n_vals, v_pad, p_pad


def _call_gen_kernel_f32(kd, base, *, n, snr_db, scale, rows, grid,
                         interpret):
    sigma = 0.0 if math.isinf(snr_db) else snr_to_sigma(snr_db)
    kernel = functools.partial(_gen_kernel_f32, n_bits=n, rows=rows,
                               scale=float(scale), sigma=float(sigma))
    kd_base = jnp.concatenate([kd, base.reshape(1)])
    return pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=[pl.BlockSpec((rows // 64, 128), lambda i: (i, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((rows, 128), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)],
        out_shape=[jax.ShapeDtypeStruct((grid * rows // 64, 128),
                                        jnp.int32),
                   jax.ShapeDtypeStruct((grid * rows, 128), jnp.float32)],
        interpret=interpret,
    )(kd_base)


def _plan(n, channel_in, rows, shards=1, min_words=0):
    """Static tile plan shared by the local and sharded entry points:
    -> (rows, width, vpw, wpl, n_packs, n_words, w_pad, p_pad).
    w_pad is a multiple of shards * rows * 128 so every shard runs whole
    kernel programs over a contiguous slab of the flat word stream;
    min_words lets a consumer (sharding/simulate.py) request extra zero
    tail so the generated array IS its input — no reshard-inducing
    pad/slice of a block-sharded stream."""
    if channel_in == ChannelIn.FP32:
        raise ValueError("FP32 channel has no packed-word form; use "
                         "chain.workload.packed_workload")
    width = 1 if channel_in == ChannelIn.HARD else \
        _QUANT_PARAMS[channel_in][0]
    vpw = 32 // width
    wpl = 64 // vpw
    # the bits block (rows // wpl, 128) must satisfy Mosaic's 8-sublane
    # minimum, so rows is a multiple of 8 * wpl (wpl = words per bit pack)
    rows = -(-rows // (8 * wpl)) * (8 * wpl)
    n_packs = -(-n // 32)
    n_words = -(-2 * n // vpw)
    span = rows * 128 * shards
    w_pad = -(-max(n_words, min_words) // span) * span
    p_pad = w_pad // wpl
    assert p_pad >= n_packs
    return rows, width, vpw, wpl, n_packs, n_words, w_pad, p_pad


def generator_span_stages(channel_in: ChannelIn, rows: int = GEN_ROWS) -> int:
    """Coded stages covered by one generator kernel program (the per-shard
    sizing granularity): rows * 128 words * (vpw/2) stages each (FP32:
    rows * 128 values = rows * 64 stages)."""
    if channel_in == ChannelIn.FP32:
        rows = -(-rows // _F32_ROW_QUANTUM) * _F32_ROW_QUANTUM
        return rows * 128 // 2
    rows, _, vpw, _, _, _, _, _ = _plan(1, channel_in, rows)
    return rows * 128 * vpw // 2


def _key_data(key):
    """(2,) int32 key words from either a raw uint32 pair
    (jax.random.PRNGKey default) or a new-style typed key."""
    kd = key if hasattr(key, "dtype") and key.dtype == jnp.uint32 \
        else jax.random.key_data(key)
    return kd.reshape(2).astype(jnp.uint32).view(jnp.int32)


def _call_gen_kernel(kd, base, *, n, channel_in, snr_db, scale, rows, grid,
                     width, vpw, wpl, interpret, fast_window=False):
    """pallas_call over one contiguous `grid * rows * 128`-word slab of the
    stream starting at word `base` (a traced scalar, so the same compiled
    kernel serves any shard); positions are rebuilt in-register."""
    sigma = 0.0 if math.isinf(snr_db) else snr_to_sigma(snr_db)
    hard = channel_in == ChannelIn.HARD
    _, lo, hi = (0, 0, 0) if hard else _QUANT_PARAMS[channel_in]
    spw = vpw // 2
    # the fast path applies only at the SOFT8 tile shape; size the window
    # scratch (1, 1) otherwise so the default-off path pays zero VMEM
    fast = fast_window and spw == 2 and rows == 128
    kernel = functools.partial(
        _gen_kernel, n_bits=n, vpw=vpw, wpl=wpl, rows=rows, width=width,
        lo=lo, hi=hi, scale=float(scale), sigma=float(sigma), hard=hard,
        fast_window=fast)
    kd_base = jnp.concatenate([kd, base.reshape(1)])
    return pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=[pl.BlockSpec((rows // wpl, 128), lambda i: (i, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((rows, 128), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)],
        out_shape=[jax.ShapeDtypeStruct((grid * rows // wpl, 128),
                                        jnp.int32),
                   jax.ShapeDtypeStruct((grid * rows, 128), jnp.int32)],
        scratch_shapes=[pltpu.VMEM((rows, 4 * spw + 2) if fast else (1, 1),
                                   jnp.int32)],
        interpret=interpret,
    )(kd_base)


@functools.partial(jax.jit, static_argnames=(
    "n", "channel_in", "snr_db", "scale", "rows", "interpret",
    "fast_window"))
def packed_workload_pallas(key: jax.Array, n: int, channel_in: ChannelIn,
                           snr_db: float, scale: float,
                           rows: int = GEN_ROWS, interpret: bool = False,
                           fast_window: bool = False):
    """Fused-generation analog of chain.workload.packed_workload.

    -> (bit_packs (ceil(n/32),) int32  [message bits, MSB = earliest],
        packed channel words (ceil(2n/vpw),) int32; for FP32 the channel
        stream is the (2n,) interleaved scaled float values — the dpp=1
        wire format)."""
    kd = _key_data(key)
    if channel_in == ChannelIn.FP32:
        rows, n_packs, n_vals, v_pad, _ = _plan_f32(n, rows)
        bits, vals = _call_gen_kernel_f32(
            kd, jnp.int32(0), n=n, snr_db=snr_db, scale=scale, rows=rows,
            grid=v_pad // (rows * 128), interpret=interpret)
        return bits.reshape(-1)[:n_packs], vals.reshape(-1)[:n_vals]
    rows, width, vpw, wpl, n_packs, n_words, w_pad, p_pad = \
        _plan(n, channel_in, rows)
    bits, words = _call_gen_kernel(
        kd, jnp.int32(0), n=n, channel_in=channel_in, snr_db=snr_db,
        scale=scale, rows=rows, grid=w_pad // (rows * 128), width=width,
        vpw=vpw, wpl=wpl, interpret=interpret, fast_window=fast_window)
    return bits.reshape(-1)[:n_packs], words.reshape(-1)[:n_words]


def packed_workload_pallas_sharded(key: jax.Array, n: int,
                                   channel_in: ChannelIn, snr_db: float,
                                   scale: float, mesh, axis: str,
                                   rows: int = GEN_ROWS,
                                   interpret: bool = False,
                                   min_words: int = 0):
    """Sharded fused generation: every device runs the SAME counter-mode
    kernel over its contiguous slab of the flat word stream, so the global
    streams are bit-identical to packed_workload_pallas at any mesh shape
    (locked by tests/test_genkernel.py) — the property the reference's
    host-side generator cannot offer and the partitionable-threefry XLA
    path (sharding/simulate.py) provides at ~2x the cost.

    -> (bit_packs (p_pad,) int32, words (w_pad,) int32), both sharded
    block-contiguous along `axis`; unlike the local entry the outputs keep
    their padded length (a multiple of shards*rows*128 tail zeros) so the
    result stays evenly shardable — slice [:ceil(n/32)] / [:ceil(2n/vpw)]
    if exact lengths are needed."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    shards = mesh.shape[axis]
    if channel_in == ChannelIn.FP32:
        rows, n_packs, n_vals, w_pad, p_pad = _plan_f32(n, rows, shards,
                                                        min_words)
    else:
        rows, width, vpw, wpl, n_packs, n_words, w_pad, p_pad = \
            _plan(n, channel_in, rows, shards, min_words)
    w_loc = w_pad // shards
    kd = _key_data(key)

    def gen_local(kd):
        d = jax.lax.axis_index(axis).astype(jnp.int32)
        if channel_in == ChannelIn.FP32:
            bits, words = _call_gen_kernel_f32(
                kd, d * w_loc, n=n, snr_db=snr_db, scale=scale, rows=rows,
                grid=w_loc // (rows * 128), interpret=interpret)
        else:
            bits, words = _call_gen_kernel(
                kd, d * w_loc, n=n, channel_in=channel_in, snr_db=snr_db,
                scale=scale, rows=rows, grid=w_loc // (rows * 128),
                width=width, vpw=vpw, wpl=wpl, interpret=interpret)
        return bits.reshape(-1), words.reshape(-1)

    # check_vma=False: pallas_call's out_shape carries no varying-mesh-axes
    # annotation, and the body is intentionally device-varying (axis_index)
    bits, words = shard_map(
        gen_local, mesh=mesh, in_specs=P(), out_specs=P(axis),
        check_vma=False)(kd)
    return bits, words


def ref_words_from_packs(bit_packs: jnp.ndarray, extra_l: int,
                         message_len: int) -> jnp.ndarray:
    """Aligned message-bit packs -> ground-truth decoded words: decoded
    bit i = message bit i + extra_l (main.cpp:160-161), 32-bit packs,
    MSB = earliest.  Pure shift-combine (the pack-matmul _ref_words path
    costs ~3 ms at 128M bits; this is free)."""
    nw = message_len // 32
    lo_shift = 32 - extra_l
    w = bit_packs.view(jnp.uint32) if bit_packs.dtype == jnp.int32 \
        else bit_packs.astype(jnp.uint32)
    need = nw + 1
    if w.shape[0] < need:
        w = jnp.concatenate([w, jnp.zeros((need - w.shape[0],), w.dtype)])
    return ((w[:nw] << extra_l) |
            (w[1:nw + 1] >> lo_shift)).astype(jnp.uint32)
