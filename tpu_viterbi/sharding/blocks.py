"""Multi-chip block-parallel decode: overlap-save over a device mesh.

The decomposition is the reference's time-block scheme (SURVEY.md §5
"long-context") lifted one level: the coded stage stream is sharded along
the 'blocks' mesh axis; each device decodes exactly the output bits whose
stages live in its shard, and fetches the extra_l+extra_r = 64-stage right
halo from its neighbor with a single `ppermute` edge exchange over ICI
(replacing nothing in the reference — it has no multi-device story).

Within a device the usual block batch runs (decoder/core_xla.py); across
devices no further communication is needed (overlap-save blocks are
independent), so scaling is embarrassingly parallel after one tiny halo
exchange — laid out to ride ICI, never DCN-wide collectives.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P
from jax import shard_map

from ..config import ChannelIn, ConfigResolutionError, DecoderConfig
from ..decoder.core_xla import WARMUP, decode_packed_xla, plan_blocks
from .mesh import BLOCK_AXIS


def sharded_stage_count(total_stages: int, num_devices: int,
                        bits_per_pack: int, align: int = 0,
                        max_pad_num: int = 32) -> int:
    """Stages per device: total padded up so each shard is a whole number of
    packs and of packed input words for every channel type (lcm 32).

    align: additionally round the shard up to this stage multiple when the
    global padding stays under total/max_pad_num — used to hit the
    zero-copy aligned decode path (shard blocks a lane_tile multiple, see
    build_sharded_decoder)."""
    per = -(-total_stages // num_devices)
    per = -(-per // 32) * 32
    if align:
        per_a = -(-per // align) * align
        if per_a * num_devices <= total_stages + total_stages // max_pad_num:
            per = per_a
    return per


def zero_copy_align_stages(cfg: DecoderConfig, dec_len: int) -> int:
    """The stage multiple that makes a shard a whole number of lane-tile
    blocks under plan_blocks' bpp-trimmed dec_len — i.e. exactly the
    `sd % (LANE_TILE * plan.dec_len) == 0` gate of the zero-copy aligned
    decode path in build_sharded_decoder.  The ONE place the alignment
    rule lives; decode_sharded and build_sharded_simulation both feed it
    to sharded_stage_count(align=...)."""
    bpp = cfg.bits_per_pack
    dl = max(bpp, dec_len - dec_len % bpp)
    try:                       # the very factor the gate divides by
        from ..decoder.core_pallas import LANE_TILE as lane_tile
    except ImportError:        # no pallas -> gate never taken; 128 is fine
        lane_tile = 128
    return lane_tile * dl


def build_sharded_decoder(cfg: DecoderConfig, stages_per_device: int,
                          mesh, dec_len: int = 2048,
                          survivor: str = "auto",
                          backend: str = "auto"):
    """Returns (jitted decode, plan, local_words, info) for a
    globally-sharded packed input.

    Input:  packed words for num_devices * stages_per_device coded stages,
            sharded along the 'blocks' axis.
    Output: packed decoded words, sharded the same way; each device emits
            stages_per_device output bits.  The globally valid prefix is
            get_message_len(2 * total_stages) bits; the tail past it (which
            consumed the wraparound halo of device 0) must be discarded by
            the caller.

    backend: 'auto' | 'xla' | 'pallas' | 'pallas-interpret' — same knob as
    ViterbiTPU (api.py).  'pallas-interpret' runs the production Pallas
    kernel (including the zero-copy aligned tail_halo branch) in interpret
    mode on any backend, which is how the multi-device aligned path gets
    N>1 CI coverage without TPU pod hardware (VERDICT r4 item 1).

    info: {'backend': resolved core, 'aligned': bool, 'window': bool} —
    'aligned' True means the shard stream enters the kernel as a pure
    bitcast body with the ppermute'd neighbor halo riding the tile-edge
    input (ZERO copies of the shard stream).
    """
    num_devices = mesh.shape[BLOCK_AXIS]
    sd = stages_per_device
    if sd % 32:
        raise ValueError("stages_per_device must be a multiple of 32")
    local_words = sd * 2 // cfg.enc_data_per_pack
    if dec_len == "auto":    # per-shard lane-tile fill (core_xla.auto_dec_len)
        from ..decoder.core_xla import auto_dec_len
        dec_len = auto_dec_len(sd, cfg.bits_per_pack)
    plan = plan_blocks(sd, cfg.bits_per_pack, dec_len)
    perm = [((d + 1) % num_devices, d) for d in range(num_devices)]

    if survivor not in ("auto", "full", "window"):
        raise ValueError(f"survivor must be 'auto', 'full' or 'window', "
                         f"got {survivor!r}")
    if backend not in ("auto", "xla", "pallas", "pallas-interpret"):
        raise ValueError(f"backend must be 'auto', 'xla', 'pallas' or "
                         f"'pallas-interpret', got {backend!r}")
    interp = backend == "pallas-interpret"
    win = False
    use_pallas = False
    if backend != "xla":
        try:
            from ..decoder.core_pallas import (LANE_TILE,
                                               decode_packed_pallas,
                                               padded_input_words,
                                               pallas_supported,
                                               resolve_window)
            win = resolve_window(survivor, cfg, plan)
            use_pallas = interp or pallas_supported(cfg, plan, window=win)
            if backend == "pallas" and not use_pallas:
                raise ConfigResolutionError(
                    "pallas backend requested but unsupported "
                    f"for config={cfg} plan={plan}")
        except ImportError:
            if backend in ("pallas", "pallas-interpret"):
                raise
    if survivor == "window" and not use_pallas:
        # same loud rejection as ViterbiTPU (api.py): the one-pointer
        # circular buffer lives in the Pallas kernel; an explicit window
        # request the XLA fallback cannot honor must not silently decode
        # full-store (VERDICT r4 item 4)
        raise ConfigResolutionError(
            "survivor='window' requires the Pallas kernel path, but this "
            f"sharded decode resolves to the XLA core (backend="
            f"{backend!r}); run on TPU, use backend='pallas-interpret', "
            "or use survivor='auto'")

    # halo exchanged at packed-word granularity (the wire format): the
    # first 64 coded stages of the right neighbor, one tiny ppermute edge
    dpp = 1 if cfg.channel_in == ChannelIn.FP32 else cfg.enc_data_per_pack
    halo_words = 2 * WARMUP // dpp

    # Zero-copy aligned path: when the shard's block count is a lane_tile
    # multiple (sd % (128 * dec_len) == 0, see sharded_stage_count's
    # align knob) the local stream IS the kernel's bitcast body and the
    # ppermute'd neighbor halo rides the tile-edge side input
    # (decode_packed_pallas tail_halo) — ZERO copies of the shard stream.
    # Otherwise one concat builds the decoder's full input (local stream +
    # halo + staging pad) — folding the pad in here keeps it to a single
    # copy instead of a second pad-concat inside decode_packed_pallas.
    aligned = (use_pallas and cfg.channel_in != ChannelIn.FP32
               and plan.dec_len >= 64
               and sd % (LANE_TILE * plan.dec_len) == 0)
    pad_words = 0
    if use_pallas and cfg.channel_in != ChannelIn.FP32 and not aligned:
        pad_words = max(0, padded_input_words(cfg, plan)
                        - (local_words + halo_words))

    def local_decode(words_local):
        halo = jax.lax.ppermute(words_local[:halo_words], BLOCK_AXIS, perm)
        if aligned:
            return decode_packed_pallas(words_local, cfg, plan,
                                        window=win, tail_halo=halo,
                                        interpret=interp)
        parts = [words_local, halo]
        if pad_words:
            parts.append(jnp.zeros((pad_words,), words_local.dtype))
        words_full = jnp.concatenate(parts)
        # word-granular staging end to end on both backends (no lane-padded
        # soft intermediates — see core_xla.stage_layout_packed)
        if use_pallas:
            return decode_packed_pallas(words_full, cfg, plan, window=win,
                                        interpret=interp)
        return decode_packed_xla(words_full, cfg, plan)

    # check_vma=False: the decoder's zero-initialized scan carries are
    # unvarying over the mesh axis by construction; axis-varying inference
    # would otherwise require threading pvary through the shared core.
    fn = shard_map(local_decode, mesh=mesh,
                   in_specs=P(BLOCK_AXIS), out_specs=P(BLOCK_AXIS),
                   check_vma=False)
    info = {"backend": ("pallas-interpret" if interp and use_pallas else
                        "pallas" if use_pallas else "xla"),
            "aligned": aligned, "window": win}
    return jax.jit(fn), plan, local_words, info


def decode_sharded(packed_global, input_num: int, cfg: DecoderConfig,
                   mesh, dec_len: int = 2048,
                   survivor: str = "auto",
                   backend: str = "auto") -> Tuple[np.ndarray, int]:
    """Convenience end-to-end sharded decode.

    packed_global: full packed channel input (host array).  Returns
    (packed_output_words, message_len)."""
    num_devices = mesh.shape[BLOCK_AXIS]
    total_stages = input_num // 2
    if dec_len == "auto":    # resolve against the unaligned shard size
        from ..decoder.core_xla import auto_dec_len
        dec_len = auto_dec_len(
            sharded_stage_count(total_stages, num_devices,
                                cfg.bits_per_pack), cfg.bits_per_pack)
    # align to lane_tile*dec_len blocks when cheap -> zero-copy decode path
    sd = sharded_stage_count(total_stages, num_devices, cfg.bits_per_pack,
                             align=zero_copy_align_stages(cfg, dec_len))
    padded_stages = sd * num_devices
    words_needed = padded_stages * 2 // cfg.enc_data_per_pack

    arr = np.asarray(packed_global)
    if cfg.channel_in == ChannelIn.FP32:
        arr = arr.astype(np.float32)
    else:
        arr = arr.astype(np.int32)
    if len(arr) < words_needed:
        arr = np.pad(arr, (0, words_needed - len(arr)))
    else:
        arr = arr[:words_needed]

    fn, _, _, _ = build_sharded_decoder(cfg, sd, mesh, dec_len,
                                        survivor=survivor, backend=backend)
    # device_put of the host array onto the (possibly multi-process) mesh:
    # each process materializes only its addressable shards
    x = jax.device_put(arr, NamedSharding(mesh, P(BLOCK_AXIS)))
    out = jax.block_until_ready(fn(x))
    if jax.process_count() > 1:
        # the output spans non-addressable devices; gather over DCN so every
        # process returns the full decoded stream (pod path, SURVEY §2.3 P7)
        from jax.experimental import multihost_utils
        out = multihost_utils.process_allgather(out, tiled=True)
    out = np.asarray(out)

    message_len = cfg.get_message_len(input_num)
    return out[: message_len // cfg.bits_per_pack], message_len
