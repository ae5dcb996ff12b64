"""Shared certification recipe for the aligned zero-copy sharded decode.

The same two steps — build a coded SOFT8 workload, run it through
``build_sharded_decoder`` on a 'blocks' mesh — certify the production
multi-chip path in three places: the per-round driver dryrun
(``__graft_entry__.dryrun_multichip``), the 8-device interpret-mode CI
(``tests/test_sharded_aligned.py``), and the pod bringup runbook
(``scripts/pod_runbook.py``).  Keeping the recipe here means a change to
the framing/fill contract (e.g. the natural last-block zero-word rule)
propagates to all three certifiers at once instead of silently diverging
(code-review r5 finding).

This is the TPU analog of the reference's block-split correctness being
exercised by its one statistical CLI loop (main.cpp:151-171) — except the
sharded wiring here is checked bit-exactly against the XLA scan core.
"""

from __future__ import annotations

import numpy as np

from ..config import ChannelIn, DecoderConfig


def coded_workload(n_bits: int, sigma: float, seed: int,
                   channel: ChannelIn = ChannelIn.SOFT8,
                   scale: float = 32.0):
    """(message bits, packed channel words) for ``n_bits`` message bits
    through encode -> BPSK -> AWGN(sigma) -> quantize/pack.  Coded input
    is REQUIRED for windowed-vs-full survivor comparisons: on random
    (non-coded) words the two legitimately differ (unmerged paths)."""
    import jax.numpy as jnp

    from ..chain.encode import conv_encode_np
    from ..chain.quantize import quantize_and_pack

    rng = np.random.default_rng(seed)
    bits = rng.integers(0, 2, n_bits).astype(np.uint8)
    sym = 2 * conv_encode_np(bits).astype(np.float32) - 1
    if sigma:
        sym = sym + rng.normal(0, sigma, sym.shape).astype(np.float32)
    packed = np.asarray(quantize_and_pack(jnp.asarray(sym), channel, scale))
    return bits, packed


def run_sharded(cfg: DecoderConfig, sd: int, mesh, dec_len: int,
                packed: np.ndarray, backend: str = "auto",
                survivor: str = "auto", allgather: bool = False):
    """Build and execute one sharded decode of ``packed`` over ``mesh``.

    Pads/truncates the stream to the builder's local_words * n_devices
    (beyond-stream tail = zero WORDS, the natural-framing fill contract),
    places it with the 'blocks' sharding, and runs.  Returns
    (output_words ndarray, info dict, jitted fn, staged device input) —
    fn/x are returned so callers can re-dispatch for timing.  With
    ``allgather`` the (possibly host-local) output is gathered across
    processes first (multi-host runbook)."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from .blocks import build_sharded_decoder

    if cfg.channel_in == ChannelIn.FP32:
        raise ValueError("run_sharded certifies the packed (integer) wire "
                         "formats; FP32's f32 wire needs its own staging")
    fn, _plan, local_words, info = build_sharded_decoder(
        cfg, sd, mesh, dec_len, survivor=survivor, backend=backend)
    n_dev = mesh.shape["blocks"]
    need = n_dev * local_words
    arr = np.pad(packed.astype(np.int32),
                 (0, max(0, need - len(packed))))[:need]
    x = jax.device_put(arr, NamedSharding(mesh, P("blocks")))
    out = jax.block_until_ready(fn(x))
    if allgather and jax.process_count() > 1:
        from jax.experimental import multihost_utils
        out = multihost_utils.process_allgather(out, tiled=True)
    return np.asarray(out), info, fn, x
