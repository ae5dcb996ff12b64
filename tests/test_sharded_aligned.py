"""N>1-device execution of the ALIGNED zero-copy sharded decode path
(VERDICT r4 item 1).

The production multi-chip wiring (sharding/blocks.py aligned branch: the
shard stream IS the kernel's bitcast body; the ppermute'd neighbor halo
rides the decode_packed_pallas ``tail_halo`` tile-edge input) previously
ran only where jax.devices() had one TPU — the wraparound-to-self ppermute
there would hide any neighbor-orientation bug.  With
backend='pallas-interpret' threaded through build_sharded_decoder the
branch executes on the 8-device CPU mesh: these tests pin, on coded input,

  - that the aligned branch actually engages (info['aligned']),
  - bit-equality of aligned vs unaligned (concat-staging) sharded decodes,
  - bit-equality against the XLA scan core at the same framing, and
  - the same for the windowed (one-pointer) survivor riding tail_halo.

The kernel-level tail_halo contract stays locked single-process by
tests/test_roll_staging.py; this is the cross-device wiring on top.
"""

import jax
import numpy as np
import pytest

from tpu_viterbi.config import ChannelIn, DecoderConfig
from tpu_viterbi.sharding.blocks import build_sharded_decoder
from tpu_viterbi.sharding.certify import coded_workload, run_sharded
from tpu_viterbi.sharding.mesh import make_block_mesh
from tpu_viterbi.utils.bits import unpack_msb_first

EXTRA_L = 26
DEC_LEN = 64                 # smallest roll-halo dec_len (>= WARMUP)
SD_ALIGNED = 128 * DEC_LEN   # one full lane tile of blocks per device
N_DEV = 8

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < N_DEV, reason="needs 8 (virtual) devices")


@pytest.fixture(autouse=True)
def _clear_jit_caches():
    # big interpret-mode HLO graphs; see test_word_mode_golden
    jax.clear_caches()
    yield


def _coded_workload(n, sigma, seed=23):
    # shared certification recipe (sharding/certify.py) — the same
    # workload builder the dryrun and pod runbook certify with
    return coded_workload(n, sigma, seed)


def _run(cfg, sd, mesh, packed, backend, survivor="auto"):
    out, info, _fn, _x = run_sharded(cfg, sd, mesh, DEC_LEN, packed,
                                     backend=backend, survivor=survivor)
    return out, info


@pytest.mark.slow   # ~100 s of interpret compiles; also certified every
                    # round by dryrun_multichip's aligned step
def test_aligned_tail_halo_branch_runs_and_matches_at_8_devices():
    n = N_DEV * SD_ALIGNED
    cfg = DecoderConfig(channel_in=ChannelIn.SOFT8)
    bits, packed = _coded_workload(n, sigma=0.4)
    mesh = make_block_mesh(jax.devices()[:N_DEV])
    m = cfg.get_message_len(2 * n)
    mw = m // 32

    out_al, info_al = _run(cfg, SD_ALIGNED, mesh, packed,
                           backend="pallas-interpret")
    assert info_al == {"backend": "pallas-interpret", "aligned": True,
                       "window": False}

    # unaligned comparator at sd + 2 blocks: same global 64-bit block
    # starts (so the decodes must agree bit-for-bit on the valid message
    # prefix), but the shard is no longer a lane-tile multiple -> the
    # concat-staging branch
    sd_un = SD_ALIGNED + 2 * DEC_LEN
    out_un, info_un = _run(cfg, sd_un, mesh, packed,
                           backend="pallas-interpret")
    assert info_un["aligned"] is False
    assert info_un["backend"] == "pallas-interpret"

    # XLA scan core at the aligned framing (concat halo, same blocks)
    out_x, info_x = _run(cfg, SD_ALIGNED, mesh, packed, backend="xla")
    assert info_x == {"backend": "xla", "aligned": False, "window": False}

    assert np.array_equal(out_al[:mw], out_un[:mw])
    assert np.array_equal(out_al[:mw], out_x[:mw])

    # and the decode is actually a decode: near-zero errors at sigma 0.4
    got = unpack_msb_first(out_al[:mw], 32)[:m]
    err = np.count_nonzero(got != bits[EXTRA_L: EXTRA_L + m])
    assert err <= m // 10_000


@pytest.mark.slow
def test_aligned_windowed_survivor_at_8_devices():
    """The one-pointer survivor window riding the tail_halo edge input:
    an explicitly requested window is honored on the interpret backend
    and stays bit-equal to the full store on coded input."""
    n = N_DEV * SD_ALIGNED
    cfg = DecoderConfig(channel_in=ChannelIn.SOFT8)
    bits, packed = _coded_workload(n, sigma=0.4, seed=5)
    mesh = make_block_mesh(jax.devices()[:N_DEV])
    mw = cfg.get_message_len(2 * n) // 32

    out_w, info_w = _run(cfg, SD_ALIGNED, mesh, packed,
                         backend="pallas-interpret", survivor="window")
    assert info_w == {"backend": "pallas-interpret", "aligned": True,
                      "window": True}
    out_f, _ = _run(cfg, SD_ALIGNED, mesh, packed,
                    backend="pallas-interpret", survivor="full")
    assert np.array_equal(out_w[:mw], out_f[:mw])


def test_sharded_window_request_rejected_on_xla_fallback():
    """survivor='window' + an XLA-core resolution must fail loudly
    (VERDICT r4 item 4), matching ViterbiTPU's rejection."""
    cfg = DecoderConfig(channel_in=ChannelIn.SOFT8)
    mesh = make_block_mesh(jax.devices()[:N_DEV])
    with pytest.raises(ValueError, match="survivor='window'"):
        build_sharded_decoder(cfg, SD_ALIGNED, mesh, DEC_LEN,
                              survivor="window", backend="xla")
    # and on 'auto' off-TPU (pallas unsupported -> xla fallback)
    with pytest.raises(ValueError, match="survivor='window'"):
        build_sharded_decoder(cfg, SD_ALIGNED, mesh, DEC_LEN,
                              survivor="window", backend="auto")
