"""Plan-aware Pallas support / VMEM-budget guard (VERDICT r1 item 5).

A large dec_len blows the kernel's VMEM survivor scratch
((n_packs, 64, lane_tile) int32 — ~34 MB alone at dec_len 32768); these
tests pin that such plans are rejected up front with a clear ValueError /
auto-fallback instead of a raw Mosaic compile crash.
"""

import jax
import pytest

from tpu_viterbi.config import ChannelIn, DecoderConfig
from tpu_viterbi.decoder import core_pallas
from tpu_viterbi.decoder.api import ViterbiTPU
from tpu_viterbi.decoder.core_pallas import (pallas_supported,
                                             vmem_footprint_bytes)
from tpu_viterbi.decoder.core_xla import plan_blocks
from tpu_viterbi.hardware import vmem_budget_bytes


CFG = DecoderConfig(channel_in=ChannelIn.SOFT8)
VMEM_BUDGET_BYTES = vmem_budget_bytes()  # 16M: CPU kind -> measured default


def test_footprint_matches_known_hardware_points():
    # the shipped bench config (dec_len 8192, lane_tile 128) compiles and
    # runs on v5e at ~15.0M of the 16.00M scoped-vmem limit; the FP32
    # two-stream kernel at the same dec_len was rejected by XLA at 24.44M
    # (measured, scripts/check_fp32_scale.py) and lane_tile 512 fails in
    # Mosaic — the estimate must bracket all three
    plan = plan_blocks(32_000_000, 32, 8192)
    good = vmem_footprint_bytes(CFG, plan, lane_tile=128)
    bad = vmem_footprint_bytes(CFG, plan, lane_tile=512)
    assert good <= VMEM_BUDGET_BYTES
    assert bad > VMEM_BUDGET_BYTES
    # footprint scales with the survivor store
    assert bad > 3 * good
    # legacy FP32 two-stream VALUE staging (fp32_words=False): the measured
    # 24.44M XLA rejection at dec_len 8192
    f32v = vmem_footprint_bytes(DecoderConfig(channel_in=ChannelIn.FP32),
                                plan, lane_tile=128, value_mode=True)
    assert 23_000_000 < f32v < 26_000_000     # matches XLA's 24.44M report
    assert f32v > VMEM_BUDGET_BYTES
    # r3 default: FP32 rides u/d WORD mode (SOFT8-shaped words), which
    # fits dec_len 8192 like SOFT8 does
    f32w = vmem_footprint_bytes(DecoderConfig(channel_in=ChannelIn.FP32),
                                plan, lane_tile=128)
    assert f32w <= VMEM_BUDGET_BYTES
    # FP32 value mode rides the Pallas kernel at dec_len 4096 (~13M)
    plan4 = plan_blocks(32_000_000, 32, 4096)
    f32_4k = vmem_footprint_bytes(DecoderConfig(channel_in=ChannelIn.FP32),
                                  plan4, lane_tile=128, value_mode=True)
    assert f32_4k <= VMEM_BUDGET_BYTES


@pytest.mark.parametrize("dec_len", [32768, 65536])
def test_huge_dec_len_rejected(monkeypatch, dec_len):
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    plan = plan_blocks(dec_len, 32, dec_len)
    assert not pallas_supported(CFG, plan)
    with pytest.raises(ValueError, match="VMEM"):
        core_pallas._check_vmem(CFG, plan, core_pallas.LANE_TILE,
                                interpret=False)


def test_default_plans_supported_on_tpu_backend(monkeypatch):
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    for cfg in (CFG, DecoderConfig(channel_in=ChannelIn.HARD)):
        assert pallas_supported(cfg, plan_blocks(32_000_000, 32, 8192))
    # SOFT16's wider words (dpp=2) bust the scoped-vmem budget at dec_len
    # 8192 (~21M > 16M) but fit at the default 2048
    cfg16 = DecoderConfig(channel_in=ChannelIn.SOFT16)
    assert not pallas_supported(cfg16, plan_blocks(32_000_000, 32, 8192))
    assert pallas_supported(cfg16, plan_blocks(32_000_000, 32, 2048))


def test_api_auto_falls_back_and_pallas_raises(monkeypatch):
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    big = plan_blocks(65536, 32, 65536)
    auto = ViterbiTPU(CFG, dec_len=65536)
    assert auto._use_pallas(big) is False       # silently uses the XLA core
    forced = ViterbiTPU(CFG, dec_len=65536, backend="pallas")
    with pytest.raises(ValueError, match="pallas backend requested"):
        forced._use_pallas(big)


def test_interpret_mode_skips_the_guard():
    # interpret mode has no VMEM; small-shape CI must not be rejected
    plan = plan_blocks(65536, 32, 65536)
    core_pallas._check_vmem(CFG, plan, core_pallas.LANE_TILE, interpret=True)


def test_adaptive_vmem_budget(monkeypatch):
    """The hardware model is adaptive, not chip-baked (VERDICT r4 item 2):
    the budget resolves env override > measured per-kind table > the
    conservative default, and every planner decision flips with it —
    SOFT16@8192, windowed-by-necessity under the measured 16M v5e budget,
    must choose the bit-identical full store under a 128M budget."""
    from tpu_viterbi.decoder.core_pallas import resolve_window

    # per-kind table and default resolution
    assert vmem_budget_bytes(kind="TPU v5 lite") == 16 * 10 ** 6
    assert vmem_budget_bytes(kind="TPU v9000") == 16 * 10 ** 6  # conservative
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    cfg16 = DecoderConfig(channel_in=ChannelIn.SOFT16)
    p8192 = plan_blocks(32_000_000 - 64, 32, 8192)

    # measured 16M budget (CPU kind -> default): window by necessity,
    # and the full-store footprint is unsupported
    assert resolve_window("auto", cfg16, p8192) is True
    assert not pallas_supported(cfg16, p8192)

    # 128M budget (e.g. a chip with a larger scoped-vmem limit): the env
    # override is read per call, full store fits -> keep it
    monkeypatch.setenv("TPU_VITERBI_VMEM_BUDGET", str(128 * 10 ** 6))
    assert vmem_budget_bytes() == 128 * 10 ** 6
    assert resolve_window("auto", cfg16, p8192) is False
    assert pallas_supported(cfg16, p8192)
    # _check_vmem accepts under the raised budget too
    core_pallas._check_vmem(cfg16, p8192, core_pallas.LANE_TILE,
                            interpret=False)

    monkeypatch.delenv("TPU_VITERBI_VMEM_BUDGET")
    with pytest.raises(ValueError, match="VMEM"):
        core_pallas._check_vmem(cfg16, p8192, core_pallas.LANE_TILE,
                                interpret=False)


def test_resolve_window_policy():
    from tpu_viterbi.decoder.core_pallas import (resolve_window,
                                                 survivor_window_slots)
    cfg8 = DecoderConfig(channel_in=ChannelIn.SOFT8)
    cfg16 = DecoderConfig(channel_in=ChannelIn.SOFT16)
    p8192 = plan_blocks(32_000_000 - 64, 32, 8192)
    # explicit modes
    assert resolve_window("full", cfg8, p8192) is False
    assert resolve_window("window", cfg8, p8192) is True
    # auto: full fits for SOFT8@8192 -> keep bit-identical full store
    assert resolve_window("auto", cfg8, p8192) is False
    # auto: SOFT16@8192 only fits windowed -> window
    assert resolve_window("auto", cfg16, p8192) is True
    with pytest.raises(ValueError, match="survivor"):
        resolve_window("circular", cfg8, p8192)
    # window depth: chase max(n_conv+1, ceil(64/bpp)) packs + 2 slots —
    # every emitted pack gets >= WINDOW_MIN_CHASE_STAGES = 64 merged
    # stages at EVERY bpp (the 32-stage chase measured ~3x BER; at bpp=16
    # n_conv+1 packs alone would give only 48 stages — survivor_window_
    # slots docstring / BASELINE.md)
    assert survivor_window_slots(cfg8) == 4       # max(2, 2) + 2
    from tpu_viterbi.config import DecodeOut
    cfg16out = DecoderConfig(channel_in=ChannelIn.SOFT8,
                             decode_out=DecodeOut.O_B16)
    assert survivor_window_slots(cfg16out) == 6   # max(3, 4) + 2
