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
from tpu_viterbi.decoder.core_pallas import (VMEM_BUDGET_BYTES,
                                             pallas_supported,
                                             vmem_footprint_bytes)
from tpu_viterbi.decoder.core_xla import plan_blocks


CFG = DecoderConfig(channel_in=ChannelIn.SOFT8)


def test_footprint_matches_known_hardware_points():
    # the shipped bench config (dec_len 8192, lane_tile 128) compiles and
    # runs on v5e; lane_tile 512 at the same dec_len fails in Mosaic
    # ("exceeds VMEM", CLAUDE.md) — the estimate must bracket both
    plan = plan_blocks(32_000_000, 32, 8192)
    good = vmem_footprint_bytes(CFG, plan, lane_tile=128)
    bad = vmem_footprint_bytes(CFG, plan, lane_tile=512)
    assert good <= VMEM_BUDGET_BYTES
    assert bad > VMEM_BUDGET_BYTES
    # footprint scales with the survivor store
    assert bad > 3 * good


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
    for cfg in (CFG, DecoderConfig(channel_in=ChannelIn.HARD),
                DecoderConfig(channel_in=ChannelIn.SOFT16)):
        assert pallas_supported(cfg, plan_blocks(32_000_000, 32, 8192))


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
