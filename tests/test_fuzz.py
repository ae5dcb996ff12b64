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
from tpu_viterbi.config import ALL_VALID_CONFIGS, ChannelIn, CompMode
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

    for k, off in enumerate(plan.offsets()):
        want = golden_decode_block(r[off:off + plan.block_len], plan.dec_len)
        lo, n = 0, len(want)
        if k == plan.num_blocks - 1:
            lo = plan.overlap_bits
        else:
            n = min(n, max(0, (message_len - plan.dec_len) - off))
        assert np.array_equal(bits[off + lo: off + n], want[lo:n]), (
            f"trial={trial} cfg={cfg} block={k} off={off}")
