"""Isolate SOFT16's ~5 ns/stage gap over SOFT8 (VERDICT r2 item 8).

HARD and SOFT8 measure identically (26.2 ns/stage at 32M despite an 8x
input-width difference), so bandwidth/unpack-op-count explanations fail.
Remaining suspects, each isolated by a row below (k-multi slope, 32M
bits, BEN=0 gate — all via scripts.r3_sweep.measure):

  soft8/8192            — baseline
  soft8/4096            — is it dec_len? (SOFT16's r2 cap was 4096)
  soft8/2048            — dec_len trend
  soft16/4096           — the shipped SOFT16 point
  soft16/4096/unfused   — is it the fused staging transpose at wpp=32?
  soft16/2048           — does shrinking the per-pack word block help?

Usage: timeout 3600 python scripts/soft16_probe.py [message_bits]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from r3_sweep import measure, log  # noqa: E402


def main():
    import jax
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 32_000_000
    log(f"device: {jax.devices()[0]}")
    cases = [
        ("soft8/8192", "SOFT8", 8192, {}),
        ("soft8/4096", "SOFT8", 4096, {}),
        ("soft8/2048", "SOFT8", 2048, {}),
        ("soft16/4096", "SOFT16", 4096, {}),
        ("soft16/2048", "SOFT16", 2048, {}),
    ]
    for label, ch, dl, kw in cases:
        try:
            measure(label, ch, n, dl, **kw)
        except Exception as e:
            log(f"{label}: FAILED {type(e).__name__}: {str(e)[:160]}")
    # unfused staging A/B needs the fused flag, which measure() does not
    # expose; time it directly
    import jax.numpy as jnp
    import numpy as np
    from tpu_viterbi.chain import packed_workload
    from tpu_viterbi.config import ChannelIn, DecoderConfig
    from tpu_viterbi.decoder.core_pallas import decode_packed_pallas
    from tpu_viterbi.decoder.core_xla import plan_blocks
    cfg = DecoderConfig(channel_in=ChannelIn.SOFT16)
    m = cfg.get_message_len(2 * n)
    plan = plan_blocks(m, 32, 4096)

    def dc(packed, ref):
        out = decode_packed_pallas(packed, cfg, plan, fused=False)
        return jnp.sum(jax.lax.population_count(out ^ ref)
                       .astype(jnp.int32))

    def kmulti(*flat):
        return sum(dc(p, r) for p, r in zip(flat[0::2], flat[1::2]))

    @jax.jit
    def mk(key):
        from tpu_viterbi.chain.quantize import pack_words
        bits, packed = packed_workload(key, n, ChannelIn.SOFT16, 5.5,
                                       8192.0)
        ref = pack_words(bits[cfg.extra_l: cfg.extra_l + m]
                         .astype(jnp.uint32), 1)
        return packed, ref

    ws = [jax.block_until_ready(mk(jax.random.PRNGKey(31 + i)))
          for i in range(6)]
    flat = lambda t: [x for pair in t for x in pair]
    j1, jh = jax.jit(kmulti), jax.jit(kmulti)
    ben = int(np.asarray(j1(*flat(ws[:1]))))
    np.asarray(jh(*flat(ws[:4])))
    tl, th = [], []
    for j in range(4):
        t0 = time.perf_counter()
        np.asarray(j1(*flat([ws[1 + (j % 5)]])))
        tl.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        np.asarray(jh(*flat([ws[(j + 2 + i) % 6] for i in range(4)])))
        th.append(time.perf_counter() - t0)
    s = (min(th) - min(tl)) / 3
    tiles = -(-plan.num_blocks // 128)
    stages = tiles * plan.n_packs * plan.bits_per_pack
    log(f"soft16/4096/unfused: {m/s/1e9:.3f} Gb/s ({s*1e3:.2f} ms, "
        f"{s*1e9/stages:.2f} ns/stage, BEN={ben})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
