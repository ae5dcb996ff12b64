"""Waterfall-level validation of the fused generator's Box-Muller noise.

The unit tests lock the noise distribution (moments + 3-sigma tail mass,
tests/test_genkernel.py); this check locks what actually matters to the
product: the BER the decoder measures.  Both generators draw different
random streams of the same nominal AWGN, so their BER-vs-SNR curves must
agree within binomial counting error.  Runs the in-graph simulation at
32M bits per point (BEN ~ tens of thousands in the waterfall, so the
statistical error per point is ~1-2% even with Viterbi burst-error
correlation inflating the variance).

Writes bench/ber_generator_compare.json; exits nonzero on disagreement
(>25% relative at points where both BERs exceed 1e-4).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from tpu_viterbi.config import ChannelIn, DecoderConfig
from tpu_viterbi.sharding.mesh import make_block_mesh
from tpu_viterbi.sharding.simulate import build_sharded_simulation

N = 32_000_000
SNRS = (0.0, 0.5, 1.0)
T0 = time.time()


def log(s):
    print(f"+{time.time()-T0:6.1f}s {s}", flush=True)


def main():
    cfg = DecoderConfig(channel_in=ChannelIn.SOFT8)
    mesh = make_block_mesh(jax.devices()[:1])
    rows = []
    ok = True
    for snr in SNRS:
        bers = {}
        for gen in ("pallas", "xla"):
            fn, m = build_sharded_simulation(cfg, N, mesh, snr_db=snr,
                                             generator=gen, dec_len=8192)
            ben = int(jax.block_until_ready(fn(jax.random.PRNGKey(17))))
            bers[gen] = ben / m
            rows.append({"snr_db": snr, "generator": gen, "ben": ben,
                         "bits": m, "ber": ben / m})
            log(f"snr={snr:4.1f} {gen:6s}: BEN {ben:9d}  BER {ben/m:.3e}")
        bp, bx = bers["pallas"], bers["xla"]
        if bp > 1e-4 and bx > 1e-4:
            rel = abs(bp - bx) / max(bp, bx)
            if rel > 0.25:
                log(f"  DISAGREE at snr={snr}: rel diff {rel:.1%}")
                ok = False
            else:
                log(f"  agree: rel diff {rel:.2%}")
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "bench", "ber_generator_compare.json")
    with open(out, "w") as f:
        json.dump(rows, f, indent=1)
        f.write('\n')
    log(f"wrote {out}")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
