"""Deep-BER tail extension (VERDICT r4 item 6): the deepest anchors in
bench/ber_deep.json had 8-74 error events per 128M bits; this drives the
deepest SNR per format to >= TARGET_EVENTS error events (or the bits cap),
via the fused in-graph chain (generate + decode + count as ONE jitted
program, only a scalar per call) — specifically to bound any
windowed-survivor error floor now that the windowed buffer is the default
plan for SOFT16/FP32 at dec_len 8192 (resolve_window auto).

The decode runs the PRODUCTION plan for each format (dec_len 8192,
survivor 'auto'): SOFT16 rides the windowed Pallas kernel, FP32 the
u/d-word windowed kernel, HARD/SOFT4/SOFT8 the full store.  A second
s16 row at dec_len 4096 (full store fits) gives the windowed-vs-full
deep-tail A/B at matched statistics.

Writes/merges bench/ber_deep_tail.json.

Usage: timeout 3600 python scripts/ber_deep_tail.py [max_bits] [cfg,cfg..]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = 32_000_000
TARGET_EVENTS = 30
T0 = time.time()


def log(s):
    print(f"+{time.time()-T0:6.1f}s {s}", flush=True)


# deepest SNR per format (project convention sigma = 10^(-SNR/5));
# survivor='auto' rides the production plan at dec_len 8192
CASES = {
    "h/b32": ("HARD", "b32", 2.0, 8192),
    "s4/b32": ("SOFT4", "b32", 1.25, 8192),
    "s8/b32": ("SOFT8", "b32", 1.25, 8192),
    "s16/b32": ("SOFT16", "b32", 1.25, 8192),       # windowed survivor
    "s16/b32/full4096": ("SOFT16", "b32", 1.25, 4096),  # full-store A/B
    "f/b32": ("FP32", "b32", 1.25, 8192),           # windowed u/d words
    "f/b32/value2048": ("FP32", "b32", 1.25, 2048),  # fused VALUE kernel
                                                     # (the API default)
    "s8/b16": ("SOFT8", "b16", 1.125, 8192),
    "s8/b16/deep": ("SOFT8", "b16", 1.25, 8192),     # parity w/ b32 depth
}


def main():
    import jax

    from tpu_viterbi.config import ChannelIn, DecodeOut, DecoderConfig
    from tpu_viterbi.sharding.mesh import make_block_mesh
    from tpu_viterbi.sharding.simulate import build_sharded_simulation

    max_bits = int(sys.argv[1]) if len(sys.argv) > 1 else 1_024_000_000
    only = sys.argv[2].split(",") if len(sys.argv) > 2 else None
    mesh = make_block_mesh(jax.devices()[:1])
    log(f"device: {jax.devices()[0]}; target {TARGET_EVENTS} events or "
        f"{max_bits} bits per point")
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "bench", "ber_deep_tail.json")
    try:
        with open(out) as f:
            rows = [r for r in json.load(f)
                    if only is not None and r["config"] not in only]
    except (OSError, ValueError):
        rows = []
    for name, (ch, dout, snr, dec_len) in CASES.items():
        if only is not None and name not in only:
            continue
        cfg = DecoderConfig(channel_in=ChannelIn[ch],
                            decode_out=(DecodeOut.O_B16 if dout == "b16"
                                        else DecodeOut.O_B32))
        fn, m = build_sharded_simulation(cfg, N, mesh, snr_db=snr,
                                         dec_len=dec_len)
        ben, bits, c = 0, 0, 0
        while bits < max_bits and (ben < TARGET_EVENTS
                                   or bits < 512_000_000):
            ben += int(jax.block_until_ready(
                fn(jax.random.PRNGKey(77_000 + 131 * c))))
            c += 1
            bits = m * c
            if c % 8 == 0:
                log(f"  {name}: {ben} events / {bits//1_000_000}M bits")
        ber = ben / bits
        bound = (f"<{3.0/bits:.2e} (0 events)" if ben == 0 else None)
        rows.append({"config": name, "snr_db": snr, "dec_len": dec_len,
                     "ben": ben, "bits": bits, "ber": ber,
                     **({"upper_bound_95": bound} if bound else {})})
        log(f"{name:16s} snr={snr:5.3f}: BEN {ben:6d} / {bits} "
            f"-> BER {ber:.3e}")
    with open(out, "w") as f:
        json.dump(rows, f, indent=1)
        f.write("\n")
    log(f"wrote {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
