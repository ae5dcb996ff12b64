"""dec_len 4096 vs 8192 A/B for the headline SOFT8 config, interleaved
in ONE process, 3 rounds each (scripts/soft16_probe.py r3 measured 4096
at 24.95 vs 8192 at 26.59 ns/stage — if that holds, the bench default
moves).

Usage: timeout 3600 python scripts/declen_ab.py [message_bits]
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
    results = {4096: [], 8192: []}
    for rnd in range(3):
        for dl in (8192, 4096):
            r = measure(f"soft8/{dl}/r{rnd}", "SOFT8", n, dl)
            if r and "ns_per_stage" in r:
                results[dl].append(r["ns_per_stage"])
    for dl, v in results.items():
        log(f"dec_len {dl}: {v} -> min {min(v):.2f} ns/stage")
    a, b = min(results[4096]), min(results[8192])
    log(f"verdict: {'4096 wins' if a < b * 0.99 else '8192 stands'} "
        f"({a:.2f} vs {b:.2f})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
