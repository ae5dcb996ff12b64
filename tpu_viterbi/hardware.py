"""Hardware model: per-device-kind constants the decode planner and the
bench's utilization accounting read, instead of chip-baked literals
(VERDICT r4 item 2).  The reference sizes its shared memory dynamically
per config/device (reference: src/viterbi/viterbi.cu:95-96, 212-215 —
`cudaOccupancyMaxActiveBlocksPerMultiprocessor` + per-config smem bytes);
the TPU analog is this table + an on-hardware probe.

Resolution order for every knob:

  1. explicit environment override (``TPU_VITERBI_VMEM_BUDGET`` bytes) —
     read on every call so tests and deployments can retarget without
     re-importing,
  2. the measured per-device-kind table below,
  3. a conservative default (the smallest measured value), so an unknown
     chip degrades to smaller-dec_len plans / the windowed survivor —
     never to a Mosaic scoped-vmem compile crash.

Only MEASURED numbers go in the table (``probe_vmem_budget`` below is how
a new kind gets measured: ``python -m tpu_viterbi.hardware`` on the target
prints the probed scoped-VMEM budget to put here or in the env var).
Guessing a larger budget for an unmeasured kind would trade a clean
fallback for a compile failure.
"""

from __future__ import annotations

import functools
import os

# Scoped-VMEM budget (bytes) the kernel's static buffers must fit in, by
# device-kind substring (matched case-insensitively, first hit wins).
# "TPU v5 lite" (v5e): XLA's scoped-vmem allocator enforces a 16.00M limit
# (measured: the FP32 two-stream kernel at dec_len 8192 was rejected at
# compile time with "Scoped allocation with size 24.44M and limit 16.00M"
# — exactly vmem_footprint_bytes' prediction — while the 15.0M SOFT8 bench
# config compiles and runs).
_VMEM_BUDGET_BY_KIND = (
    ("v5 lite", 16 * 10 ** 6),
    ("v5e", 16 * 10 ** 6),
)
_VMEM_BUDGET_DEFAULT = 16 * 10 ** 6

# VPU issue-rate / ALU-floor constants for the bench's utilization
# accounting (BASELINE.md "MFU accounting"), by device-kind substring.
# Measured on "TPU v5 lite" via scripts/op_cost_probe.py: ~0.85 ns per
# (32,128) int32 vector op sustained (= 4 vregs / 0.85 ns), and a ~15
# minimal-op ACS-stage floor of 12.75 ns per 128-block tile.  For kinds
# with no measurement the bench OMITS mfu/alu-floor fields rather than
# mis-reporting against another chip's issue rate.
_VPU_MODEL_BY_KIND = (
    # substring, (alu_floor_ns, stage_vreg_ops, vreg_ops_per_ns)
    ("v5 lite", (12.75, 60, 4.7)),
    ("v5e", (12.75, 60, 4.7)),
)


def device_kind() -> str:
    """Device-kind string of the default backend's first device, '' when
    no backend is reachable.  Cached per process (stable for its life)."""
    return _device_kind_cached()


@functools.lru_cache(maxsize=None)
def _device_kind_cached() -> str:
    try:
        import jax
        return jax.devices()[0].device_kind
    except Exception:
        return ""


def _lookup(table, kind):
    k = kind.lower()
    for sub, val in table:
        if sub in k:
            return val
    return None


def vmem_budget_bytes(kind: str = None) -> int:
    """Per-core scoped-VMEM budget (bytes) for kernel static buffers.

    Env override ``TPU_VITERBI_VMEM_BUDGET`` (bytes, checked every call)
    beats the measured per-kind table, which beats the conservative
    default.  Every VMEM gate in the planner (pallas_supported,
    resolve_window, decode_packed_pallas) reads through here."""
    env = os.environ.get("TPU_VITERBI_VMEM_BUDGET")
    if env:
        return int(env)
    v = _lookup(_VMEM_BUDGET_BY_KIND, kind if kind is not None
                else device_kind())
    return v if v is not None else _VMEM_BUDGET_DEFAULT


def vpu_model(kind: str = None):
    """(alu_floor_ns, stage_vreg_ops, vreg_ops_per_ns) for the bench's
    utilization fields, or None when this device kind has no measured
    issue-rate model (the bench then omits mfu_pct/alu_floor_pct)."""
    return _lookup(_VPU_MODEL_BY_KIND, kind if kind is not None
                   else device_kind())


def probe_vmem_budget(lo: int = 4 * 10 ** 6, hi: int = 192 * 10 ** 6,
                      steps: int = 8) -> int:
    """Measure the scoped-VMEM budget of the CURRENT backend by binary
    search on the scratch size a trivial Pallas kernel may allocate: each
    probe is an AOT ``.lower().compile()`` (~1 s on this backend; the
    scoped-allocation rejection is a compile-time error, no dispatch).
    Returns the largest passing scratch size in bytes — the number to
    feed TPU_VITERBI_VMEM_BUDGET (or the table above) on a new chip."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def fits(nbytes: int) -> bool:
        rows = max(8, nbytes // (128 * 4))

        def kernel(o_ref, scratch):
            scratch[0, :] = jnp.zeros((128,), jnp.int32)
            o_ref[...] = scratch[0:8, :]

        call = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32),
            scratch_shapes=[pltpu.VMEM((rows, 128), jnp.int32)],
        )
        try:
            jax.jit(call).lower().compile()
            return True
        except Exception as e:
            # Only the scoped-allocation rejection means "over budget".
            # Treating ANY failure (relay hiccup, unrelated compile error)
            # as over-budget would silently converge the search to a
            # too-small budget and demote every future plan on this chip
            # (code-review r5 finding) — anything else must surface.
            msg = str(e).lower()
            if ("scoped allocation" in msg or "vmem" in msg
                    or "resource_exhausted" in msg
                    or "resource exhausted" in msg):
                return False
            raise RuntimeError(
                f"probe compile at {nbytes} bytes failed for a reason "
                f"other than the scoped-VMEM limit: {e}") from e

    if not fits(lo):
        raise RuntimeError(f"probe floor {lo} bytes already fails to "
                           "compile — not a scoped-vmem limit")
    for _ in range(steps):
        mid = (lo + hi) // 2
        if fits(mid):
            lo = mid
        else:
            hi = mid
    return lo


if __name__ == "__main__":
    k = device_kind()
    print(f"device_kind: {k!r}")
    print(f"table/default budget: {vmem_budget_bytes()} bytes")
    print("probing scoped-VMEM budget (a few AOT compiles)...")
    print(f"probed budget: {probe_vmem_budget()} bytes")
