"""Pod-readiness runbook (VERDICT r4 item 8): ONE command that, when real
multi-chip hardware appears, takes the framework from bringup to a
certified multi-chip decode — and that dry-runs end to end on a virtual
CPU mesh today so the procedure itself is always tested.

Steps (each PASS/FAIL, JSON report written to bench/pod_runbook_report.json):

  1 bringup    — (optional) jax.distributed init, device/process census,
                 device kind + resolved VMEM budget (hardware.py)
  2 aligned    — the production zero-copy sharded decode (ppermute
                 tail_halo branch) on CODED input at the full mesh,
                 asserted engaged (info['aligned']) and bit-equal to the
                 XLA core at the same framing
  3 census     — collective audit of the compiled sharded decoder + both
                 in-graph simulations (sharding/audit.py): exactly one
                 halo permute + O(1) boundary permutes + the scalar BEN
                 all-reduce; no all-gathers/all-to-alls
  4 linearity  — k-multi slope of the sharded decode at the full mesh;
                 per-device ns/stage vs the single-chip canary band, and
                 the aggregate Gb/s + chips-to-target projection
                 (BASELINE.json >= 100 Gb/s).  Timing runs only on real
                 TPU meshes; the virtual dry run marks it 'modeled'.

Usage:
  # real hardware (single host or one process per host on a pod):
  timeout 3600 python scripts/pod_runbook.py [-n BITS] \
      [--coordinator host0:1234 --num-processes N --process-id I]

  # virtual dry run of the whole runbook (no TPU needed):
  python scripts/pod_runbook.py --virtual 8
"""

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

T0 = time.time()


def log(msg):
    print(f"[runbook +{time.time()-T0:6.1f}s] {msg}", flush=True)


def reexec_virtual(n):
    env = dict(os.environ)
    env.update({
        "PALLAS_AXON_POOL_IPS": "",
        "JAX_PLATFORMS": "cpu",
        "XLA_FLAGS": (env.get("XLA_FLAGS", "") +
                      f" --xla_force_host_platform_device_count={n}")
        .strip(),
        "TPU_VITERBI_RUNBOOK_VIRTUAL": "1",
    })
    args, skip = [], False
    for a in sys.argv[1:]:
        if skip:
            skip = False
            continue
        if a == "--virtual":
            skip = True
            continue
        if a.startswith("--virtual="):
            continue
        args.append(a)
    os.execvpe(sys.executable, [sys.executable, os.path.abspath(__file__)]
               + args, env)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("-n", "--num", type=int, default=None,
                   help="total message bits (default: 32M/device on TPU, "
                        "8192/device virtual)")
    p.add_argument("--dec-len", type=int, default=None)
    p.add_argument("--virtual", type=int, default=None, metavar="N",
                   help="dry-run the runbook on an N-device virtual CPU "
                        "mesh (re-execs with the right env)")
    p.add_argument("--coordinator", default=None)
    p.add_argument("--num-processes", type=int, default=None)
    p.add_argument("--process-id", type=int, default=None)
    p.add_argument("--probe-vmem", action="store_true",
                   help="also binary-search the real scoped-VMEM budget "
                        "(a few AOT compiles; TPU only)")
    args = p.parse_args()

    if args.virtual and not os.environ.get("TPU_VITERBI_RUNBOOK_VIRTUAL"):
        reexec_virtual(args.virtual)

    from tpu_viterbi.sharding.mesh import initialize_distributed
    initialize_distributed(args.coordinator, args.num_processes,
                           args.process_id)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from tpu_viterbi import hardware
    from tpu_viterbi.config import ChannelIn, DecoderConfig
    from tpu_viterbi.decoder.core_pallas import LANE_TILE
    from tpu_viterbi.sharding.certify import coded_workload, run_sharded
    from tpu_viterbi.sharding.mesh import make_block_mesh

    report = {"steps": {}, "ok": True}

    def step(name, ok, **details):
        report["steps"][name] = {"ok": bool(ok), **details}
        report["ok"] = report["ok"] and bool(ok)
        log(f"step {name}: {'PASS' if ok else 'FAIL'} "
            + " ".join(f"{k}={v}" for k, v in details.items()
                       if not isinstance(v, (list, dict))))

    # ---- 1: bringup ----
    on_tpu = jax.default_backend() in ("tpu", "axon")
    devices = jax.devices()
    mesh = make_block_mesh()
    n_dev = mesh.shape["blocks"]
    kind = hardware.device_kind()
    budget = hardware.vmem_budget_bytes()
    details = dict(n_devices=n_dev, n_processes=jax.process_count(),
                   device_kind=kind, backend=jax.default_backend(),
                   vmem_budget_bytes=budget,
                   vpu_model=hardware.vpu_model())
    if args.probe_vmem and on_tpu:
        details["probed_vmem_bytes"] = hardware.probe_vmem_budget()
    step("bringup", n_dev >= 1 and len(devices) >= n_dev, **details)

    # ---- 2: aligned zero-copy sharded decode on coded input ----
    dec_len = args.dec_len or (8192 if on_tpu else 64)
    align = LANE_TILE * dec_len
    sd = align * max(1, (args.num or (32_000_000 if on_tpu else 8192)
                         * n_dev) // (align * n_dev))
    n_bits = sd * n_dev
    backend = "auto" if on_tpu else "pallas-interpret"
    log(f"aligned decode: {n_bits} bits over {n_dev} devices "
        f"(sd={sd}, dec_len={dec_len}, backend={backend})")
    # shared certification recipe (sharding/certify.py) — the same
    # workload + run wrapper the 8-device CI and dryrun certify with
    bits, packed = coded_workload(n_bits, sigma=0.4, seed=17)
    cfg = DecoderConfig(channel_in=ChannelIn.SOFT8)

    def run_backend(bk):
        return run_sharded(cfg, sd, mesh, dec_len, packed, backend=bk,
                           allgather=True)

    out_p, info_p, fn_p, x_dev = run_backend(backend)
    m = cfg.get_message_len(2 * n_bits)
    mw = m // 32
    from tpu_viterbi.utils.bits import unpack_msb_first
    got = unpack_msb_first(out_p[:mw], 32)[:m]
    ben = int(np.count_nonzero(got != bits[cfg.extra_l: cfg.extra_l + m]))
    out_x, info_x, _, _ = run_backend("xla")
    bit_equal = bool(np.array_equal(out_p[:mw], out_x[:mw]))
    step("aligned_decode", info_p["aligned"] and bit_equal
         and ben <= m // 10_000,
         aligned=info_p["aligned"], backend=info_p["backend"],
         bit_equal_vs_xla=bit_equal, ben=ben, message_bits=m)

    # ---- 3: collective census ----
    if n_dev == 1:
        step("collective_census", True, skipped=True,
             note="single-device mesh: GSPMD elides collectives; the "
                  "8/16/32-device census is locked by "
                  "tests/test_scaling_structure.py")
    else:
        from tpu_viterbi.sharding.audit import run_audit
        audit = run_audit(n_dev)
        dec_census = audit["decoder"]
        ok_census = (list(dec_census.keys()) == ["collective-permute"]
                     and len(dec_census["collective-permute"]) == 1)
        for sim_key in ("sim_pallas", "sim_xla"):
            c = audit[sim_key]
            ok_census &= c.get("all-reduce") == ["s32[]"]
            ok_census &= not any(op in c for op in
                                 ("all-gather", "all-to-all",
                                  "reduce-scatter"))
        step("collective_census", ok_census, decoder=dec_census,
             sim_pallas=audit["sim_pallas"])

    # ---- 4: linearity / throughput ----
    if on_tpu:
        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        from timing_util import slope

        def mk(k):
            return jax.jit(lambda *ws: sum(
                jnp.sum(fn_p(w).view(jnp.int32)) for w in ws))
        # distinct inputs: perturb the staged words (relay memoizes)
        per = jax.jit(lambda x, s: x + s, donate_argnums=())
        xs = [jax.block_until_ready(per(x_dev, jnp.int32(i)))
              for i in range(6)]
        t = slope(mk, xs, reps=3, ks=(1, 4))
        gbps = n_bits / t / 1e9
        per_dev = gbps / n_dev
        model = hardware.vpu_model()
        details = dict(decode_seconds=round(t, 6),
                       aggregate_gbps=round(gbps, 3),
                       per_device_gbps=round(per_dev, 3),
                       chips_for_100gbps=int(np.ceil(100.0 / per_dev)))
        # per-device sanity band: >= 60% of the measured single-chip
        # 4.5-4.8 Gb/s (relay sessions drift ~10-20%; a pod miss beyond
        # that means the halo exchange or sharding regressed)
        ok_lin = per_dev >= 2.7 if model is not None else per_dev > 0
        step("linearity", ok_lin, **details)
    else:
        step("linearity", True, modeled=True,
             note="virtual CPU mesh: timing skipped; census above is the "
                  "structural linearity proof")

    out_path = os.path.join(REPO, "bench", "pod_runbook_report.json")
    if jax.process_index() == 0:
        with open(out_path, "w") as f:
            json.dump(report, f, indent=1)
            f.write("\n")
        log(f"wrote {out_path}")
        log(f"RUNBOOK {'PASS' if report['ok'] else 'FAIL'}")
    return 0 if report["ok"] else 1


if __name__ == "__main__":
    sys.exit(main())
