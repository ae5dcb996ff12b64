"""On-hardware qualification as pytest (run manually, serially, on a TPU):

    timeout 3600 python -m pytest tests_tpu/ -x -q

Unlike tests/ (hermetic CPU, see tests/conftest.py), this directory runs
on whatever accelerator the process sees and wraps the qualification
scripts in scripts/README.md.  Each test is skipped off-TPU.
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _on_tpu():
    import jax
    return jax.default_backend() in ("tpu", "axon")


requires_tpu = pytest.mark.skipif(not _on_tpu(), reason="needs a TPU")


def _run(script, *args):
    r = subprocess.run([sys.executable, os.path.join(REPO, "scripts",
                                                     script), *args],
                       capture_output=True, text=True, timeout=1700)
    assert r.returncode == 0, f"{script} failed:\n{r.stdout[-2000:]}\n" \
                              f"{r.stderr[-2000:]}"


@requires_tpu
def test_kernel_matches_golden():
    _run("check_pallas.py")


@requires_tpu
def test_word_mode_matches_value_mode():
    _run("check_word_mode.py")


@requires_tpu
def test_metric_dtypes_equivalent():
    _run("check_metric_equiv.py")


@requires_tpu
def test_randomized_fuzz():
    _run("fuzz_tpu.py", "16", "9000")


@requires_tpu
def test_fused_generator_kernel():
    """Fused Pallas workload generator: on-chip output bit-identical to
    interpret mode for every integer channel, sharded entry bit-identical
    to the local one, plus generation / in-graph-sim slope timings."""
    _run("check_genkernel.py")


@requires_tpu
def test_generator_ber_waterfall_agreement():
    """The fused generator's Box-Muller AWGN must reproduce the XLA
    chain's BER waterfall within binomial error (32M bits/point)."""
    _run("check_gen_ber.py")


@requires_tpu
def test_all_channel_formats_decode_at_speed():
    """Every channel input format (HARD/SOFT4/SOFT8/SOFT16/FP32) must
    decode error-free at 5.5 dB through its production kernel path and
    report a sane k-multi throughput slope (8M bits keeps battery runtime
    down; the 32M reference table lives in bench/channel_throughput.json)."""
    _run("channel_throughput.py", "8000000")


@requires_tpu
def test_ingraph_simulation_on_chip():
    """The fully in-graph chain (sharded generation -> decode -> BEN, one
    scalar off-device) must run on the real chip over a 1-device mesh and
    decode error-free at 5.5 dB (validated at 4M bits / 280 s compile,
    77 ms steady-state per call; kept small here for battery runtime)."""
    import jax

    from tpu_viterbi.config import ChannelIn, DecoderConfig
    from tpu_viterbi.sharding.mesh import make_block_mesh
    from tpu_viterbi.sharding.simulate import simulate_sharded

    cfg = DecoderConfig(channel_in=ChannelIn.SOFT8)
    mesh = make_block_mesh(jax.devices()[:1])
    ben, m = simulate_sharded(cfg, 500_000, mesh, snr_db=5.5, seed=1,
                              dec_len=2048)
    assert m == cfg.get_message_len(1_000_000)
    assert ben == 0


@requires_tpu
def test_pod_runbook_single_chip():
    """The pod-readiness runbook (bringup -> aligned zero-copy sharded
    decode -> census -> linearity) must PASS end to end on the real chip
    (1-device mesh: census is skipped there, the aligned branch runs the
    REAL Pallas kernel with the ppermute wrapping to self, and the
    linearity step slope-times it)."""
    _run("pod_runbook.py", "-n", "4194304")


@requires_tpu
def test_cli_file_serving_on_chip(tmp_path):
    """The CLI serving surface (--decode-file) on the real kernel: a 4M-bit
    SOFT8 stream written to disk decodes through `cli.main` with BEN=0
    against its generating ground truth (r5 file mode)."""
    import jax
    import numpy as np

    from tpu_viterbi import cli
    from tpu_viterbi.chain import packed_workload
    from tpu_viterbi.config import ChannelIn, DecoderConfig
    from tpu_viterbi.utils.bits import count_bit_errors

    cfg = DecoderConfig(channel_in=ChannelIn.SOFT8)
    bits, packed = packed_workload(jax.random.PRNGKey(5), 4_000_000,
                                   ChannelIn.SOFT8, 5.5, 32.0)
    f = str(tmp_path / "chan.bin")
    np.asarray(packed, dtype=np.int32).tofile(f)
    rc = cli.main(["-i", "s8", "--decode-file", f, "--dec-len", "auto"])
    assert rc == 0
    dec = np.fromfile(f + ".dec", dtype=np.uint32)
    ben = count_bit_errors(dec, cfg.bits_per_pack, np.asarray(bits),
                           cfg.extra_l)
    assert ben == 0


@requires_tpu
def test_pack_precision_and_fp32_ud_exact():
    """r3 staging exactness: DEFAULT-precision pack matmuls for <=8-bit
    fields, HIGH-precision one-hot FP32 deinterleave, FP32 u/d word-mode
    decode vs the XLA float core, and windowed-vs-full survivor kernels
    — all bit-exact on chip (scripts/check_pack_exact.py)."""
    _run("check_pack_exact.py")
