"""CLI driver tests (reference: src/main.cpp): flag parsing, validity
errors with reference strings, and an end-to-end noiseless run."""

import numpy as np
import pytest

from tpu_viterbi import cli


def test_invalid_combo_exit_codes(capsys):
    assert cli.main(["-i", "s16", "-m", "f16", "-n", "1000"]) == -1
    assert "fp16 metric does not support 16-bit" in capsys.readouterr().err
    assert cli.main(["-i", "s16", "-m", "b16", "-n", "1000"]) == -1
    assert cli.main(["-i", "s8", "-m", "f16", "-n", "1000"]) == -1
    assert cli.main(["-m", "f16", "-c", "dpx", "-n", "1000"]) == -1


def test_cli_end_to_end_noiseless(capsys):
    rc = cli.main(["-n", "20000", "-s", "15", "-i", "s8", "-m", "b32",
                   "--seed", "7", "--dec-len", "512", "--backend", "xla"])
    out = capsys.readouterr().out
    assert rc == 0
    assert "Pipeline executed." in out
    assert "BEN: 0" in out


def test_cli_verbose_config_echo(capsys):
    rc = cli.main(["-n", "20000", "-s", "15", "-i", "s4", "-m", "b16",
                   "-o", "b16", "--seed", "7", "-v", "--dec-len", "256",
                   "--backend", "xla"])
    out = capsys.readouterr().out
    assert rc == 0
    assert "Input Channel Type: 4-bit Soft Decision" in out
    assert "Metric Type: 16-bit" in out
    assert "Output Type: 16-bit" in out
    assert "kernel time" in out  # -v prints pipeline status


def test_cli_guards_match_options_valid():
    """The CLI's hand-rolled runtime guards (mirroring the reference's
    main.cpp:26-41) must reject exactly the combos config.options_valid
    rejects."""
    from tpu_viterbi.config import (ChannelIn, CompMode, DecodeOut, Metric,
                                    options_valid)

    ch_flag = {ChannelIn.HARD: "h", ChannelIn.SOFT4: "s4",
               ChannelIn.SOFT8: "s8", ChannelIn.SOFT16: "s16",
               ChannelIn.FP32: "f"}
    m_flag = {Metric.M_B32: "b32", Metric.M_B16: "b16", Metric.M_FP16: "f16"}
    o_flag = {DecodeOut.O_B32: "b32", DecodeOut.O_B16: "b16"}
    c_flag = {CompMode.REG: "reg", CompMode.DPX: "dpx"}

    for ch in ChannelIn:
        for m in Metric:
            for o in DecodeOut:
                for c in CompMode:
                    argv = ["-i", ch_flag[ch], "-m", m_flag[m],
                            "-o", o_flag[o], "-c", c_flag[c], "-n", "0"]
                    rc = cli.main(argv)
                    if options_valid(ch, m, o, c):
                        # valid combos get past the guards and fail later
                        # on the degenerate -n 0 (anything but the -1
                        # validity exit)
                        assert rc != -1, (ch, m, o, c)
                    else:
                        assert rc == -1, (ch, m, o, c)


def test_cli_e2e_device_mode(capsys):
    rc = cli.main(["-n", "40000", "-s", "15", "-i", "s8", "-m", "b32",
                   "--seed", "5", "--e2e-device", "-v"])
    out = capsys.readouterr().out
    assert rc == 0
    assert "BEN: 0" in out
    assert "In-graph chain over" in out


def test_cli_flag_interplay(capsys):
    """--e2e-device rejects the pipeline-only knobs instead of silently
    ignoring them, and --generator requires --e2e-device (VERDICT r3
    item 6)."""
    base = ["-n", "40000", "-s", "15", "--seed", "5"]
    assert cli.main(base + ["--e2e-device", "--backend", "xla"]) == -1
    assert "--backend is not applicable" in capsys.readouterr().err
    assert cli.main(base + ["--e2e-device", "--time-mode", "slope"]) == -1
    assert "--time-mode is not applicable" in capsys.readouterr().err
    assert cli.main(base + ["--generator", "xla"]) == -1
    assert "--generator requires --e2e-device" in capsys.readouterr().err


def test_cli_window_survivor_rejected_off_tpu(capsys):
    """An explicit --survivor window the resolved core cannot honor fails
    loudly instead of silently decoding full-store (VERDICT r4 item 4):
    --backend xla is rejected up front; backend auto off-TPU resolves to
    the XLA fallback and is rejected at build time with the same Error
    line (no traceback)."""
    base = ["-n", "40000", "-s", "15", "--seed", "5"]
    assert cli.main(base + ["--survivor", "window",
                            "--backend", "xla"]) == -1
    assert "--survivor window requires" in capsys.readouterr().err
    assert cli.main(base + ["--survivor", "window"]) == -1
    err = capsys.readouterr().err
    assert err.startswith("Error: survivor='window' requires"), err
    # --e2e-device path rejects too (build_sharded_decoder raise)
    assert cli.main(base + ["--e2e-device", "--survivor", "window"]) == -1
    assert "survivor='window' requires" in capsys.readouterr().err


def test_api_window_survivor_rejected_off_tpu():
    """ViterbiTPU(survivor='window') on an XLA-core resolution raises at
    build time (api.py loud rejection) — and 'auto'/'full' still work."""
    from tpu_viterbi.config import ChannelIn, DecoderConfig
    from tpu_viterbi.decoder.api import ViterbiTPU

    cfg = DecoderConfig(channel_in=ChannelIn.SOFT8)
    with pytest.raises(ValueError, match="survivor='window'"):
        ViterbiTPU(cfg, dec_len=256, survivor="window")._build(20000)
    with pytest.raises(ValueError, match="survivor='window'"):
        ViterbiTPU(cfg, dec_len=256, survivor="window",
                   backend="xla")._build(20000)
    # interpret backend honors the request instead
    fn, plan, _ = ViterbiTPU(cfg, dec_len=256, survivor="window",
                             backend="pallas-interpret")._build(20000)
    assert fn is not None
    ViterbiTPU(cfg, dec_len=256, survivor="auto")._build(20000)


def test_cli_e2e_device_generator_explicit(capsys):
    """--generator is plumbed through to build_sharded_simulation."""
    rc = cli.main(["-n", "40000", "-s", "15", "-i", "s8", "--seed", "5",
                   "--e2e-device", "--generator", "xla"])
    out = capsys.readouterr().out
    assert rc == 0
    assert "BEN: 0" in out
