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
