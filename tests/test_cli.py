import os
import sys

import numpy as np

from ems_nbldpc_tpu.cli import main


def test_cli_reference_positional_form(tmp_path):
    rc = main([
        "512", "8", "Mat24_N48_M24", "3.0", "12", "0.3", "24",
        "--batch", "256", "--out", str(tmp_path), "--quiet",
    ])
    assert rc == 0
    files = os.listdir(tmp_path)
    assert "results.jsonl" in files
    assert any(f.startswith("results_N48") for f in files)


def test_cli_flag_form_sweep(tmp_path):
    rc = main([
        "--matrix", "Mat24_N48_M24", "--ebn0", "2.5,3.0", "--iters", "6",
        "--nm", "12", "--batch", "128", "--max-frames", "128",
        "--stop-errors", "100000", "--out", str(tmp_path), "--quiet",
    ])
    assert rc == 0
    lines = open(tmp_path / "results.jsonl").read().splitlines()
    assert len(lines) == 2
