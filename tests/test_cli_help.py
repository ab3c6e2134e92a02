"""Every CLI's --help must exit 0.

Regression: serve.py's --scoped_vmem_kib help text contained an
unescaped '%' ("-7% device time"), which argparse's %-interpolation
(help % params) turned into a TypeError — `--help` crashed with rc=1.
argparse interpolates EVERY help string, so any literal % must be %%.
"""

import subprocess
import sys

import pytest

CLIS = ["serve", "export_model", "export_torch", "train_teacher",
        "train_student", "test_eval"]


@pytest.mark.parametrize("mod", CLIS)
def test_cli_help_exits_zero(mod):
    r = subprocess.run(
        [sys.executable, "-m", f"moma_tpu.cli.{mod}", "--help"],
        capture_output=True, text=True, timeout=120)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "usage" in r.stdout.lower()
