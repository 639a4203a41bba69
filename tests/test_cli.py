"""CLI surface: the demo must print 'Verification pass' + the
16-column result row (reference demo scripts contract)."""

import subprocess
import sys

import pytest


@pytest.mark.slow
def test_demo_ccnn_cli():
    r = subprocess.run(
        [sys.executable, "-m", "zkcnn_tpu.cli.demo_lenet", "--synthetic",
         "--model", "ccnn", "--pic-cnt", "1", "--cpu", "--no-pcs"],
        capture_output=True, text=True, timeout=3600)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "Verification pass" in r.stderr
    row = [l for l in r.stdout.splitlines() if l.count(",") >= 15]
    assert row, r.stdout
