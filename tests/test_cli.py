"""CLI surface: every script parses --help (argument-surface regression guard)."""
import glob
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRIPTS = sorted(glob.glob(os.path.join(REPO, "scripts", "*.py")))


@pytest.mark.parametrize("script", [s for s in SCRIPTS if not s.endswith("_common.py")],
                         ids=lambda s: os.path.basename(s))
def test_script_help(script):
    out = subprocess.run([sys.executable, script, "--help"], capture_output=True,
                         text=True, timeout=240, cwd=REPO)
    assert out.returncode == 0, out.stderr[-2000:]
    assert "usage" in out.stdout.lower()
