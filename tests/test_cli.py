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


def test_load_conf_override_styles(tmp_path):
    """--key=value and key=value both merge; unknown non-override flags abort
    instead of being silently dropped."""
    sys.path.insert(0, os.path.join(REPO, "scripts"))
    import argparse

    import _common

    cfg = tmp_path / "c.yaml"
    cfg.write_text("diffusion:\n  params:\n    var_type: fixed_large\n")
    args = argparse.Namespace(config=str(cfg))

    conf = _common.load_conf(args, ["--diffusion.params.var_type=fixed_small"])
    assert conf.diffusion.params.var_type == "fixed_small"
    conf = _common.load_conf(args, ["diffusion.params.var_type=learned_range"])
    assert conf.diffusion.params.var_type == "learned_range"

    import pytest as _pytest
    with _pytest.raises(SystemExit, match="unrecognized"):
        _common.load_conf(args, ["--var-type", "fixed_small"])
