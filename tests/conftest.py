"""Test configuration.

Single-device tests run on whatever backend is default (the real TPU when
available).  Multi-device sharding tests build an explicit 8-device CPU mesh
from ``jax.devices('cpu')`` (SURVEY.md §4): the CPU client is created lazily,
so setting XLA_FLAGS here (before first use) is sufficient even though the
environment's sitecustomize imports jax at interpreter startup.
"""
import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFERENCE_ROOT = "/root/reference"

if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)
# The reference repo is used as a NUMERICAL ORACLE in parity tests (its
# modules are imported, never copied).  Its scripts sys.path-append the repo
# root, so we do the same.
if os.path.isdir(REFERENCE_ROOT) and REFERENCE_ROOT not in sys.path:
    sys.path.insert(1, REFERENCE_ROOT)

import types  # noqa: E402

# torchvision isn't installed in this image; the reference package __init__
# imports it transitively (clip_guidance -> torchvision.transforms).  Stub it
# so the math modules stay importable as oracles.
try:
    import torchvision  # noqa: F401
except ImportError:
    import importlib.machinery
    tv = types.ModuleType("torchvision")
    tv.__spec__ = importlib.machinery.ModuleSpec("torchvision", loader=None)
    tv.transforms = types.ModuleType("torchvision.transforms")
    tv.transforms.__spec__ = importlib.machinery.ModuleSpec("torchvision.transforms", loader=None)
    tv.transforms.Resize = lambda *a, **k: (lambda x: x)
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.transforms"] = tv.transforms

try:
    import omegaconf  # noqa: F401
except ImportError:
    import importlib.machinery
    oc = types.ModuleType("omegaconf")
    oc.__spec__ = importlib.machinery.ModuleSpec(
        "omegaconf", loader=None, is_package=True)
    oc.__path__ = []
    oc.OmegaConf = type("OmegaConf", (), {})
    oc.DictConfig = dict
    oc_list = types.ModuleType("omegaconf.listconfig")
    oc_list.__spec__ = importlib.machinery.ModuleSpec("omegaconf.listconfig", loader=None)
    oc_list.ListConfig = list
    oc.listconfig = oc_list
    sys.modules["omegaconf"] = oc
    sys.modules["omegaconf.listconfig"] = oc_list

import pytest  # noqa: E402

# Default the whole test suite onto the (8-device) CPU client: deterministic
# f32 matmuls and no round-trips through the axon TPU tunnel.  Real-TPU
# behaviour is exercised by bench.py and the verify drives instead.
import jax  # noqa: E402

jax.config.update("jax_default_device", jax.devices("cpu")[0])


@pytest.fixture
def rng():
    import jax
    return jax.random.PRNGKey(0)


def require_reference():
    if not os.path.isdir(REFERENCE_ROOT):
        pytest.skip("reference repo not available")
