"""Streamlit UI pages import-smoke tests (all 4 pages + Hello).

streamlit isn't installed in this image, so a minimal stub is injected: UI
calls return their default values and ``st.button`` returns False, so each
page executes its full top-level flow (widget declarations) without weights.
This guards the pages' imports and widget wiring (reference: streamlit/
pages/1-4, 907 LoC UI surface).
"""
import glob
import importlib.util
import os
import sys
import types

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PAGES = sorted(glob.glob(os.path.join(REPO, "streamlit", "pages", "*.py")))
HELLO = os.path.join(REPO, "streamlit", "Hello.py")


class _Stub:
    """Lenient streamlit stand-in: widgets return defaults, button False."""

    def cache_resource(self, fn=None, **kw):
        if fn is None:
            return lambda f: f
        return fn

    def button(self, *a, **k):
        return False

    def slider(self, label, mn=None, mx=None, value=None, **k):
        return value if value is not None else mn

    def selectbox(self, label, options, index=0, **k):
        return options[index]

    def number_input(self, label, value=0, **k):
        return value

    def text_area(self, label, value="", **k):
        return value

    def text_input(self, label, value="", **k):
        return value

    def __getattr__(self, name):
        return lambda *a, **k: None


@pytest.fixture(autouse=True)
def stub_streamlit(monkeypatch):
    st = _Stub()
    mod = types.ModuleType("streamlit")
    for name in dir(_Stub):
        if not name.startswith("_"):
            setattr(mod, name, getattr(st, name))
    mod.__getattr__ = st.__getattr__
    monkeypatch.setitem(sys.modules, "streamlit", mod)
    yield


@pytest.mark.parametrize("page", PAGES + [HELLO], ids=lambda p: os.path.basename(p))
def test_page_imports_and_runs_topdown(page):
    name = "page_" + os.path.basename(page).replace(".py", "").replace("-", "_")
    spec = importlib.util.spec_from_file_location(name, page)
    module = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(module)  # runs the page top-to-bottom, button=False


def test_all_four_reference_pages_exist():
    names = [os.path.basename(p) for p in PAGES]
    assert len(names) == 4, names
    assert any("Unconditional" in n for n in names)
    assert any("Class_Conditional" in n or "CFG" in n for n in names)
    assert any("Stable_Diffusion." in n or "Stable_Diffusion_v" in n for n in names)
    assert any("XL" in n for n in names)
