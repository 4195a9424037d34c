"""Streamlit UI pages: import smoke + REAL generate-path execution.

streamlit isn't installed in this image, so a stub is injected.  Two layers
of coverage (reference: streamlit/pages/1-4, 907 LoC UI surface):

1. Import smoke — every page executes its top-level flow with button=False.
2. Generate path — pages 1 (uncond), 2 (CFG) and 3 (Stable Diffusion) run
   their full ``if st.button(...)`` body with button=True: tiny random-init
   models injected through the pages' OWN env-var seams (config yaml + .npz
   weights / random-init demo mode + local CLIP tokenizer dir), asserting an
   image of the right size is produced.
"""
import glob
import importlib.util
import os
import sys
import types

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PAGES = sorted(glob.glob(os.path.join(REPO, "streamlit", "pages", "*.py")))
HELLO = os.path.join(REPO, "streamlit", "Hello.py")


class _Stub:
    """Lenient streamlit stand-in.

    ``overrides`` maps widget label -> returned value; unlisted widgets
    return their declared defaults.  ``button_result`` drives the generate
    branch; produced images and warnings are recorded for assertions.
    """

    def __init__(self, overrides=None, button_result=False):
        self.overrides = overrides or {}
        self.button_result = button_result
        self.session_state = {}
        self.images = []
        self.warnings = []
        self.selectboxes = {}  # label -> options offered (gating assertions)

    def cache_resource(self, fn=None, **kw):
        if fn is None:
            return lambda f: f
        return fn

    def button(self, *a, **k):
        return self.button_result

    def slider(self, label, mn=None, mx=None, value=None, **k):
        if label in self.overrides:
            return self.overrides[label]
        return value if value is not None else mn

    def selectbox(self, label, options, index=0, **k):
        self.selectboxes[label] = list(options)
        if label in self.overrides:
            return self.overrides[label]
        return options[index]

    def select_slider(self, label, options=None, value=None, **k):
        if label in self.overrides:
            return self.overrides[label]
        return value if value is not None else (options[0] if options else None)

    def number_input(self, label, value=0, **k):
        return self.overrides.get(label, value)

    def text_area(self, label, value="", **k):
        return self.overrides.get(label, value)

    def text_input(self, label, value="", **k):
        return self.overrides.get(label, value)

    def image(self, img, **k):
        self.images.append(img)

    def warning(self, msg, **k):
        self.warnings.append(str(msg))

    def __getattr__(self, name):
        return lambda *a, **k: None


def _run_page(page, monkeypatch, overrides=None, button=False, env=None):
    st = _Stub(overrides=overrides, button_result=button)
    mod = types.ModuleType("streamlit")
    for name in ("cache_resource", "button", "slider", "selectbox",
                 "select_slider", "number_input", "text_area", "text_input",
                 "image", "warning"):
        setattr(mod, name, getattr(st, name))
    mod.session_state = st.session_state
    mod.__getattr__ = st.__getattr__
    monkeypatch.setitem(sys.modules, "streamlit", mod)
    # pin the optional Model-dropdown dirs OFF unless a test opts in — a
    # developer env with them exported must not flip pages out of demo mode
    env = {"DMTPU_WEIGHTS_DIR": None, "DMTPU_SD_WEIGHTS_DIR": None, **(env or {})}
    for k, v in env.items():
        if v is None:
            monkeypatch.delenv(k, raising=False)
        else:
            monkeypatch.setenv(k, v)
    name = "page_" + os.path.basename(page).replace(".py", "").replace("-", "_")
    spec = importlib.util.spec_from_file_location(name, page)
    module = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(module)  # runs the page top-to-bottom
    return st


def _page(fragment):
    matches = [p for p in PAGES if fragment in os.path.basename(p)]
    assert matches, (fragment, PAGES)
    return matches[0]


@pytest.mark.parametrize("page", PAGES + [HELLO], ids=lambda p: os.path.basename(p))
def test_page_imports_and_runs_topdown(page, monkeypatch):
    _run_page(page, monkeypatch, button=False)


def test_all_four_reference_pages_exist():
    names = [os.path.basename(p) for p in PAGES]
    assert len(names) == 4, names
    assert any("Unconditional" in n for n in names)
    assert any("Class_Conditional" in n or "CFG" in n for n in names)
    assert any("Stable_Diffusion." in n or "Stable_Diffusion_v" in n for n in names)
    assert any("XL" in n for n in names)


def test_page3_has_reference_widget_surface():
    """Reference page-3 exposes offset noise, batch size/count and
    independent H/W (reference: streamlit/pages/3_Stable_Diffusion_v1.5.py:
    48-77); the rebuild's page must too."""
    src = open(_page("3_Stable_Diffusion")).read()
    for label in ("Offset noise", "Batch size", "Batch count", "Height", "Width"):
        assert f'"{label}"' in src, label


def test_uncond_page_generates_image(monkeypatch, tmp_path):
    from dmtpu.models import UNet
    from tests._tiny_fixtures import save_npz_params, tiny_uncond_config

    import jax.numpy as jnp

    conf = tiny_uncond_config(tmp_path / "conf.yaml")
    model = UNet(in_channels=3, out_channels=3, dim=32, dim_mults=(1, 2),
                 use_attn=(False, True), num_res_blocks=1, n_heads=1)
    weights = save_npz_params(
        tmp_path / "w.npz", model,
        (jnp.zeros((1, 8, 8, 3)), jnp.zeros((1,), jnp.int32)))

    st = _run_page(
        _page("1_Unconditional"), monkeypatch, button=True,
        overrides={"Sampling steps": 5, "Batch size": 4},
        env={"DMTPU_CONFIG": conf, "DMTPU_WEIGHTS": weights})
    assert len(st.images) == 1
    img = np.asarray(st.images[0])
    assert img.ndim == 3 and img.shape[-1] == 3  # a grid image was produced


def test_uncond_page_flow_family_gate_and_flowdpm(monkeypatch, tmp_path):
    """A flow-trained config must (a) offer ONLY the flow-family samplers,
    (b) offer flow-valid respace grids (not the eps-only uniform-linspace),
    and (c) run flowdpm even though the config pins solver: euler — the
    same family gate + solver override as webui/app.py."""
    import yaml

    from dmtpu.models import UNet
    from tests._tiny_fixtures import (save_npz_params, tiny_uncond_config,
                                      write_yaml)

    import jax.numpy as jnp

    base = tiny_uncond_config(tmp_path / "base.yaml")
    conf_d = yaml.safe_load(open(base))
    conf_d["diffusion"] = {"target": "diffusions.flow.FlowMatching",
                           "params": {"total_steps": 100, "solver": "euler"}}
    conf = write_yaml(tmp_path / "conf.yaml", conf_d)
    model = UNet(in_channels=3, out_channels=3, dim=32, dim_mults=(1, 2),
                 use_attn=(False, True), num_res_blocks=1, n_heads=1)
    weights = save_npz_params(
        tmp_path / "w.npz", model,
        (jnp.zeros((1, 8, 8, 3)), jnp.zeros((1,), jnp.int32)))

    st = _run_page(
        _page("1_Unconditional"), monkeypatch, button=True,
        overrides={"Sampling steps": 5, "Batch size": 4, "Sampler": "flowdpm"},
        env={"DMTPU_CONFIG": conf, "DMTPU_WEIGHTS": weights})
    assert st.selectboxes["Sampler"] == ["flow", "flowdpm"]
    assert "uniform-linspace" not in st.selectboxes["Respace type"]
    assert len(st.images) == 1


def test_cfg_page_generates_image(monkeypatch, tmp_path):
    from dmtpu.models import UNetCategorialAdaGN
    from tests._tiny_fixtures import save_npz_params, tiny_cfg_config

    import jax.numpy as jnp

    conf = tiny_cfg_config(tmp_path / "conf.yaml")
    model = UNetCategorialAdaGN(in_channels=3, out_channels=3, dim=32,
                                dim_mults=(1, 2), use_attn=(False, True),
                                num_res_blocks=1, num_classes=10)
    weights = save_npz_params(
        tmp_path / "w.npz", model,
        (jnp.zeros((1, 8, 8, 3)), jnp.zeros((1,), jnp.int32),
         jnp.zeros((1,), jnp.int32)))

    st = _run_page(
        _page("2_Class_Conditional"), monkeypatch, button=True,
        overrides={"Sampling steps": 5, "Batch size": 4, "Class id": 3},
        env={"DMTPU_CONFIG": conf, "DMTPU_WEIGHTS": weights})
    assert len(st.images) == 1
    assert np.asarray(st.images[0]).shape[-1] == 3


def test_sd_page_generates_images_demo_mode(monkeypatch, tmp_path):
    """Page 3 end-to-end: random-init demo mode (no weights env), local CLIP
    tokenizer, both CFG branches on the doubled batch, offset noise, batch
    size/count loops, VAE decode — asserts images of the selected H×W."""
    from tests._tiny_fixtures import make_tiny_clip_dir, tiny_sd_config

    conf = tiny_sd_config(tmp_path / "sd.yaml")
    clip_dir = make_tiny_clip_dir(tmp_path / "clip")

    st = _run_page(
        _page("3_Stable_Diffusion"), monkeypatch, button=True,
        overrides={"Steps": 4, "Height": 256, "Width": 256,
                   "Offset noise": 0.1, "Batch size": 2, "Batch count": 2},
        env={"DMTPU_SD_CONFIG": conf, "DMTPU_SD_WEIGHTS": None,
             "DMTPU_CLIP_TOKENIZER": clip_dir})
    assert any("RANDOM" in w for w in st.warnings)  # demo mode announced
    assert len(st.images) == 4  # batch_count x batch_size
    img = np.asarray(st.images[0])
    assert img.shape[:2] == (256, 256)


def test_sdxl_page_generates_images_demo_mode(monkeypatch, tmp_path):
    """Page 4 end-to-end: random-init demo mode, conditioner cond/uncond
    dicts, offset noise, VAE decode."""
    from tests._tiny_fixtures import make_tiny_clip_dir, tiny_sdxl_config

    conf = tiny_sdxl_config(tmp_path / "sdxl.yaml")
    clip_dir = make_tiny_clip_dir(tmp_path / "clip")

    st = _run_page(
        _page("4_Stable_Diffusion_XL"), monkeypatch, button=True,
        overrides={"Steps": 4, "Height": 256, "Width": 256,
                   "Offset noise": 0.1, "Batch size": 2},
        env={"DMTPU_SDXL_CONFIG": conf, "DMTPU_SDXL_WEIGHTS": None,
             "DMTPU_CLIP_TOKENIZER": clip_dir,
             "DMTPU_OPENCLIP_TOKENIZER": clip_dir})
    assert any("RANDOM" in w for w in st.warnings)
    assert len(st.images) == 2
    assert np.asarray(st.images[0]).shape[:2] == (256, 256)


def test_sd_page_ddpm_sampler_weights_dir_and_npz(monkeypatch, tmp_path):
    """Round-3 page-3 surface: the DDPM (ancestral CFG) sampler option, the
    DMTPU_SD_WEIGHTS_DIR model dropdown, and loading a .npz artifact (the
    merge_lora output format) through it — no demo-mode warning."""
    import jax

    from dmtpu.utils.config import instantiate_from_config, load_config
    from tests._tiny_fixtures import make_tiny_clip_dir, tiny_sd_config

    conf_path = tiny_sd_config(tmp_path / "sd.yaml")
    clip_dir = make_tiny_clip_dir(tmp_path / "clip")
    wdir = tmp_path / "weights"
    wdir.mkdir()
    sd = instantiate_from_config(load_config(conf_path).model)
    params = sd.init_params(jax.random.PRNGKey(1), 64)
    np.savez(wdir / "tiny_sd.npz", params=jax.device_get(params))

    st = _run_page(
        _page("3_Stable_Diffusion"), monkeypatch, button=True,
        overrides={"Sampler": "ddpm", "Steps": 3, "Height": 128, "Width": 128,
                   "Batch size": 1, "Batch count": 1, "Seed": 7},
        env={"DMTPU_SD_CONFIG": conf_path, "DMTPU_SD_WEIGHTS": None,
             "DMTPU_SD_WEIGHTS_DIR": str(tmp_path / "weights"),
             "DMTPU_CLIP_TOKENIZER": clip_dir})
    assert not st.warnings  # dropdown weights loaded -> no demo-mode warning
    assert len(st.images) == 1
    assert np.asarray(st.images[0]).shape[:2] == (128, 128)
