"""webui/app.py executed at HTTP level (stdlib server, tiny models).

Starts the real server on a free port with tiny random-init weights through
its own CLI seams (config path + npz weights) and drives /health, / and
/sample — both the unconditional and the class-conditional CFG branch —
asserting a PNG comes back.  Previously the web UI had zero suite coverage
(it was only driven manually on-chip).
"""
import importlib.util
import os
import socket
import threading
import urllib.error
import urllib.request

import jax.numpy as jnp
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _load_app_module():
    spec = importlib.util.spec_from_file_location(
        "webui_app", os.path.join(REPO, "webui", "app.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def app_mod():
    return _load_app_module()


def _serve(app_mod, app):
    from http.server import HTTPServer

    port = _free_port()
    server = HTTPServer(("127.0.0.1", port), app_mod.make_handler(app))
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    return server, port


def _get(port, path):
    with urllib.request.urlopen(f"http://127.0.0.1:{port}{path}", timeout=120) as r:
        return r.status, r.read().decode()


def test_webui_uncond_sample_roundtrip(app_mod, tmp_path):
    from dmtpu.models import UNet
    from tests._tiny_fixtures import save_npz_params, tiny_uncond_config

    conf = tiny_uncond_config(tmp_path / "conf.yaml")
    model = UNet(in_channels=3, out_channels=3, dim=32, dim_mults=(1, 2),
                 use_attn=(False, True), num_res_blocks=1, n_heads=1)
    weights = save_npz_params(
        tmp_path / "w.npz", model,
        (jnp.zeros((1, 8, 8, 3)), jnp.zeros((1,), jnp.int32)))

    app = app_mod.App(conf, weights)
    server, port = _serve(app_mod, app)
    try:
        status, body = _get(port, "/health")
        assert status == 200 and '"ok": true' in body
        status, body = _get(port, "/")
        assert status == 200 and "dmtpu" in body
        status, body = _get(port, "/sample?sampler=ddim&steps=4&n=2&seed=1")
        assert status == 200
        assert "data:image/png;base64," in body, body[:500]
        # beyond-parity low-NFE sampler over the same grid
        status, body = _get(port, "/sample?sampler=pfdiff&steps=4&n=2&seed=1")
        assert status == 200 and "data:image/png;base64," in body, body[:500]
        # flow sampler on an eps-trained checkpoint is silently meaningless
        # (FlowMatching integrates the output as a velocity): the UI must
        # reject it and keep it out of the dropdown (advisor round-4 finding)
        status, body = _get(port, "/sample?sampler=flow&steps=4&n=2&seed=1")
        assert status == 200 and "data:image/png;base64," not in body
        assert "does not match" in body, body[:500]
        status, body = _get(port, "/")
        assert ">flow</option>" not in body
        # ddim stays the preselected default for eps checkpoints (a bare
        # /sample request must not silently become stochastic ddpm)
        assert "<option selected>ddim</option>" in body
        with pytest.raises(urllib.error.HTTPError) as exc:
            _get(port, "/nope")
        assert exc.value.code == 404
    finally:
        server.shutdown()


def test_webui_cfg_branch(app_mod, tmp_path):
    from dmtpu.models import UNetCategorialAdaGN
    from tests._tiny_fixtures import save_npz_params, tiny_cfg_config

    conf = tiny_cfg_config(tmp_path / "conf.yaml")
    model = UNetCategorialAdaGN(in_channels=3, out_channels=3, dim=32,
                                dim_mults=(1, 2), use_attn=(False, True),
                                num_res_blocks=1, num_classes=10)
    weights = save_npz_params(
        tmp_path / "w.npz", model,
        (jnp.zeros((1, 8, 8, 3)), jnp.zeros((1,), jnp.int32),
         jnp.zeros((1,), jnp.int32)))

    app = app_mod.App(conf, weights)
    server, port = _serve(app_mod, app)
    try:
        # CFG: class 3 at guidance scale 2 (stateless doubled-batch call)
        status, body = _get(port, "/sample?sampler=ddim&steps=4&n=2&seed=1&y=3&gs=2")
        assert status == 200 and "data:image/png;base64," in body, body[:500]
        # unconditional on the conditional model rides the null-class row
        status, body = _get(port, "/sample?sampler=ddpm&steps=4&n=2&seed=1&y=-1")
        assert status == 200 and "data:image/png;base64," in body, body[:500]
        # PFDiff-CFG branch (guided springboard/future scores)
        status, body = _get(port, "/sample?sampler=pfdiff&steps=4&n=2&seed=1&y=3&gs=2")
        assert status == 200 and "data:image/png;base64," in body, body[:500]
    finally:
        server.shutdown()


def test_webui_flow_config_gates_samplers(app_mod, tmp_path):
    """A flow-trained config offers ONLY the flow sampler (and it works);
    eps-family samplers are rejected — the inverse of the uncond test's
    gate (advisor round-4 finding)."""
    import yaml

    from dmtpu.models import UNet
    from tests._tiny_fixtures import (save_npz_params, tiny_uncond_config,
                                      write_yaml)

    base = tiny_uncond_config(tmp_path / "base.yaml")
    conf_d = yaml.safe_load(open(base))
    # shipped flow configs pin their ODE integrator (solver: euler); the
    # flowdpm route must override it rather than forward it into
    # FlowDPMSolver (which rejects any other solver value)
    conf_d["diffusion"] = {"target": "diffusions.flow.FlowMatching",
                           "params": {"total_steps": 100, "solver": "euler"}}
    conf = write_yaml(tmp_path / "conf.yaml", conf_d)
    model = UNet(in_channels=3, out_channels=3, dim=32, dim_mults=(1, 2),
                 use_attn=(False, True), num_res_blocks=1, n_heads=1)
    weights = save_npz_params(
        tmp_path / "w.npz", model,
        (jnp.zeros((1, 8, 8, 3)), jnp.zeros((1,), jnp.int32)))

    app = app_mod.App(conf, weights)
    assert app.samplers == ("flow", "flowdpm")
    server, port = _serve(app_mod, app)
    try:
        status, body = _get(port, "/")
        assert "<option selected>flow</option>" in body
        assert "<option>flowdpm</option>" in body
        assert ">ddim</option>" not in body
        # default sampler (no query param) must be the flow family, not ddim
        status, body = _get(port, "/sample?steps=4&n=2&seed=1")
        assert status == 200 and "data:image/png;base64," in body, body[:500]
        status, body = _get(port, "/sample?sampler=ddpm&steps=4&n=2&seed=1")
        assert status == 200 and "does not match" in body
        # FlowDPM (2nd-order multistep) through the same page
        status, body = _get(port, "/sample?sampler=flowdpm&steps=4&n=2&seed=1")
        assert status == 200 and "data:image/png;base64," in body, body[:500]
    finally:
        server.shutdown()
