"""Built-in web UI for interactive sampling (stdlib HTTP server).

Replaces the reference's Streamlit app (reference: streamlit/Hello.py + 4
pages) with a dependency-free server (streamlit is not installed in this
image).  Pages mirror the reference:
  - unconditional sampling (any sampler / var_type / respacing,
    reference: streamlit/pages/1_Unconditional_Image_Generation.py)
  - class-conditional CFG sampling (reference: pages/2_...)
  - Stable Diffusion text-to-image (pos/neg prompt, reference: pages/3_...)

Usage:
    python webui/app.py -c configs/ddpm_cifar10.yaml --weights CKPT [--port 7860]

The model is loaded once and cached (the reference uses st.cache_resource);
sampling runs jitted on the TPU, one request at a time.
"""
import argparse
import base64
import io
import json
import os
import sys
import threading
from http.server import BaseHTTPRequestHandler, HTTPServer
from urllib.parse import parse_qs, urlparse

sys.path.append(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dmtpu.utils.setup import setup_jax  # noqa: E402

setup_jax()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from dmtpu.diffusions import (  # noqa: E402
    DDIM, DDPM, DDIMCFG, DDPMCFG, DPMSolverPP, DPMSolverPPCFG, EulerSampler,
    FlowDPMSolver, FlowDPMSolverCFG, FlowMatching, FlowMatchingCFG,
    HeunSampler, PFDiffDDIM, PFDiffDDIMCFG)
from dmtpu.utils.config import instantiate_from_config, load_config  # noqa: E402
from dmtpu.utils.image import make_grid, to_pil  # noqa: E402

SAMPLERS = {"ddpm": DDPM, "ddim": DDIM, "euler": EulerSampler, "heun": HeunSampler,
            "dpmpp": DPMSolverPP, "pfdiff": PFDiffDDIM, "flow": FlowMatching,
            "flowdpm": FlowDPMSolver}

PAGE = """<!doctype html>
<html><head><title>dmtpu sampler</title><style>
body{{font-family:sans-serif;max-width:760px;margin:2em auto}}
label{{display:inline-block;width:160px}} input,select{{margin:4px}}
img{{image-rendering:pixelated;border:1px solid #ccc;margin-top:1em}}
</style></head><body>
<h2>dmtpu — TPU-native diffusion sampler</h2>
<form action="/sample" method="get">
<p><label>Sampler</label><select name="sampler">
{sampler_options}
</select></p>
<p><label>Steps</label><input name="steps" type="number" value="50"></p>
<p><label>Variance</label><select name="var_type">
<option>fixed_large</option><option>fixed_small</option><option>learned_range</option></select></p>
<p><label>Batch</label><input name="n" type="number" value="16" min="1" max="64"></p>
<p><label>Seed</label><input name="seed" type="number" value="0"></p>
<p><label>Class (CFG, opt.)</label><input name="y" type="number" placeholder="-1 = uncond" value="-1">
   <label>guidance scale</label><input name="gs" type="number" step="0.5" value="3"></p>
<p><input type="submit" value="Sample"></p>
</form>
{body}
</body></html>"""


class App:
    def __init__(self, conf_path: str, weights: str):
        self.conf = load_config(conf_path)
        self.model = instantiate_from_config(self.conf.model)
        self.num_classes = self.conf.data.get("num_classes")
        shape = (1, self.conf.data.params.img_size, self.conf.data.params.img_size,
                 self.conf.data.get("img_channels", 3))
        sys.path.append(os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "scripts"))
        from _common import load_model_params

        cond = "adagn" in self.conf.model.target.lower() or "categorial" in self.conf.model.target.lower()
        margs = (jnp.zeros(shape), jnp.zeros((1,), jnp.int32)) + (
            (jnp.zeros((1,), jnp.int32),) if cond else ())
        self.cond = cond
        self.params = load_model_params(weights, self.model, margs)
        self.shape = shape[1:]
        # A flow/velocity-trained checkpoint and an eps-trained one are not
        # sampler-interchangeable: FlowMatching integrates the model output
        # as a velocity, the DDPM family as eps/x0 — crossing them produces
        # silently meaningless images.  Offer only the matching family.
        self.is_flow = "flow" in str(self.conf.diffusion.get("target", "")).lower()
        self.samplers = (("flow", "flowdpm") if self.is_flow else
                         ("ddpm", "ddim", "euler", "heun", "dpmpp", "pfdiff"))
        # a bare /sample request keeps the historical deterministic default
        # (DDIM) for eps checkpoints rather than samplers[0] == ddpm
        self.default_sampler = "flow" if self.is_flow else "ddim"
        self.lock = threading.Lock()
        # bounded FIFO of compiled samplers: each distinct (sampler, steps,
        # var_type, cond, gs) combination bakes a new jitted reverse scan —
        # unbounded retention would leak an executable per guidance scale a
        # user ever tries
        self._cache = {}
        self._cache_max = 8

    def page(self, body: str) -> str:
        opts = "".join(
            f'<option{" selected" if s == self.default_sampler else ""}>{s}</option>'
            for s in self.samplers)
        return PAGE.format(sampler_options=opts, body=body)

    def sample(self, sampler: str, steps: int, var_type: str, n: int, seed: int,
               y: int, gs: float) -> np.ndarray:
        if sampler not in self.samplers:
            raise ValueError(
                f"sampler {sampler!r} does not match this checkpoint's "
                f"diffusion family (config target "
                f"{self.conf.diffusion.get('target')}); available: "
                f"{', '.join(self.samplers)}")
        dp = dict(self.conf.diffusion.get("params", {}))
        dp.pop("device", None)
        dp.update(respace_type="uniform", respace_steps=steps, var_type=var_type)
        if sampler == "flowdpm":
            # flow configs pin their ODE integrator (solver: euler/heun);
            # FlowDPMSolver IS the solver and rejects any other value
            dp["solver"] = "dpm"
        key = (sampler, steps, var_type, y >= 0, gs)
        if key not in self._cache:
            if y >= 0 and self.cond:
                cls = {"ddim": DDIMCFG, "dpmpp": DPMSolverPPCFG,
                       "pfdiff": PFDiffDDIMCFG, "flow": FlowMatchingCFG,
                       "flowdpm": FlowDPMSolverCFG}.get(sampler, DDPMCFG)
                diffuser = cls(guidance_scale=gs, **dp)

                def fn(p, noise, k, yy):
                    model_fn = lambda x, t, y=None, **kw: self.model.apply(p, x, t, y)  # noqa: E731
                    return diffuser.sample(
                        model_fn, noise, k,
                        uncond_conditioning=jnp.full((noise.shape[0],), self.num_classes, jnp.int32),
                        model_kwargs=dict(y=yy))
            else:
                diffuser = SAMPLERS[sampler](**dp)

                def fn(p, noise, k, yy):
                    # unconditional on a conditional model == the null class
                    # row (y = num_classes), NOT class 0
                    null = self.num_classes
                    margs = (lambda x, t, **kw: self.model.apply(
                        p, x, t, jnp.full((x.shape[0],), null, jnp.int32))) \
                        if self.cond else (lambda x, t, **kw: self.model.apply(p, x, t))
                    return diffuser.sample(margs, noise, k)
            if len(self._cache) >= self._cache_max:
                self._cache.pop(next(iter(self._cache)))
            self._cache[key] = jax.jit(fn)
        k_noise, k_samp = jax.random.split(jax.random.PRNGKey(seed))
        noise = jax.random.normal(k_noise, (n,) + self.shape)
        yy = jnp.full((n,), max(y, 0), jnp.int32)
        return np.clip(np.asarray(self._cache[key](self.params, noise, k_samp, yy)), -1, 1)


def make_handler(app: App):
    class Handler(BaseHTTPRequestHandler):
        def do_GET(self):
            url = urlparse(self.path)
            if url.path == "/":
                self._html(app.page(""))
            elif url.path == "/sample":
                q = {k: v[0] for k, v in parse_qs(url.query).items()}
                try:
                    with app.lock:
                        imgs = app.sample(
                            q.get("sampler", app.default_sampler), int(q.get("steps", 50)),
                            q.get("var_type", "fixed_small"), int(q.get("n", 16)),
                            int(q.get("seed", 0)), int(q.get("y", -1)),
                            float(q.get("gs", 3.0)))
                    grid = make_grid(imgs, nrow=int(np.ceil(np.sqrt(len(imgs)))))
                    buf = io.BytesIO()
                    to_pil(grid).save(buf, "PNG")
                    b64 = base64.b64encode(buf.getvalue()).decode()
                    self._html(app.page(
                        f'<img src="data:image/png;base64,{b64}" width="512">'))
                except Exception as e:  # pragma: no cover
                    self._html(app.page(f"<pre>error: {e}</pre>"))
            elif url.path == "/health":
                self.send_response(200)
                self.send_header("Content-Type", "application/json")
                self.end_headers()
                self.wfile.write(json.dumps({"ok": True, "devices": str(jax.devices())}).encode())
            else:
                self.send_response(404)
                self.end_headers()

        def _html(self, content: str):
            self.send_response(200)
            self.send_header("Content-Type", "text/html")
            self.end_headers()
            self.wfile.write(content.encode())

        def log_message(self, *a):  # quiet
            pass

    return Handler


def main():
    p = argparse.ArgumentParser()
    p.add_argument("-c", "--config", required=True)
    p.add_argument("--weights", required=True)
    p.add_argument("--port", type=int, default=7860)
    args = p.parse_args()
    app = App(args.config, args.weights)
    server = HTTPServer(("0.0.0.0", args.port), make_handler(app))
    print(f"webui listening on http://localhost:{args.port}")
    server.serve_forever()


if __name__ == "__main__":
    main()
