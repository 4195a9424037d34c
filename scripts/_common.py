"""Shared helpers for the sampling CLI scripts."""
import argparse
import os
import sys

sys.path.append(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dmtpu.utils.setup import setup_jax  # noqa: E402

setup_jax()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from dmtpu.convert import convert_by_structure, load_torch_weights  # noqa: E402
from dmtpu.utils.config import instantiate_from_config, load_config, merge_dotlist  # noqa: E402


def base_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser()
    p.add_argument("-c", "--config", type=str, required=True)
    p.add_argument("--seed", type=int, default=2022)
    p.add_argument("--weights", type=str, required=True)
    p.add_argument("--save_dir", type=str, required=True)
    p.add_argument("--batch_size", type=int, default=64)
    p.add_argument("--respace_type", type=str, default="uniform")
    p.add_argument("--respace_steps", type=int, default=None)
    return p


def train_dotlist(unknown):
    """Dotlist from a trainer's unknown args (shared by all train_*.py).

    Accepts ``--key=value``/``key=value``, or ``key value`` pairs (the
    trainers' historical form), including a mixture of both: a ``=`` token
    with no key pending passes through on its own; one arriving right after
    an unpaired key is that key's VALUE (``['train.tag', 'run=5']`` →
    ``train.tag=run=5``, the historical pairing).  A dangling key with no
    value aborts loudly.
    """
    unknown = [(a[2:] if a.startswith("--") else a) for a in unknown]
    out, pending = [], []
    for a in unknown:
        if "=" in a and not pending:
            out.append(a)
        else:
            pending.append(a)
            if len(pending) == 2:
                out.append(f"{pending[0]}={pending[1]}")
                pending = []
    if pending:
        raise SystemExit(
            f"dangling config override {pending[0]!r}: expected a value "
            "(key value) or use key=value form")
    return out


def load_conf(args, unknown):
    """Merge dotlist overrides over the config file.

    Accepts both ``key=value`` and ``--key=value`` (leading dashes are
    stripped, matching the train scripts); anything else among the unknown
    args is a typo'd flag and aborts instead of being silently dropped.
    """
    overrides, bad = [], []
    for a in unknown:
        if "=" in a:
            overrides.append(a.lstrip("-"))
        else:
            bad.append(a)
    if bad:
        raise SystemExit(f"unrecognized arguments: {bad} "
                         "(config overrides must be key=value)")
    return merge_dotlist(load_config(args.config), overrides)


def diffusion_params(args, conf, **extra):
    params = dict(conf.diffusion.get("params", {}))
    if args.respace_steps is not None:
        params.update(respace_type=args.respace_type, respace_steps=args.respace_steps)
    params.pop("device", None)
    params.update(extra)
    return params


def load_model_params(path: str, model, sample_args, converter=None):
    """orbax train-state dir (EMA), .npz export, or torch checkpoint.

    ``converter`` overrides the torch-branch key mapping (default:
    structural matching); e.g. sample_mmdit passes ``convert_mmdit`` for
    the SD3-release layout."""
    if os.path.isdir(path):
        from dmtpu.utils import checkpoint as ckpt_lib

        state = ckpt_lib.load_checkpoint(path)
        if isinstance(state, dict) and state.get("ema"):
            return {"params": state["ema"]["shadow"]["params"]}
        return {"params": state["params"]["params"]}
    if path.endswith(".npz"):
        data = dict(np.load(path, allow_pickle=True))
        return jax.tree.map(jnp.asarray, data["params"].item())
    sd = load_torch_weights(path)
    init = jax.eval_shape(model.init, jax.random.PRNGKey(0), *sample_args)
    return jax.tree.map(jnp.asarray, (converter or convert_by_structure)(sd, init))


def image_shape(conf):
    s = conf.data.params.img_size
    c = conf.data.get("img_channels", 3)
    return (s, s, c)


def dp_sharding():
    """(mesh, shard_fn, replicate_fn) for data-parallel sampling across all
    local devices; identity on a single chip.  Mirrors the reference's
    amortize+gather DP sampling (reference: scripts/sample_uncond.py:183-190),
    with XLA inserting the gather.
    """
    from dmtpu.parallel import make_mesh
    from dmtpu.parallel.mesh import batch_sharding, replicated_sharding

    # Respect an explicit default-device pin (tests run the 8-device CPU
    # mesh this way); otherwise use all devices of the default backend.
    dd = jax.config.jax_default_device
    # jax_default_device may be a Device object or a platform string
    # (JAX_DEFAULT_DEVICE=cpu stores the raw string).
    platform = getattr(dd, "platform", dd) if dd is not None else None
    devices = jax.devices(platform) if platform is not None else jax.devices()
    mesh = make_mesh(devices)
    if mesh.devices.size <= 1:
        return mesh, (lambda x: x), (lambda p: p)
    bsh = batch_sharding(mesh)
    rep = replicated_sharding(mesh)
    return (
        mesh,
        lambda x: jax.device_put(x, bsh),
        lambda p: jax.tree.map(lambda a: jax.device_put(a, rep), p),
    )


class DataParallelSampler:
    """Data-parallel sampling over all local devices.

    Replicates params once and shards the per-fold noise/conditioning batch
    on its leading axis; XLA partitions the jitted sampler and gathers the
    result (reference: scripts/sample_uncond.py:183-190's
    amortize/accelerator.gather pattern).  Identity on a single chip.

    Usage:
        dp = DataParallelSampler(params)
        batch, true_bs = dp.pad_shard((noise, y))
        out = np.asarray(sample_jit(dp.params, *batch, key))[:true_bs]
    """

    def __init__(self, params):
        self.mesh, self._shard, self._replicate = dp_sharding()
        self.ndev = int(self.mesh.devices.size)
        self.is_main = jax.process_index() == 0
        self.params = self._replicate(params)

    def pad_shard(self, batch_tree):
        """Pad every leaf's leading axis to a multiple of the device count
        (wrapping rows) and shard it.  Returns (sharded_tree, true_batch)."""
        leaves = jax.tree.leaves(batch_tree)
        b = leaves[0].shape[0]
        padded = b + (-b) % self.ndev
        idx = np.arange(padded) % b

        def one(x):
            assert x.shape[0] == b, f"batch-axis mismatch: {x.shape[0]} != {b}"
            return self._shard(jnp.asarray(x)[idx] if padded != b else jnp.asarray(x))

        return jax.tree.map(one, batch_tree), b

    def gather(self, out, true_bs: int) -> np.ndarray:
        """Sampler output -> host numpy rows [:true_bs] on EVERY process.

        Single-process this is a plain device->host copy.  Under
        ``jax.distributed`` the jitted output is sharded over the global
        mesh, so rows living on other hosts are not addressable here —
        allgather them first (the reference's ``accelerator.gather`` before
        main-process saving, reference: scripts/sample_uncond.py:183-190).
        Callers should write files only when ``self.is_main``.
        """
        if jax.process_count() > 1:
            from jax.experimental import multihost_utils

            out = multihost_utils.process_allgather(out, tiled=True)
        return np.asarray(out)[:true_bs]
