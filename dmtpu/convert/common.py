"""Torch→Flax checkpoint conversion machinery.

Zoo modules name their Flax submodules after the upstream torch module paths
(``.`` → ``__``), so a torch key like ``down.0.block.0.conv1.weight`` lands
at the flax leaf whose normalised path is ``down.0.block.0.conv1.kernel``.
``convert_by_structure`` matches every torch tensor against the target
model's init structure and infers the transform from the destination shape:

  torch weight (4D conv)   -> kernel, permuted (2,3,1,0) [OIHW -> HWIO]
  torch weight (2D linear) -> kernel, transposed
  torch weight (2D embed)  -> embedding, as-is
  torch weight (1D norm)   -> scale, as-is
  bias                     -> bias, as-is

Every leaf is shape-checked; unconsumed torch keys and unfilled flax leaves
are reported — a converted checkpoint either matches the architecture
exactly or fails loudly.

Checkpoint reading mirrors reference: utils/load.py:7-19.
"""
from __future__ import annotations

import os
from typing import Callable, Dict, List, Optional, Tuple

import numpy as np


def load_torch_weights(path: str) -> Dict[str, np.ndarray]:
    """Checkpoint dispatcher (reference: utils/load.py:7-19) → numpy dict."""
    ext = os.path.splitext(path)[-1]
    if ext == ".safetensors":
        from safetensors.numpy import load_file

        return dict(load_file(path))
    import torch

    weights = torch.load(path, map_location="cpu", weights_only=False)
    if "state_dict" in weights:
        weights = weights["state_dict"]
    elif "ema" in weights:
        weights = weights["ema"]["shadow"]
    elif "model" in weights:
        weights = weights["model"]
    out = {}
    for k, v in weights.items():
        out[k] = v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)
    return out


def _flatten(tree, prefix=()) -> Dict[Tuple[str, ...], np.ndarray]:
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, prefix + (str(k),)))
    else:
        out[prefix] = tree
    return out


def _unflatten(flat: Dict[Tuple[str, ...], np.ndarray]) -> Dict:
    tree: Dict = {}
    for path, v in flat.items():
        node = tree
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = v
    return tree


def _normalise(path: Tuple[str, ...]) -> str:
    return ".".join(c.replace("__", ".") for c in path)


def convert_by_structure(
    state_dict: Dict[str, np.ndarray],
    init_params: Dict,
    rename: Optional[Callable[[str], Optional[str]]] = None,
    strict: bool = True,
    pad_null_class_row: bool = True,
) -> Dict:
    """Map a torch state_dict onto the structure of ``init_params``.

    ``rename(torch_key)`` may rewrite the key or return None to drop it.
    ``pad_null_class_row``: when an embedding table is exactly one row short
    of the target (our class embeddings carry an extra zero-initialised null
    row standing in for the reference's ``y=None``), pad a zero row instead
    of failing — this is how reference class-conditional checkpoints load.
    Returns a params tree with the same structure as ``init_params`` (minus
    the top-level 'params' wrapper, which is preserved if present).
    """
    wrapped = isinstance(init_params, dict) and set(init_params) >= {"params"}
    target = init_params["params"] if wrapped else init_params
    flat_target = _flatten(target)
    index: Dict[str, Tuple[str, ...]] = {_normalise(p): p for p in flat_target}

    out: Dict[Tuple[str, ...], np.ndarray] = {}
    unused: List[str] = []

    for key, val in state_dict.items():
        orig_key = key
        if rename is not None:
            key = rename(key)
            if key is None:
                continue
        val = np.asarray(val)
        base, _, leaf = key.rpartition(".")
        candidates: List[Tuple[str, Callable[[np.ndarray], np.ndarray]]]
        if leaf == "weight":
            def _kernel_tf(v):
                if v.ndim == 4:
                    return np.transpose(v, (2, 3, 1, 0))
                if v.ndim == 3:          # conv1d k=1 -> Dense
                    return v[:, :, 0].T
                if v.ndim == 2:
                    return v.T
                return v

            candidates = [
                ("kernel", _kernel_tf),
                ("scale", lambda v: v),
                ("embedding", lambda v: v),
            ]
        elif leaf == "bias":
            candidates = [("bias", lambda v: v)]
        else:
            candidates = [(leaf, lambda v: v)]

        placed = False
        for name, tf in candidates:
            norm = f"{base}.{name}" if base else name
            if norm in index:
                path = index[norm]
                arr = tf(val)
                tgt = flat_target[path]
                want = tuple(getattr(tgt, "shape", None) if hasattr(tgt, "shape") else np.shape(tgt))
                if np.shape(arr) != tuple(want):
                    # try the un-transposed variant (e.g. square embeddings)
                    if np.shape(val) == tuple(want):
                        arr = val
                    elif (pad_null_class_row and name == "embedding"
                          and val.ndim == 2 and len(want) == 2
                          and val.shape[0] + 1 == want[0] and val.shape[1] == want[1]):
                        arr = np.concatenate([val, np.zeros((1, val.shape[1]), val.dtype)])
                    else:
                        raise ValueError(
                            f"shape mismatch for {orig_key} -> {norm}: "
                            f"{np.shape(arr)} vs expected {want}"
                        )
                out[path] = arr
                placed = True
                break
        if not placed:
            unused.append(orig_key)

    missing = sorted(set(flat_target) - set(out))
    problems = []
    if unused and strict:
        problems.append(f"{len(unused)} torch keys unmatched, e.g. {unused[:6]}")
    if missing:
        problems.append(f"{len(missing)} flax leaves unfilled, e.g. {[_normalise(m) for m in missing[:6]]}")
    if problems:
        raise ValueError("conversion failed:\n" + "\n".join(problems))

    converted = _unflatten(out)
    return {"params": converted} if wrapped else converted
