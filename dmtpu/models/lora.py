"""LoRA (low-rank adaptation) for fine-tuning, as pure pytree transforms.

Beyond reference parity (the reference fine-tunes nothing; its SD stack is
inference-only — reference: models/stablediffusion/stablediffusion.py).
Design is functional, not module surgery: the base params stay a frozen jit
argument, the trainable state is a tiny ``{path: {"a", "b"}}`` pytree, and
``apply_lora`` materialises ``W + (alpha/rank) * A @ B`` inside the jitted
step — XLA fuses the rank-r matmul + add into the surrounding graph, no
model-code changes anywhere.  This keeps every existing sampler/trainer
working on merged weights and makes the optimizer/EMA state ~MBs instead of
GBs (the reason SD1.5 fine-tuning fits one 16 GB chip at batch >4 with EMA;
measured numbers in docs/ROADMAP.md "Training throughput").

The trainable tree's keys are dot-joined param paths (orbax-safe), so LoRA
checkpoints are self-describing and portable across model rebuilds.
"""
from __future__ import annotations

from typing import Any, Dict, Iterator, Sequence, Tuple

import jax
import jax.numpy as jnp

Array = jax.Array

# The standard SD LoRA surface: every attention projection (self- and
# cross-) in the UNet's SpatialTransformers.
DEFAULT_TARGETS: Tuple[str, ...] = ("to_q", "to_k", "to_v", "to_out__0")


def _walk(tree: Any, path: Tuple[str, ...] = ()) -> Iterator[Tuple[Tuple[str, ...], Any]]:
    if hasattr(tree, "items"):
        for k in tree.keys():
            yield from _walk(tree[k], path + (str(k),))
    else:
        yield path, tree


def _is_target(path: Tuple[str, ...], leaf: Any, targets: Sequence[str]) -> bool:
    return (len(path) >= 2 and path[-1] == "kernel" and path[-2] in targets
            and hasattr(leaf, "ndim") and leaf.ndim == 2)


def lora_scale(rank: int, alpha: float = None) -> float:
    """The merge scale alpha/rank (alpha defaults to rank -> scale 1)."""
    return float(rank if alpha is None else alpha) / float(rank)


def init_lora(params: Any, rng: Array, rank: int = 8,
              targets: Sequence[str] = DEFAULT_TARGETS,
              dtype: Any = jnp.float32) -> Dict[str, Dict[str, Array]]:
    """Build the trainable LoRA tree for every targeted 2-D kernel.

    ``A`` is gaussian (std 1/rank), ``B`` zeros — so the adapted model starts
    EXACTLY at the base model, and the first optimizer steps move only B.
    """
    lora: Dict[str, Dict[str, Array]] = {}
    for path, leaf in _walk(params):
        if _is_target(path, leaf, targets):
            d_in, d_out = int(leaf.shape[0]), int(leaf.shape[1])
            rng, k = jax.random.split(rng)
            lora[".".join(path)] = {
                "a": (jax.random.normal(k, (d_in, rank), dtype) / rank),
                "b": jnp.zeros((rank, d_out), dtype),
            }
    if not lora:
        raise ValueError(f"no LoRA targets {tuple(targets)} found in params")
    return lora


def apply_lora(params: Any, lora: Dict[str, Dict[str, Array]],
               scale: float = 1.0) -> Any:
    """Return params with ``W + scale * A @ B`` at every adapted kernel.

    Pure and jit-friendly; differentiating through it w.r.t. ``lora`` is how
    training sees gradients while the base stays frozen.
    """
    flat = {".".join(p): l for p, l in _walk(params)}
    missing = [k for k in lora if k not in flat]
    if missing:
        raise ValueError(f"LoRA keys not in params: {missing[:3]}...")

    def rebuild(tree: Any, path: Tuple[str, ...] = ()) -> Any:
        if hasattr(tree, "items"):
            return {k: rebuild(tree[k], path + (str(k),)) for k in tree.keys()}
        key = ".".join(path)
        if key in lora:
            ab = lora[key]
            delta = (ab["a"] @ ab["b"]) * scale
            return tree + delta.astype(tree.dtype)
        return tree

    return rebuild(params)


merge_lora = apply_lora  # export alias: merge once, save, serve merged


def lora_param_count(lora: Dict[str, Dict[str, Array]]) -> int:
    return sum(int(v.size) for v in jax.tree.leaves(lora))
