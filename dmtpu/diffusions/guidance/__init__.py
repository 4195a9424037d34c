"""Guidance suite: composable per-step transforms inside the compiled loop."""
from dmtpu.diffusions.guidance.base import BaseGuidance
from dmtpu.diffusions.guidance.ilvr import ILVR
from dmtpu.diffusions.guidance.mask_guidance import MaskGuidance, MaskGuidanceDDIMCFG

__all__ = ["BaseGuidance", "MaskGuidance", "MaskGuidanceDDIMCFG", "ILVR",
           "CLIPGuidance"]


def __getattr__(name):
    # CLIPGuidance pulls in transformers; import lazily
    if name == "CLIPGuidance":
        from dmtpu.diffusions.guidance.clip_guidance import CLIPGuidance
        return CLIPGuidance
    raise AttributeError(name)
