"""Diffusion algorithm layer: schedules, samplers, guidance.

Public surface mirrors the reference (reference: diffusions/__init__.py:1-10).
"""
from dmtpu.diffusions.schedule import get_beta_schedule, get_respaced_seq
from dmtpu.diffusions.ddpm import DDPM, DDPMCFG
from dmtpu.diffusions.ddim import DDIM, DDIMCFG
from dmtpu.diffusions.ddpm_ip import DDPM_IP
from dmtpu.diffusions.euler import EulerSampler
from dmtpu.diffusions.heun import HeunSampler
from dmtpu.diffusions.dpm_solver import DPMSolverPP, DPMSolverPPCFG
from dmtpu.diffusions.pfdiff import PFDiffDDIM, PFDiffDDIMCFG
from dmtpu.diffusions.flow import FlowMatching, FlowMatchingCFG
from dmtpu.diffusions.flow_dpm import FlowDPMSolver, FlowDPMSolverCFG

__all__ = [
    "get_beta_schedule",
    "get_respaced_seq",
    "DDPM",
    "DDPMCFG",
    "DDIM",
    "DDIMCFG",
    "DDPM_IP",
    "EulerSampler",
    "HeunSampler",
    "DPMSolverPP",
    "DPMSolverPPCFG",
    "PFDiffDDIM",
    "PFDiffDDIMCFG",
    "FlowDPMSolver",
    "FlowDPMSolverCFG",
    "FlowMatching",
    "FlowMatchingCFG",
]
