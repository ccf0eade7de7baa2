from .continuous_ode import ContinuousODEScheduler
from .ddim import EnhancedDDIMScheduler
from .flow_match import FlowMatchScheduler
from .fm_dpm import DPMCoeffs, DPMState, FlowDPMSolver, get_sampling_sigmas
from .unipc import FlowUniPC, UniPCCoeffs, UniPCState

__all__ = [
    "FlowMatchScheduler",
    "EnhancedDDIMScheduler",
    "ContinuousODEScheduler",
    "FlowUniPC",
    "UniPCCoeffs",
    "UniPCState",
    "FlowDPMSolver",
    "DPMCoeffs",
    "DPMState",
    "get_sampling_sigmas",
]
