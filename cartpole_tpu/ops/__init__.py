from .integrate import mod_pi, rk4_step, rollout, substep_rollout, wrap_angles
from .solver import (
    NLSConfig,
    NLSOutputs,
    NLSProblem,
    NLSTerminationState,
    solve_nls,
    termination_state_name,
)

__all__ = [
    "mod_pi",
    "rk4_step",
    "rollout",
    "substep_rollout",
    "wrap_angles",
    "NLSConfig",
    "NLSOutputs",
    "NLSProblem",
    "NLSTerminationState",
    "solve_nls",
    "termination_state_name",
]
