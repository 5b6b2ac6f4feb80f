from .closed_loop import ClosedLoopResult, closed_loop_step, run_closed_loop
from .config import OptimizationParams
from .controller import MPC, MPCOutputs, MPCState, make_mpc
from .lanes import run_closed_loop_lanes, simulator_step_lanes, step_lanes
from .problem import MPCProblemSpec
from .schedule import run_scheduled_closed_loop
from .simulator import DEFAULT_INTERNAL_DT, Simulator, simulator_step

__all__ = [
    "ClosedLoopResult",
    "closed_loop_step",
    "run_closed_loop",
    "run_closed_loop_lanes",
    "run_scheduled_closed_loop",
    "simulator_step_lanes",
    "step_lanes",
    "OptimizationParams",
    "MPC",
    "MPCOutputs",
    "MPCState",
    "make_mpc",
    "MPCProblemSpec",
    "Simulator",
    "simulator_step",
    "DEFAULT_INTERNAL_DT",
]
