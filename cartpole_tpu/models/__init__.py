from .base import CartPoleModel, DOUBLE_CARTPOLE, SINGLE_CARTPOLE, get_model
from .double import double_cartpole_dynamics, double_cartpole_energy
from .params import (
    DoubleCartPoleParams,
    SingleCartPoleParams,
    default_double_params,
    default_single_params,
)
from .single import single_cartpole_dynamics, single_cartpole_energy

__all__ = [
    "CartPoleModel",
    "SINGLE_CARTPOLE",
    "DOUBLE_CARTPOLE",
    "get_model",
    "SingleCartPoleParams",
    "DoubleCartPoleParams",
    "default_single_params",
    "default_double_params",
    "single_cartpole_dynamics",
    "single_cartpole_energy",
    "double_cartpole_dynamics",
    "double_cartpole_energy",
]
