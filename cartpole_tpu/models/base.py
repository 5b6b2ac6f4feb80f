"""Model descriptors: a uniform interface the MPC / simulator layers build on.

The reference hard-codes ``state_dim = 4`` in its controller with a TODO to
generalize to the double pole (``/root/reference/optimization/optimization.cc:197-198``).
Here each model family is described once and every downstream component
(integrator, problem builder, solver, simulator, sharding) is generic over it.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Tuple

from . import double as _double
from . import single as _single
from . import triple as _triple
from .params import (
    DoubleCartPoleParams,
    SingleCartPoleParams,
    TripleCartPoleParams,
)

__all__ = [
    "CartPoleModel",
    "SINGLE_CARTPOLE",
    "DOUBLE_CARTPOLE",
    "TRIPLE_CARTPOLE",
    "get_model",
]


@dataclasses.dataclass(frozen=True)
class CartPoleModel:
    """Static description of a dynamics family (hashable: safe as a jit-static arg)."""

    name: str
    state_dim: int
    #: Indices of angle coordinates in the state vector (wrapped to (-pi, pi]).
    angle_indices: Tuple[int, ...]
    #: f(params, x, u, f_base=None, f_mass=None, ...) -> x_dot
    dynamics: Callable[..., Any]
    #: Total mechanical energy (for physics-invariant tests).
    energy: Callable[..., Any]
    #: Constructor for the parameter PyTree.
    params_type: type
    #: Optional fj(params, x, u) -> (x_dot, J_x, J_u) with machine-generated
    #: analytic Jacobians (solver hot path; AD fallback used when None).
    dynamics_jac: Any = None
    #: Optional rows-out variants for structure-of-arrays rollouts
    #: (``ops/lanes.py``): f(params, x_rows, u) -> x_dot_rows and
    #: fj(params, x_rows, u) -> (x_dot_rows, J_x_rows, J_u_rows), all
    #: (nested) tuples of per-coordinate arrays.
    dynamics_core: Any = None
    dynamics_jac_core: Any = None

    def default_params(self):
        return self.params_type()


SINGLE_CARTPOLE = CartPoleModel(
    name="single",
    state_dim=_single.STATE_DIM,
    angle_indices=_single.ANGLE_INDICES,
    dynamics=_single.single_cartpole_dynamics,
    energy=_single.single_cartpole_energy,
    params_type=SingleCartPoleParams,
    dynamics_jac=_single.single_cartpole_dynamics_jac,
    dynamics_core=_single.single_cartpole_dynamics_core,
    dynamics_jac_core=_single.single_cartpole_dynamics_jac_core,
)

DOUBLE_CARTPOLE = CartPoleModel(
    name="double",
    state_dim=_double.STATE_DIM,
    angle_indices=_double.ANGLE_INDICES,
    dynamics=_double.double_cartpole_dynamics,
    energy=_double.double_cartpole_energy,
    params_type=DoubleCartPoleParams,
    dynamics_jac=_double.double_cartpole_dynamics_jac,
    dynamics_core=_double.double_cartpole_dynamics_core,
    dynamics_jac_core=_double.double_cartpole_dynamics_jac_core,
)

TRIPLE_CARTPOLE = CartPoleModel(
    name="triple",
    state_dim=_triple.STATE_DIM,
    angle_indices=_triple.ANGLE_INDICES,
    dynamics=_triple.triple_cartpole_dynamics,
    energy=_triple.triple_cartpole_energy,
    params_type=TripleCartPoleParams,
    dynamics_jac=_triple.triple_cartpole_dynamics_jac,
    dynamics_core=_triple.triple_cartpole_dynamics_core,
    dynamics_jac_core=_triple.triple_cartpole_dynamics_jac_core,
)

_REGISTRY = {
    m.name: m for m in (SINGLE_CARTPOLE, DOUBLE_CARTPOLE, TRIPLE_CARTPOLE)
}


def get_model(name: str) -> CartPoleModel:
    """Look up a model family by name (``"single"`` / ``"double"`` /
    ``"triple"``) — the analog of the reference's ``--version single|double``
    codegen flag (``symbolic/generate.py:53-61``)."""
    try:
        return _REGISTRY[name]
    except KeyError:
        raise KeyError(f"unknown model {name!r}; available: {sorted(_REGISTRY)}") from None
