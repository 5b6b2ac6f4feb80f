"""Plant simulator — functional analog of ``pendulum::Simulator``.

Parity with ``/root/reference/optimization/simulator.{hpp,cc}``: the plant
integrates the *same* dynamics model at fixed 1 ms RK4 substeps (1 kHz,
``simulator.cc:17-23``) regardless of the caller's step size, wraps the angle
after each substep, and accepts external forces at the base and pole mass that
the planner never sees. The state is an explicit array the caller carries
(vmap-able); a thin stateful wrapper mirrors the reference's OO surface for
host-side convenience and API parity with ``pypendulum.Simulator``
(``wrapper/wrapper.cc:85-98``).
"""

from __future__ import annotations

import math

import jax.numpy as jnp

from ..models.base import CartPoleModel, SINGLE_CARTPOLE
from ..ops.integrate import substep_rollout

__all__ = ["simulator_step", "Simulator", "DEFAULT_INTERNAL_DT"]

DEFAULT_INTERNAL_DT = 1.0e-3  # simulator.cc:18


def simulator_step(
    dynamics_params,
    x,
    dt: float,
    u,
    f_base=None,
    f_mass=None,
    model: CartPoleModel = SINGLE_CARTPOLE,
    internal_dt: float = DEFAULT_INTERNAL_DT,
    f_mass_2=None,
):
    """Advance the plant state by ``dt`` (static) under constant control ``u``.

    Pure function of ``(params, x, u, forces)`` — vmap/jit/shard freely.
    ``f_mass_2`` (second-link external force) is only meaningful for the
    double-pole model and must be left ``None`` for models without it.
    """
    if dt < 0:
        raise ValueError("dt must be >= 0")

    def f(x_, u_):
        if f_mass_2 is not None:
            return model.dynamics(
                dynamics_params, x_, u_, f_base, f_mass, f_mass_2
            )
        return model.dynamics(dynamics_params, x_, u_, f_base, f_mass)

    return substep_rollout(
        f, jnp.asarray(x), u, dt, internal_dt, model.angle_indices
    )


class Simulator:
    """Stateful host-side wrapper (API parity with the reference class).

    Initial state matches ``simulator.hpp:28``: pole hanging down
    (``[0, -pi/2, 0, 0]`` for the single model; angles at -pi/2 generally).
    """

    def __init__(self, model: CartPoleModel = SINGLE_CARTPOLE, dtype=None):
        self.model = model
        if dtype is None:
            # f64 parity precision when x64 is enabled; otherwise use f32
            # rather than letting JAX silently truncate a requested f64.
            dtype = jnp.float64 if jnp.zeros(()).dtype == jnp.float64 else jnp.float32
        x0 = [0.0] * model.state_dim
        for a in model.angle_indices:
            x0[a] = -math.pi / 2
        self._state = jnp.asarray(x0, dtype)

    def get_state(self):
        return self._state

    def set_state(self, x):
        self._state = jnp.asarray(x, self._state.dtype)

    def step(
        self,
        dynamics_params,
        dt: float,
        u,
        f_base=None,
        f_mass=None,
        f_mass_2=None,
        internal_dt: float = DEFAULT_INTERNAL_DT,
    ):
        if not bool(jnp.all(jnp.isfinite(jnp.asarray(u)))):
            raise ValueError(f"u = {u} is not finite")  # simulator.cc:14
        self._state = simulator_step(
            dynamics_params,
            self._state,
            dt,
            u,
            f_base,
            f_mass,
            self.model,
            internal_dt,
            f_mass_2,
        )
        return self._state
