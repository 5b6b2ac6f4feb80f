"""Dynamics of the cart + triple (three-link) pole chain in JAX.

A model family beyond the reference's roadmap: the reference hard-codes
``state_dim = 4`` with a TODO to generalize (``/root/reference/optimization/
optimization.cc:197-198``) and stops at a WIP two-link symbolic derivation
(``symbolic/dynamics_double.py:1-3``). Here the chain is extended one more
link through the same pipeline — SymPy Euler-Lagrange derivation
(``symbolic/lagrangian.py::derive_triple_cartpole``) -> machine-generated
JAX kernel (``models/_triple_gen.py``) — and every downstream layer
(integrator, problem builder, solver, lanes fast path, simulator, sharding)
consumes it unchanged via the :class:`~cartpole_tpu.models.base.CartPoleModel`
descriptor. State is 8-dim ``[b_x, th_1, th_2, th_3, b_x_dot, th_1_dot,
th_2_dot, th_3_dot]``; 8 parameters. Conservative (no friction/drag/springs,
like the reference double model), with optional external point forces at the
base and all three masses.
"""

from __future__ import annotations

import jax.numpy as jnp

from .params import TripleCartPoleParams

__all__ = ["triple_cartpole_dynamics", "triple_cartpole_energy"]

STATE_DIM = 8
ANGLE_INDICES = (1, 2, 3)


def _params_tuple(params: TripleCartPoleParams):
    return (
        params.m_b, params.m_1, params.m_2, params.m_3,
        params.l_1, params.l_2, params.l_3, params.g,
    )


def _forces_tuple(x, f_base, f_mass, f_mass_2, f_mass_3):
    if f_base is None and f_mass is None and f_mass_2 is None \
            and f_mass_3 is None:
        return None
    # dtype-pinned zero: a default-dtype scalar would promote the whole
    # computation to f64 under jax_enable_x64.
    zero = jnp.zeros((), jnp.asarray(x[0]).dtype)
    out = []
    for fv in (f_base, f_mass, f_mass_2, f_mass_3):
        if fv is None:
            out.extend([zero, zero])
        else:
            fv = jnp.asarray(fv)
            out.extend([fv[0], fv[1]])
    return tuple(out)


def triple_cartpole_dynamics(
    params: TripleCartPoleParams,
    x,
    u,
    f_base=None,
    f_mass=None,
    f_mass_2=None,
    f_mass_3=None,
):
    """Continuous-time dynamics ``x_dot = f(x, u)`` for the triple pole.

    Args:
      params: system parameters.
      x: state ``[b_x, th_1..th_3, b_x_dot, th_1_dot..th_3_dot]``, shape (8,).
      u: scalar horizontal control force on the base.
      f_base / f_mass / f_mass_2 / f_mass_3: optional external forces
        (fx, fy) at the base and at each link mass.

    Returns:
      ``x_dot`` with shape ``(8,)``.
    """
    from . import _triple_gen

    x = jnp.asarray(x)
    forces = _forces_tuple(x, f_base, f_mass, f_mass_2, f_mass_3)
    return _triple_gen.triple_dynamics(_params_tuple(params), x, u, forces)


def triple_cartpole_dynamics_jac(params: TripleCartPoleParams, x, u):
    """``(x_dot, J_x, J_u)`` with machine-generated analytic Jacobians
    (see the note in
    :func:`cartpole_tpu.models.single.single_cartpole_dynamics_jac`)."""
    from . import _triple_gen

    return _triple_gen.triple_dynamics_jac(
        _params_tuple(params), jnp.asarray(x), u
    )


def triple_cartpole_dynamics_core(
    params: TripleCartPoleParams, x_rows, u, forces=None
):
    """Rows-out dynamics for structure-of-arrays rollouts (see
    ``models/single.py::single_cartpole_dynamics_core``). ``forces``:
    optional flat ``(f_b_x, f_b_y, f_1_x, f_1_y, ..., f_3_y)``."""
    from . import _triple_gen

    return _triple_gen.triple_dynamics_core(
        _params_tuple(params), x_rows, u, forces
    )


def triple_cartpole_dynamics_jac_core(params: TripleCartPoleParams, x_rows, u):
    """Rows-out ``(x_dot, J_x, J_u)`` as nested tuples."""
    from . import _triple_gen

    return _triple_gen.triple_dynamics_jac_core(
        _params_tuple(params), x_rows, u
    )


def triple_cartpole_energy(params: TripleCartPoleParams, x):
    """Total mechanical energy T + V (conserved: the triple model carries
    no dissipative terms)."""
    x = jnp.asarray(x)
    b_v = x[4]
    masses = (params.m_1, params.m_2, params.m_3)
    lengths = (params.l_1, params.l_2, params.l_3)
    vx, vy, h = b_v, jnp.zeros((), x.dtype), jnp.zeros((), x.dtype)
    kinetic = 0.5 * params.m_b * b_v * b_v
    potential = jnp.zeros((), x.dtype)
    for i in range(3):
        th, th_v = x[1 + i], x[5 + i]
        s, c = jnp.sin(th), jnp.cos(th)
        vx = vx - lengths[i] * s * th_v
        vy = vy + lengths[i] * c * th_v
        h = h + lengths[i] * s
        kinetic = kinetic + 0.5 * masses[i] * (vx * vx + vy * vy)
        potential = potential + masses[i] * params.g * h
    return kinetic + potential
