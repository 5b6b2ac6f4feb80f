"""Closed-form dynamics of the cart + double (two-link) pole system in JAX.

Replaces the reference's WIP symbolic derivation
(``/root/reference/symbolic/dynamics_double.py:25-148``): same Lagrangian,
derived by hand. State is 6-dim: ``[b_x, th_1, th_2, b_x_dot, th_1_dot,
th_2_dot]``; 6 parameters (``dynamics_double.py:14-22``). The reference model
carries no friction/drag/springs; we additionally accept optional external
point forces (the reference single-pole model supports them, and they cost
nothing here) so both model families share one interface.

Derivation sketch. With q = (x, th1, th2), point positions

    p1 = (x + l1 c1, l1 s1),   p2 = p1 + (l2 c2, l2 s2),

the mass matrix from T = 1/2 q_dot^T M q_dot is

    M = [[m_b+m1+m2,     -(m1+m2) l1 s1,     -m2 l2 s2       ],
         [-(m1+m2) l1 s1, (m1+m2) l1^2,       m2 l1 l2 c12   ],
         [-m2 l2 s2,      m2 l1 l2 c12,       m2 l2^2        ]]

with c12 = cos(th1 - th2), and the Euler-Lagrange equations M qdd = f with

    f_x   = u + (m1+m2) l1 c1 th1d^2 + m2 l2 c2 th2d^2
    f_th1 = -m2 l1 l2 s12 th2d^2 - (m1+m2) g l1 c1
    f_th2 =  m2 l1 l2 s12 th1d^2 - m2 g l2 c2

(s12 = sin(th1 - th2)), plus generalized external forces. The 3x3 system is
solved with a closed-form adjugate (symmetric 3x3), mirroring the reference's
symbolic matrix inverse (``sympy_utils.py:43-50``) while staying fully
vectorizable.
"""

from __future__ import annotations

import jax.numpy as jnp

from .params import DoubleCartPoleParams

__all__ = ["double_cartpole_dynamics", "double_cartpole_energy"]

STATE_DIM = 6
ANGLE_INDICES = (1, 2)


def _solve_sym3(a11, a12, a13, a22, a23, a33, b1, b2, b3):
    """Solve a symmetric 3x3 system via the adjugate (branch-free, vmappable)."""
    c11 = a22 * a33 - a23 * a23
    c12 = a13 * a23 - a12 * a33
    c13 = a12 * a23 - a13 * a22
    c22 = a11 * a33 - a13 * a13
    c23 = a12 * a13 - a11 * a23
    c33 = a11 * a22 - a12 * a12
    det = a11 * c11 + a12 * c12 + a13 * c13
    x1 = (c11 * b1 + c12 * b2 + c13 * b3) / det
    x2 = (c12 * b1 + c22 * b2 + c23 * b3) / det
    x3 = (c13 * b1 + c23 * b2 + c33 * b3) / det
    return x1, x2, x3


def double_cartpole_dynamics(
    params: DoubleCartPoleParams,
    x,
    u,
    f_base=None,
    f_mass=None,
    f_mass_2=None,
):
    """Continuous-time dynamics ``x_dot = f(x, u)`` for the double pole.

    Args:
      params: system parameters.
      x: state ``[b_x, th_1, th_2, b_x_dot, th_1_dot, th_2_dot]``, shape (6,).
      u: scalar horizontal control force on the base.
      f_base: optional external force (fx, fy) at the base.
      f_mass: optional external force (fx, fy) at the first link mass.
      f_mass_2: optional external force (fx, fy) at the second link mass.

    Returns:
      ``x_dot`` with shape ``(6,)``.
    """
    x = jnp.asarray(x)
    th1, th2 = x[1], x[2]
    b_v, th1_v, th2_v = x[3], x[4], x[5]
    m_b, m_1, m_2 = params.m_b, params.m_1, params.m_2
    l_1, l_2, g = params.l_1, params.l_2, params.g

    s1, c1 = jnp.sin(th1), jnp.cos(th1)
    s2, c2 = jnp.sin(th2), jnp.cos(th2)
    s12 = s1 * c2 - c1 * s2  # sin(th1 - th2)
    c12 = c1 * c2 + s1 * s2  # cos(th1 - th2)

    m12 = m_1 + m_2

    # Mass matrix entries (symmetric).
    a11 = m_b + m12
    a12 = -m12 * l_1 * s1
    a13 = -m_2 * l_2 * s2
    a22 = m12 * l_1 * l_1
    a23 = m_2 * l_1 * l_2 * c12
    a33 = m_2 * l_2 * l_2

    # Generalized external forces: Q_q = sum_i f_i . dp_i/dq.
    # (dtype-pinned: a default-dtype zeros(()) would promote the whole
    # computation to f64 under jax_enable_x64.)
    q_x = jnp.zeros((), x.dtype)
    q_1 = jnp.zeros((), x.dtype)
    q_2 = jnp.zeros((), x.dtype)
    if f_base is not None:
        f_base = jnp.asarray(f_base)
        q_x = q_x + f_base[0]
    if f_mass is not None:
        f_mass = jnp.asarray(f_mass)
        q_x = q_x + f_mass[0]
        q_1 = q_1 + l_1 * (-s1 * f_mass[0] + c1 * f_mass[1])
    if f_mass_2 is not None:
        f_mass_2 = jnp.asarray(f_mass_2)
        q_x = q_x + f_mass_2[0]
        q_1 = q_1 + l_1 * (-s1 * f_mass_2[0] + c1 * f_mass_2[1])
        q_2 = q_2 + l_2 * (-s2 * f_mass_2[0] + c2 * f_mass_2[1])

    b1 = u + q_x + m12 * l_1 * c1 * th1_v * th1_v + m_2 * l_2 * c2 * th2_v * th2_v
    b2 = q_1 - m_2 * l_1 * l_2 * s12 * th2_v * th2_v - m12 * g * l_1 * c1
    b3 = q_2 + m_2 * l_1 * l_2 * s12 * th1_v * th1_v - m_2 * g * l_2 * c2

    b_acc, th1_acc, th2_acc = _solve_sym3(a11, a12, a13, a22, a23, a33, b1, b2, b3)
    return jnp.stack([b_v, th1_v, th2_v, b_acc, th1_acc, th2_acc])


def double_cartpole_dynamics_jac(params: DoubleCartPoleParams, x, u):
    """``(x_dot, J_x, J_u)`` with machine-generated analytic Jacobians
    (see ``models/_double_gen.py`` and the note in
    :func:`cartpole_tpu.models.single.single_cartpole_dynamics_jac`)."""
    from . import _double_gen

    pt = (
        params.m_b, params.m_1, params.m_2, params.l_1, params.l_2, params.g,
    )
    return _double_gen.double_dynamics_jac(pt, jnp.asarray(x), u)


def double_cartpole_dynamics_core(
    params: DoubleCartPoleParams, x_rows, u, forces=None
):
    """Rows-out dynamics for structure-of-arrays rollouts (see
    ``models/single.py::single_cartpole_dynamics_core``). ``forces``:
    optional ``(f_b_x, f_b_y, f_1_x, f_1_y, f_2_x, f_2_y)``."""
    from . import _double_gen

    pt = (
        params.m_b, params.m_1, params.m_2, params.l_1, params.l_2, params.g,
    )
    return _double_gen.double_dynamics_core(pt, x_rows, u, forces)


def double_cartpole_dynamics_jac_core(params: DoubleCartPoleParams, x_rows, u):
    """Rows-out ``(x_dot, J_x, J_u)`` as nested tuples."""
    from . import _double_gen

    pt = (
        params.m_b, params.m_1, params.m_2, params.l_1, params.l_2, params.g,
    )
    return _double_gen.double_dynamics_jac_core(pt, x_rows, u)


def double_cartpole_energy(params: DoubleCartPoleParams, x):
    """Total mechanical energy T + V (conserved: the reference double model
    has no dissipative terms)."""
    x = jnp.asarray(x)
    th1, th2 = x[1], x[2]
    b_v, th1_v, th2_v = x[3], x[4], x[5]
    m_b, m_1, m_2 = params.m_b, params.m_1, params.m_2
    l_1, l_2, g = params.l_1, params.l_2, params.g
    s1, c1 = jnp.sin(th1), jnp.cos(th1)
    s2, c2 = jnp.sin(th2), jnp.cos(th2)
    v1x = b_v - l_1 * s1 * th1_v
    v1y = l_1 * c1 * th1_v
    v2x = v1x - l_2 * s2 * th2_v
    v2y = v1y + l_2 * c2 * th2_v
    kinetic = (
        0.5 * m_b * b_v * b_v
        + 0.5 * m_1 * (v1x * v1x + v1y * v1y)
        + 0.5 * m_2 * (v2x * v2x + v2y * v2y)
    )
    potential = m_1 * g * l_1 * s1 + m_2 * g * (l_1 * s1 + l_2 * s2)
    return kinetic + potential
