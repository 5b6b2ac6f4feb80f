"""Batch-in-lanes (batch-last) integration ops — the TPU layout fix.

The vmapped hot path materializes ``(B, sd, sd)``-shaped Jacobian
intermediates whose trailing ``(4, 4)`` pages pad to TPU ``(8, 128)`` tiles —
~64x HBM overhead, which is what capped round 1 at ~17.5k solves/s (the chip
is bandwidth-bound on padding, measured flat from batch 1024 to 32768).

This module keeps the BATCH in the trailing (lane) axis instead: every
intermediate is ``(sd, M)`` or ``(sd, sd, M)`` with ``M`` = thousands of
instances, so the tile padding is <= 2x and the vector units stream full
lanes. The machine-generated scalar dynamics kernels
(``models/_single_gen.py`` / ``_double_gen.py``) broadcast over trailing axes
by construction, so they run unmodified on ``x`` of shape ``(sd, M)``; the
per-instance Jacobians come from their closed-form ``J_x``/``J_u`` outputs
chained through a batch-last RK4 (jacfwd cannot produce per-instance
Jacobians in this layout).

Replaces the same reference capability as ``ops/integrate.py`` (the hot loop
of ``/root/reference/optimization/optimization.cc:110-155``); the vmapped
variants remain the generic/autodiff path.

All functions take ONE flattened trailing batch axis ``M``; callers fold
(segments x instances) or (alphas x segments x instances) into it and unfold
after.
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax.numpy as jnp

from .integrate import mod_pi

__all__ = [
    "bmat",
    "bmv",
    "beye",
    "rk4_step_lanes",
    "rk4_step_with_jac_lanes",
    "segment_rollout_with_jac_lanes",
    "rollout_lanes",
    "wrap_angles_lanes",
]


def bmat(A, B):
    """Batched tiny-matrix product ``(i,j,M) x (j,k,M) -> (i,k,M)``.

    ``j`` is the state dimension (4 or 6): an explicit broadcast-multiply-
    reduce stays fully elementwise over the lane axis (no dot_general, no
    layout shuffle)."""
    return jnp.sum(A[:, :, None] * B[None, :, :], axis=1)


def bmv(A, x):
    """Batched tiny matrix-vector product ``(i,j,M) x (j,M) -> (i,M)``."""
    return jnp.sum(A * x[None, :, :], axis=1)


def beye(n, dtype):
    """Identity broadcastable against ``(n, n, M)``."""
    return jnp.eye(n, dtype=dtype)[:, :, None]


def wrap_angles_lanes(x, angle_indices: Tuple[int, ...]):
    """``mod_pi`` the given leading coordinates of ``x`` (sd, M)."""
    for i in angle_indices:
        x = x.at[i].set(mod_pi(x[i]))
    return x


def rk4_step_lanes(f: Callable, x, u, h):
    """One RK4 step, batch-last: ``x`` (sd, M), ``u`` (M,)."""
    k1 = f(x, u)
    k2 = f(x + k1 * (h * 0.5), u)
    k3 = f(x + k2 * (h * 0.5), u)
    k4 = f(x + k3 * h, u)
    return x + (h / 6.0) * (k1 + 2.0 * k2 + 2.0 * k3 + k4)


def rk4_step_with_jac_lanes(fj: Callable, x, u, h):
    """One RK4 step with analytic chain-ruled Jacobians, batch-last.

    ``fj(x, u) -> (x_dot (sd, M), J_x (sd, sd, M), J_u (sd, M))`` — the
    machine-generated closed-form kernels evaluated on lane-batched inputs.
    Same chain rule as :func:`ops.integrate.rk4_step_with_jac` (capability
    of the reference's ``runge_kutta_4th_order``, ``integration.hpp:13-49``)
    with every product a full-lane elementwise op.

    Returns ``(x_next (sd, M), A (sd, sd, M), B (sd, M))``.
    """
    sd = x.shape[0]
    eye = beye(sd, x.dtype)

    k1, A1, B1 = fj(x, u)
    k2, A2, B2 = fj(x + k1 * (h * 0.5), u)
    dk2_dx = bmat(A2, eye + (h * 0.5) * A1)
    dk2_du = bmv(A2, (h * 0.5) * B1) + B2

    k3, A3, B3 = fj(x + k2 * (h * 0.5), u)
    dk3_dx = bmat(A3, eye + (h * 0.5) * dk2_dx)
    dk3_du = bmv(A3, (h * 0.5) * dk2_du) + B3

    k4, A4, B4 = fj(x + k3 * h, u)
    dk4_dx = bmat(A4, eye + h * dk3_dx)
    dk4_du = bmv(A4, h * dk3_du) + B4

    x_next = x + (h / 6.0) * (k1 + 2.0 * k2 + 2.0 * k3 + k4)
    A = eye + (h / 6.0) * (A1 + 2.0 * dk2_dx + 2.0 * dk3_dx + dk4_dx)
    B = (h / 6.0) * (B1 + 2.0 * dk2_du + 2.0 * dk3_du + dk4_du)
    return x_next, A, B


def segment_rollout_with_jac_lanes(
    fj: Callable,
    x0,
    us,
    h,
    angle_indices: Tuple[int, ...] = (),
):
    """Integrate one shooting segment accumulating Jacobians, batch-last.

    ``x0`` (sd, M), ``us`` (T, M) -> ``(x_end (sd, M), Jx (sd, sd, M),
    Ju (sd, T, M))``. Fully unrolled over the small static T
    (= state_spacing); the angle wrap has unit derivative so it only
    touches the state.
    """
    sd = x0.shape[0]
    T = us.shape[0]
    x = x0
    Jx = jnp.broadcast_to(beye(sd, x0.dtype), (sd, sd, x0.shape[1]))
    cols = []
    for k in range(T):
        x, A, B = rk4_step_with_jac_lanes(fj, x, us[k], h)
        x = wrap_angles_lanes(x, angle_indices)
        Jx = bmat(A, Jx)
        cols = [bmv(A, c) for c in cols]
        cols.append(B)
    Ju = jnp.stack(cols, axis=1)  # (sd, T, M)
    return x, Jx, Ju


def rollout_lanes(
    f: Callable,
    x0,
    us,
    h,
    angle_indices: Tuple[int, ...] = (),
    stack_states: bool = False,
):
    """Integrate a control sequence batch-last (no Jacobians).

    ``x0`` (sd, M), ``us`` (T, M). Unrolled over T (small, static).
    Returns ``x_final`` (sd, M), or ``(x_final, xs (sd, T, M))`` with
    ``stack_states`` (state *after* each control, like
    :func:`ops.integrate.rollout`).
    """
    x = x0
    states = []
    T = us.shape[0]
    for k in range(T):
        x = rk4_step_lanes(f, x, us[k], h)
        x = wrap_angles_lanes(x, angle_indices)
        if stack_states:
            states.append(x)
    if stack_states:
        return x, jnp.stack(states, axis=1)
    return x
