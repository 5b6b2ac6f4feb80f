"""Differentiable MPC: exact gradients THROUGH the receding-horizon solve.

A capability the reference's C++/WASM stack cannot offer and a flagship
reason to build this framework on JAX: the solve itself becomes a
differentiable function of the problem data. ``make_differentiable_solve``
wraps one MPC solve in a ``jax.custom_vjp`` whose backward pass applies
the KKT implicit function theorem at the solver's solution — no
differentiating through the (fixed-trip, line-searched, LM-damped)
iteration itself, so gradients are exact at convergence and cost one
linear solve, not 8 unrolled GN iterations.

Math. The solve returns ``z*`` minimizing ``1/2 ||r(z, θ)||²`` subject to
``c(z, θ) = 0`` (multiple-shooting defects, initial-state pin, terminal
equalities — ``mpc/problem.py``), with bound clamps on controls and cart
position applied by retraction. At a regular solution there exist
multipliers ``ν*`` with stationarity ``g(z*, ν*, θ) = ∇_z L = 0`` where
``L = 1/2||r||² + νᵀc``. The implicit function theorem on
``F(z, ν, θ) = [g; c] = 0`` gives

    d(z,ν)/dθ = -(∂F/∂(z,ν))⁻¹ ∂F/∂θ,

so the VJP of ``z*`` with cotangent ``w`` is ``-λᵀ ∂F/∂θ`` with
``(∂F/∂(z,ν))ᵀ λ = [w; 0]``. ``∂F/∂z`` uses the TRUE Hessian of the
Lagrangian (via ``jax.grad``), not the solver's Gauss-Newton
approximation, so gradients match finite differences to solver-convergence
accuracy (``tests/test_diff.py``).

Active bounds: coordinates clamped at ``±u_limit`` / ``±b_x_limit`` are
handled as Dirichlet rows — the active coordinate is treated as FIXED
(``dz_i = 0``, no gradient flows through it). This keeps the adjoint
system well-posed, but the result is an APPROXIMATION whenever clamps are
active: the forward solver enforces bounds by retraction (clamping the GN
step, ``mpc/problem.py`` — the reference's scheme, optimization.cc:319-328),
so its limit point under saturation is a clamp fixed point rather than a
KKT point of the bound-constrained problem (the equality residuals and the
projected gradient both stay O(1e-1) there — measured, see
``tests/test_diff.py::TestActiveBounds``), and no implicit-function formula
on the idealized KKT system can reproduce d(solve)/dθ exactly (measured
~40% deviation from finite differences on a mildly saturated solve).
Exact gradients require the solution to be INTERIOR — true for the
disturbance-rejection / sysid / imitation regimes this is built for.
Differentiation wrt θ = (x_current, dynamics_params, set_point); the warm
start selects the local basin and correctly carries no gradient.

The adjoint KKT matrix is assembled from the problem's SEPARABLE second
derivatives — ``∇²cost`` (dynamics-free) plus one vmapped ``(sd+spacing)²``
Hessian per shooting segment, scattered into place — never as a monolithic
``jacfwd`` of the stationarity map over the whole window. That exploits
the multiple-shooting sparsity (O(N·k³) instead of O(n²) second-order AD,
and small dense per-segment programs are the TPU-friendly shape), and it
also dodges a measured XLA:CPU miscompile: whole-window second-order
programs beyond ~8 segments corrupt the heap on this image (glibc abort;
4-segment windows are fine — the per-segment assembly is immune at any
window length). The assembled matrix is dense ``n × n`` with
``n = dim(z) + n_constraints`` (≈115 at reference defaults) — padded to a
multiple of 16 before ``jnp.linalg.solve`` (TPU batched-LU sizes 83/84/88
fail to compile; multiples of 16 in [96, 256] are safe — CLAUDE.md).
Batch with ``jax.vmap`` as usual.

No reference-file citation: the reference has no equivalent (its solver is
an opaque C++ submodule); this module exists because the TPU-native stack
is built from pure JAX functions end to end.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["make_differentiable_solve"]


def _pad_solve(M, rhs):
    """``jnp.linalg.solve`` padded to a multiple of 16 (identity block on
    the padding diagonal) — the TPU batched-LU VMEM bug workaround used by
    ``ops/solver.py``."""
    n = M.shape[-1]
    pad = (-n) % 16
    if pad:
        dtype = M.dtype
        M = jnp.block([
            [M, jnp.zeros((n, pad), dtype)],
            [jnp.zeros((pad, n), dtype), jnp.eye(pad, dtype=dtype)],
        ])
        rhs = jnp.concatenate([rhs, jnp.zeros((pad,), dtype)])
    sol = jnp.linalg.solve(M, rhs)
    return sol[:n]


def make_differentiable_solve(mpc, bound_tol: float = 1e-6,
                              multiplier_ridge: float = 1e-12):
    """Build ``solve(x_current, dynamics_params, set_point, state) -> z``
    with exact implicit-function-theorem gradients wrt
    ``(x_current, dynamics_params, set_point)``.

    ``mpc`` is the static controller definition (``make_mpc``); ``state``
    is the warm-start ``MPCState`` (gradient-free by construction). The
    returned ``z`` is the full decision vector; slice
    ``z[mpc.spec.u_start:]`` for the control window and ``z[... : u_start]``
    for the shooting states. Compose into larger differentiable programs
    (losses over ``u``, predicted rollouts, closed-loop imitation) freely.

    Gradients are exact when the forward solver has converged (run enough
    ``max_iterations``; f64 recommended for gradient work) and the bound
    active set is locally constant. ``bound_tol`` decides which
    coordinates count as clamped.
    """
    spec = mpc.spec
    p = mpc.params

    def _u_prev_continuity(state, dtype):
        # mpc/controller.py::_initial_guess — the u-derivative cost's
        # continuity anchor is the warm start's first control (0 cold).
        u_prev = state.previous_solution.astype(dtype)[spec.u_start:]
        return jnp.where(state.warm, u_prev[0], jnp.zeros((), dtype))

    def _forward(x, dp, sp, state):
        outputs, _new_state = mpc.step(state, x, dp, b_x_set_point=sp)
        return outputs.solution

    @jax.custom_vjp
    def solve(x, dp, sp, state):
        return _forward(x, dp, sp, state)

    def fwd(x, dp, sp, state):
        z = _forward(x, dp, sp, state)
        return z, (z, x, dp, sp, state)

    # Static scatter map: segment s's local variables are
    # (x_s, u_segment_s) — the only z-coordinates its defect touches
    # nonlinearly (multiple-shooting separability, mpc/problem.py).
    sd, k, n_seg = spec.state_dim, spec.spacing, spec.num_states - 1
    _idx = np.empty((n_seg, sd + k), np.int32)
    for _s in range(n_seg):
        _idx[_s, :sd] = np.arange(_s * sd, (_s + 1) * sd)
        _idx[_s, sd:] = spec.u_start + np.arange(_s * k, (_s + 1) * k)
    n_def = n_seg * sd

    def bwd(res, w):
        z, x, dp, sp, state = res
        dtype = z.dtype
        u_prev = _u_prev_continuity(state, dtype)

        # Clamped-coordinate mask (Dirichlet rows; see module docstring).
        u_mask = jnp.asarray(spec._u_mask)
        pos_mask = jnp.asarray(spec._pos_mask)
        limit = jnp.where(u_mask, p.u_limit, jnp.where(pos_mask, p.b_x_limit,
                                                       jnp.inf))
        active = jnp.abs(z) >= limit - bound_tol

        def cost(z_, sp_):
            r = spec.cost_residuals(z_, sp_, u_prev)
            return 0.5 * jnp.sum(r * r)

        def cons(z_, x_, dp_, sp_):
            return spec.constraints(z_, x_, sp_, dp_)

        def static_cons(z_, x_, sp_):
            # Pin + terminal equality rows (dynamics-free; constraint rows
            # n_def..n_c in spec.constraints' ordering).
            xs_, _ = spec._split(z_)
            return spec._linear_eq_residuals(xs_, x_, sp_)

        # Multiplier recovery at z*: least squares on the INACTIVE
        # stationarity rows,  min_ν ||P (∇f + Aᵀ ν)||².
        g0 = jax.grad(cost)(z, sp)
        A = jax.jacfwd(cons)(z, x, dp, sp)          # (n_c, n_z)
        P = (~active).astype(dtype)
        APt = A * P[None, :]
        n_c = A.shape[0]
        S = APt @ APt.T + multiplier_ridge * jnp.eye(n_c, dtype=dtype)
        nu = _pad_solve(S, -(APt @ (P * g0)))

        # ---- KKT matrix, assembled from SEPARABLE second derivatives.
        # A monolithic jacfwd of the stationarity map over the whole
        # window is both O(n²) wasteful and — measured on this image —
        # miscompiled by XLA:CPU beyond ~8 segments (heap corruption).
        # The Lagrangian's curvature splits exactly:
        #   ∇²L = ∇²cost  (dynamics-free)
        #       + Σ_s ∇²[ν_sᵀ segment_s]   (each over its 9 local vars)
        # (pin/terminal rows are linear in z — zero curvature a.e.).
        xs, useg = spec._split(z)
        vs = jnp.concatenate([xs[:-1], useg], axis=1)   # (n_seg, sd+k)
        nu_def = nu[:n_def].reshape(n_seg, sd)

        def seg_scalar(v, nu_s, dp_):
            segf = spec._segment_fn(dp_)
            return jnp.dot(nu_s, segf(v[:sd], v[sd:]))

        H = jax.hessian(cost)(z, sp)
        Hseg = jax.vmap(jax.hessian(seg_scalar), in_axes=(0, 0, None))(
            vs, nu_def, dp)                              # (n_seg, sd+k, sd+k)
        idx = jnp.asarray(_idx)
        H = H.at[idx[:, :, None], idx[:, None, :]].add(Hseg)

        # Dirichlet rows for clamped coordinates: row i of the
        # stationarity block becomes e_i (zero against the Aᵀ block).
        eye = jnp.eye(spec.dim, dtype=dtype)
        G = jnp.where(active[:, None], eye, H)
        B = jnp.where(active[:, None], jnp.zeros((), dtype), A.T)
        M = jnp.block([[G, B], [A, jnp.zeros((n_c, n_c), dtype)]])
        rhs = jnp.concatenate([w, jnp.zeros((n_c,), dtype)])
        lam = _pad_solve(M.T, rhs)

        # ---- θ-gradients: -λᵀ ∂F/∂θ with F = [∇_z L; c], again split
        # into the dynamics-free part (x, sp enter via cost/pin/terminal)
        # and per-segment parts (dp enters via the RK4 chains). Clamped
        # rows of F are z_i - const: θ-independent, so they are excluded
        # from λ_z.
        lam_z = jnp.where(active, jnp.zeros((), dtype), lam[: spec.dim])
        lam_c = lam[spec.dim:]
        lam_def = lam_c[:n_def].reshape(n_seg, sd)
        lam_v = lam_z[idx]                               # (n_seg, sd+k)
        nu_lin = nu[n_def:]
        lam_lin = lam_c[n_def:]

        def phi_static(x_, sp_):
            def l_static(z_):
                return cost(z_, sp_) + jnp.dot(
                    nu_lin, static_cons(z_, x_, sp_))

            dir_grad = jax.jvp(l_static, (z,), (lam_z,))[1]
            return dir_grad + jnp.dot(lam_lin, static_cons(z, x_, sp_))

        def phi_dyn(dp_):
            def one(v, nu_s, lam_vs, lam_ds):
                f = lambda vv: seg_scalar(vv, nu_s, dp_)
                mixed = jax.jvp(f, (v,), (lam_vs,))[1]
                segf = spec._segment_fn(dp_)
                return mixed + jnp.dot(lam_ds, segf(v[:sd], v[sd:]))

            return jnp.sum(jax.vmap(one)(vs, nu_def, lam_v, lam_def))

        gx, gsp = jax.grad(phi_static, argnums=(0, 1))(x, sp)
        gdp = jax.grad(phi_dyn)(dp)
        neg = lambda t: jax.tree.map(jnp.negative, t)
        g_state = jax.tree.map(jnp.zeros_like, state)
        return neg(gx), neg(gdp), neg(gsp), g_state

    solve.defvjp(fwd, bwd)
    return solve
