"""Fused Gauss-Newton-iteration Pallas megakernel for the lanes MPC path.

Round 3's launch-floor probe (``scripts/probe_launch_floor.py`` /
``launch_floor.json``) showed the 6.45 ms/tick device floor is NOT kernel
launches (~2-3%) or while-trip overhead (~11%): it is the in-kernel time of
~230 small XLA fusions per GN iteration round-tripping every intermediate
through HBM at latency-bound sizes (measured 1.9 GB/s achieved vs 819 GB/s
peak — ``hbm_util: 0.0024``). This module fuses ONE ENTIRE damped-GN
iteration of the condensed lanes solver — segment rollout with chain-ruled
analytic Jacobians, forward condensation, spectral augmented-KKT solve with
one refinement step, step expansion, multiplier/first-order diagnostics,
the 5-trial folded Armijo line search (rollouts included), acceptance, and
LM damping — into a single Pallas TPU kernel. Every intermediate lives in
VMEM/registers; HBM sees only the iteration carry (~250 KB per 512-lane
tile).

Semantics are IDENTICAL to ``mpc.lanes._solve_lanes_impl``'s scan body
(same arithmetic, same op order wherever it affects f32 rounding);
``tests/test_fused.py`` asserts trace-for-trace equivalence against the
XLA path in f64 interpret mode and on-device f32. The kernel reuses the
same building blocks the XLA path traces — the machine-generated
closed-form dynamics (``models/_*_gen.py``), the rows-form RK4 chain rule
(``ops.lanes.segment_rollout_with_jac_rows`` / ``rk4_step_rows``), and the
MGS-QR Schur helpers (``mpc.problem``) — all of which are shape-polymorphic
pure-jnp and lower cleanly through Mosaic.

Reference capability: the hot loop of
``/root/reference/optimization/optimization.cc:110-155`` plus the mini_opt
inner iteration, executed as one fused device kernel per GN iteration.

Layout notes (see ``/opt/skills/guides/pallas_guide.md``):
- batch stays in the trailing (lane) axis; the segment axis ``S`` and the
  line-search trial axis ride the leading (untiled/sublane) dims, so the
  dynamics chains run on ``(S, Bt)`` / ``(n_ls, S, Bt)`` blocks — full-lane
  VPU shapes with zero padding waste at ``Bt`` a multiple of 128.
- the only MXU work is the static ``(K, K)`` spectral-basis rotations and
  the static cost-Jacobian products, done as plain ``jnp.dot`` with
  ``preferred_element_type`` pinned to the compute dtype.
- scalar dynamics parameters ride SMEM (constant-folded in-kernel);
  per-instance dynamics parameters (the BASELINE (mass, length)-grid
  sweep) ride one ``(n_p, Bt)`` VMEM block whose rows broadcast through
  the dynamics chains. All statics (eigenbasis, cost Jacobian) are VMEM
  inputs replicated across the batch grid.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ops.integrate import mod_pi
from ..ops.lanes import rk4_step_rows, segment_rollout_with_jac_rows

__all__ = ["make_fused_iteration", "fused_supported"]


def fused_supported(problem, config) -> bool:
    """Whether the fused kernel covers this problem configuration (the
    caller falls back to the XLA iteration body otherwise)."""
    spec = problem.spec
    if spec.model.dynamics_jac_core is None or spec.model.dynamics_core is None:
        return False
    if spec.params.rebase_equalities and len(spec.terminal_eqs):
        return False  # per-iteration equality re-basing not fused (rare path)
    for leaf in jax.tree.leaves(problem.dynamics_params):
        nd = jnp.ndim(leaf)
        if nd == 0:
            continue
        if nd == 1 and jnp.shape(leaf)[0] == problem.B:
            continue  # per-instance params: (n_p, B) VMEM block path
        return False
    return True


def _at(arr, k: int, axis: int = 0):
    """Static index into ``axis`` without jnp int indexing (which lowers
    to ``dynamic_slice`` — unimplemented in the Mosaic TPU lowering)."""
    return jax.lax.squeeze(
        jax.lax.slice_in_dim(arr, k, k + 1, axis=axis), (axis,)
    )


def _row(e, s, shape, dtype):
    """Slice segment ``s`` out of a nested-tuple Jacobian entry: arrays
    are ``(S,) + shape``; structural constants stay Python literals so
    downstream products keep folding."""
    if isinstance(e, (int, float)):
        return e
    return _at(e, s)


def _fold_sum(terms, like):
    """Sum of (literal-coefficient x array) products with 0/1 folding."""
    acc = None
    for coef, arr in terms:
        if isinstance(coef, (int, float)):
            if coef == 0.0:
                continue
            t = arr if coef == 1.0 else coef * arr
        else:
            t = coef * arr
        acc = t if acc is None else acc + t
    return jnp.zeros_like(like) if acc is None else acc


def make_fused_iteration(problem, config, batch_tile: int | None = None,
                         interpret: bool = False,
                         emulate: bool | None = None,
                         vmem_limit_bytes: int | None = None,
                         single_launch: bool = False,
                         _stop_after: int = 0):
    """Build the fused GN-iteration body for ``_solve_lanes_impl``'s scan.

    Returns ``iteration(carry, _) -> (carry, trace)`` with the exact carry
    and trace pytrees of the XLA body in ``mpc.lanes``. ``problem`` is a
    ``mpc.lanes._LanesProblem``; statics are captured at trace time.

    ``single_launch=True`` returns ``solve(carry0) -> (carryN, traces)``
    instead: the ENTIRE ``config.max_iterations``-trip damped-GN solve as
    ONE ``pallas_call`` with grid ``(B/Bt, n_iter)`` — the iteration axis
    rides the minor grid dimension with every carry block's index map
    ignoring it, so the carry stays RESIDENT IN VMEM across all
    iterations (initialized from the inputs at ``it == 0``, flushed to
    HBM once per batch tile) and per-tick kernel launches drop from
    ``n_iter`` to 1. The kernel BODY is still compiled once (the grid
    handles iteration — no 8x unroll, same Mosaic compile cost). Traces
    stream out through ``(n_iter, 1, B)`` outputs whose leading block
    index is the iteration. Measured v5e (fused_floor.json, 2026-08-20):
    bit-identical to the scan path, and the launch+carry overhead it
    removes is only ~0.002 ms/tick at batch 4096 — the kernel is
    VPU-compute-bound, so this mode is an equivalence/design proof and a
    floor-model instrument, not a throughput win.

    ``emulate`` (default: True on the CPU backend) runs the SAME tile
    ``body`` through the same manual grid/BlockSpec slicing as plain jnp
    instead of a ``pallas_call`` — arithmetic-identical, and the path the
    f64 equivalence tests run: Pallas interpret mode inlines an emulated
    kernel so large that XLA:CPU needs ~6 min to compile ONE iteration at
    even a 2-segment window (measured 2026-08-20). ``interpret=True``
    forces real interpret mode (debugging the pallas plumbing only).
    """
    from ..mpc.lanes import _Z  # local import: lanes imports this module
    from ..mpc.problem import _qr_gram_factor

    spec = problem.spec
    p = spec.params
    sd, N, sp, K, S = problem.sd, problem.N, problem.sp, problem.K, problem.S
    n_tc, n_t = problem.n_tc, problem.n_t
    n_all = n_tc + n_t
    B = problem.B
    dtype = problem.dtype
    angle = tuple(spec.model.angle_indices)
    term_costs = tuple(spec.terminal_costs)
    term_eqs = tuple(spec.terminal_eqs)
    dt = float(p.control_dt)
    u_limit = float(p.u_limit)
    b_x_limit = float(p.b_x_limit)
    w_du = float(p.u_derivative_cost_weight)
    w_u = float(p.u_cost_weight)
    n_ls = config.max_line_search_iterations
    alphas = [0.5 ** i for i in range(n_ls)]
    eps = float(jnp.finfo(dtype).eps)

    if emulate is None:
        emulate = jax.default_backend() == "cpu" and not interpret
    if batch_tile is None:
        batch_tile = B if (interpret or emulate) else min(B, 512)
    Bt = batch_tile
    if B % Bt:
        raise ValueError(f"batch {B} not divisible by batch_tile {Bt}")
    grid = (B // Bt,)

    # ------------------------------------------------------------- statics
    Ju_np = np.asarray(problem._Ju_cost, np.float64)  # (n_u, K)
    n_u = Ju_np.shape[0]
    Qm = jnp.asarray(problem._Hu_Q, dtype)  # (K, K)
    QTm = jnp.asarray(problem._Hu_Q.T, dtype)
    eigs2 = jnp.asarray(problem._Hu_eigs, dtype).reshape(K, 1)
    JuT = jnp.asarray(Ju_np.T, dtype)  # (K, n_u)
    Juc = jnp.asarray(Ju_np, dtype)  # (n_u, K)
    D_diag = [float(v) for v in problem._D_diag]  # length n_all
    w_costs = [float(v) for v in problem._w_costs]  # length n_tc
    sqrtD_scalars = [float(np.sqrt(v)) for v in problem._D_diag]

    leaves, treedef = jax.tree.flatten(problem.dynamics_params)
    n_p = len(leaves)
    batched_params = any(jnp.ndim(l) != 0 for l in leaves)
    if batched_params:
        # Per-instance dynamics params (the BASELINE (mass, length)-grid
        # sweep shape; reference treats live dynamics-param changes as
        # first-class, viz/src/application.ts:279-373): every leaf rides
        # a row of one (n_p, B) VMEM block, broadcast to the batch. The
        # scalar-SMEM path's in-kernel constant folding is forfeited —
        # measured cost on v5e is recorded in fused_params_grid.json.
        params_vec = jnp.stack([
            jnp.broadcast_to(jnp.asarray(l, dtype), (B,)) for l in leaves
        ])  # (n_p, B)
    else:
        params_vec = jnp.stack(
            [jnp.asarray(l, dtype) for l in leaves]
        ).reshape(1, n_p)

    jac_core = spec.model.dynamics_jac_core
    dyn_core = spec.model.dynamics_core

    def dot(a, b):
        return jnp.dot(a, b, preferred_element_type=dtype,
                       precision=jax.lax.Precision.HIGHEST)

    # ---------------------------------------------------------------- body
    def body(params_t, xc, spt, up, xs, u, lam, mu_pen, merit_prev,
             done, term, fo_carry, QT, Q, eigs, JuTm, Jucm):
        """One damped-GN iteration on a (..., Bt) tile — pure jnp, shared
        VERBATIM by the Pallas kernel and the CPU emulation path (the
        arithmetic is identical; only the memory plumbing differs).
        ``xc``/``xs`` are per-coordinate lists of ``(Bt,)``/``(N, Bt)``
        arrays; returns the 14 output arrays in pallas-output order."""

        def wrap(i, v):
            return mod_pi(v) if i in angle else v

        def _dbg(*live):
            """Debug early-out (``_stop_after``): well-shaped outputs that
            keep ``live`` rows from being DCE'd — Mosaic-fault bisection
            only, never on in production."""
            acc = jnp.zeros((Bt,), dtype)
            for v in live:
                acc = acc + jnp.sum(v.reshape(-1, Bt), axis=0)
            i32 = jnp.zeros((Bt,), jnp.int32)
            return (
                jnp.stack([xs[i] + acc[None, :] for i in range(sd)]),
                u + acc[None, :],
                acc, acc, acc, i32, i32, acc, acc, acc, acc, acc, acc, i32,
            )

        def target_of(ts):
            return spt if ts.is_setpoint else jnp.asarray(ts.target, dtype)

        # ---- cost residuals of the current iterate (mirrors
        # _LanesProblem.cost_residuals row order).
        def cost_rows(xs_rows_last, u_arr, up_arr):
            r_term = []
            for ts, w in zip(term_costs, w_costs):
                diff = xs_rows_last[ts.coord] - target_of(ts)
                if ts.is_angle:
                    diff = mod_pi(diff)
                r_term.append(w * diff)
            r_u = []
            if w_du > 0.0:
                r_u.append(w_du * (u_arr[:-1] - u_arr[1:]))
                r_u.append((w_du * (_at(u_arr, 0) - up_arr))[None])
            if w_u > 0.0:
                r_u.append(w_u * u_arr)
            r_u = jnp.concatenate(r_u, axis=0) if r_u else jnp.zeros(
                (0,) + u_arr.shape[1:], dtype
            )
            return r_term, r_u

        def eq_rows(xs_rows_last):
            vals = []
            for ts in term_eqs:
                diff = xs_rows_last[ts.coord] - target_of(ts)
                if ts.is_angle:
                    diff = mod_pi(diff)
                vals.append(diff)
            return vals

        # ================================================ condensed step
        # Segment linearization on (S, Bt) rows — the whole shooting
        # window in one unrolled rows-form chain (ops/lanes.py).
        x0_rows = tuple(xs[i][:-1] for i in range(sd))  # (S, Bt) each
        us_seg = jnp.stack(
            [
                jnp.stack([_at(u, s * sp + t) for s in range(S)])
                for t in range(sp)
            ]
        )  # (sp, S, Bt)
        fjr = lambda xr, u_: jac_core(params_t, xr, u_)
        x_end, Jx, Ju_cols = segment_rollout_with_jac_rows(
            fjr, x0_rows, us_seg, dt, angle
        )
        defect = [
            wrap(i, x_end[i] - xs[i][1:]) for i in range(sd)
        ]  # (S, Bt)
        pin = [wrap(i, _at(xs[i], 0) - xc[i]) for i in range(sd)]  # (Bt,)

        def jx_at(i, j, s):
            return _row(Jx[i][j], s, (Bt,), dtype)

        def ju_at(t, i, s):
            return _row(Ju_cols[t][i], s, (Bt,), dtype)

        if _stop_after == 1:  # after segment linearization
            return _dbg(*(list(defect) + list(pin)))

        # Forward condensation dx_s = M_s du + m_s.
        # No .at[].set (Mosaic has no scatter lowering) and no
        # concat-of-slices splice either: a sublane concatenate of slices
        # of the SAME computed (K, Bt) array crashes the Mosaic compiler
        # outright (``Check failed: limits[i] <= dim(i)`` SIGABRT,
        # minimal repro in scripts/probe_fused_bisect.py's history,
        # 2026-08-20). The segment's Ju block is spliced in with one-hot
        # row masks instead — value-identical, dense (K, Bt) VPU ops.
        row_ids = jax.lax.broadcasted_iota(jnp.int32, (K, Bt), 0)
        M = [jnp.zeros((K, Bt), dtype) for _ in range(sd)]
        m = [-pin[i] for i in range(sd)]
        for s in range(S):
            M = [
                _fold_sum(
                    [(jx_at(i, j, s), M[j]) for j in range(sd)], M[i]
                )
                for i in range(sd)
            ]
            in_seg = (row_ids >= s * sp) & (row_ids < (s + 1) * sp)
            for i in range(sd):
                blk = _fold_sum(
                    [
                        (
                            1.0,
                            jnp.where(
                                row_ids == s * sp + t,
                                jnp.broadcast_to(
                                    jnp.asarray(ju_at(t, i, s), dtype),
                                    (Bt,),
                                )[None, :],
                                jnp.zeros((), dtype),
                            ),
                        )
                        for t in range(sp)
                    ],
                    M[i],
                )
                M[i] = jnp.where(in_seg, blk, M[i])
            m = [
                _fold_sum(
                    [(jx_at(i, j, s), m[j]) for j in range(sd)], m[i]
                )
                + _at(defect[i], s)
                for i in range(sd)
            ]

        if _stop_after == 21:  # after the M/m condensation loop alone
            return _dbg(*(M + m))

        xs_last = [_at(xs[i], N - 1) for i in range(sd)]
        r_term, r_u = cost_rows(xs_last, u, up)
        if _stop_after == 22:  # after the cost residual rows
            return _dbg(r_u, *(xs_last + r_term))
        term_J = [w_costs[t] * M[term_costs[t].coord] for t in range(n_tc)]
        term_aff = [w_costs[t] * m[term_costs[t].coord] for t in range(n_tc)]
        r_bar_term = [r_term[t] + term_aff[t] for t in range(n_tc)]
        U_costs = [M[ts.coord] for ts in term_costs]
        b_costs = [r_bar_term[t] / w_costs[t] for t in range(n_tc)]

        g_s = dot(JuTm, r_u)  # (K, Bt)

        c_term = eq_rows(xs_last)
        A_eq = [M[ts.coord] for ts in term_eqs]
        c_bar = [c_term[j] + m[term_eqs[j].coord] for j in range(n_t)]

        A_all = U_costs + A_eq  # n_all entries of (K, Bt)
        b_all = b_costs + c_bar  # n_all entries of (Bt,)

        if _stop_after == 2:  # after condensation + residual rows
            return _dbg(*(M + m + A_all + b_all + [g_s]))

        d_inv = 1.0 / (eigs + lam[None, :])  # (K, Bt)

        # Spectral solves, all rhs in one pair of static matmuls.
        Xcat = jnp.concatenate(A_all + [g_s], axis=1)  # (K, (n_all+1)Bt)
        Ycat = dot(QT, Xcat)
        Dcat = jnp.concatenate([d_inv] * (n_all + 1), axis=1)
        sol = dot(Q, Ycat * Dcat)
        CiA = [sol[:, r * Bt:(r + 1) * Bt] for r in range(n_all)]
        Cig = sol[:, n_all * Bt:]

        if n_all:
            G = dot(
                Q, Ycat[:, : n_all * Bt] * jnp.sqrt(Dcat[:, : n_all * Bt])
            )  # C^{-1/2} A, columns blocked per row
            cols = []
            for j in range(n_all):
                # sqrt(D) e_j tail row, built from scalar literals (array
                # constants cannot be captured by a pallas kernel; .at[]
                # would lower to an unsupported scatter).
                tail = jnp.stack(
                    [
                        jnp.full((Bt,), sqrtD_scalars[j], dtype)
                        if r == j else jnp.zeros((Bt,), dtype)
                        for r in range(n_all)
                    ]
                )
                cols.append(
                    jnp.concatenate([G[:, j * Bt:(j + 1) * Bt], tail], axis=0)
                )
            # Column-LIST form: never stack T — Mosaic miscompiles the
            # stack-then-slice round trip (see _mgs_qr).
            schur_solve = _qr_gram_factor(cols)
            # schur_solve gets LISTS of rows (int indexing of stacked
            # arrays inside the tri solves would hit dynamic_slice).
            mu_v = schur_solve(
                [
                    b_all[r] - jnp.sum(A_all[r] * Cig, axis=0)
                    for r in range(n_all)
                ]
            )  # (n_all, Bt)
            mu_rows = [_at(mu_v, r) for r in range(n_all)]
            du = -(
                Cig
                + _fold_sum(
                    [(1.0, CiA[r] * mu_rows[r][None, :])
                     for r in range(n_all)],
                    Cig,
                )
            )
            # One refinement step on the augmented system.
            At_mu = _fold_sum(
                [(1.0, A_all[r] * mu_rows[r][None, :]) for r in range(n_all)],
                Cig,
            )
            c_mul_du = dot(Q, dot(QT, du) * (eigs + lam[None, :]))
            res_d = -g_s - (c_mul_du + At_mu)
            res_c = [
                -b_all[r]
                - (jnp.sum(A_all[r] * du, axis=0) - D_diag[r] * mu_rows[r])
                for r in range(n_all)
            ]
            Ci_rd = dot(Q, dot(QT, res_d) * d_inv)
            e_y = schur_solve(
                [
                    jnp.sum(A_all[r] * Ci_rd, axis=0) - res_c[r]
                    for r in range(n_all)
                ]
            )
            e_rows = [_at(e_y, r) for r in range(n_all)]
            du = du + Ci_rd - _fold_sum(
                [(1.0, CiA[r] * e_rows[r][None, :]) for r in range(n_all)],
                Cig,
            )
            mu_v = mu_v + e_y
            mu_rows = [mu_rows[r] + e_rows[r] for r in range(n_all)]
        else:
            mu_v = jnp.zeros((0, Bt), dtype)
            mu_rows = []
            du = -Cig
        mu_c = mu_rows[:n_tc]
        nu = mu_rows[n_tc:]

        if _stop_after == 3:  # after the spectral/Schur KKT solve
            return _dbg(du, *mu_rows)

        # State-step expansion by the forward recursion.
        dx = [-pin[i] for i in range(sd)]
        dxs_rows = [list(dx)]
        for s in range(S):
            dx = [
                _fold_sum(
                    [(jx_at(i, j, s), dx[j]) for j in range(sd)]
                    + [(ju_at(t, i, s), _at(du, s * sp + t))
                       for t in range(sp)],
                    dx[i],
                )
                + _at(defect[i], s)
                for i in range(sd)
            ]
            dxs_rows.append(list(dx))
        dxs = [
            jnp.stack([dxs_rows[n][i] for n in range(N)]) for i in range(sd)
        ]  # per-coord (N, Bt)

        # Exact directional derivative (J^T r) . dz.
        Jdu_term = [jnp.sum(term_J[t] * du, axis=0) for t in range(n_tc)]
        Jdu_u = dot(Jucm, du)  # (n_u, Bt)
        jr_dz = _fold_sum(
            [(1.0, r_term[t] * (Jdu_term[t] + term_aff[t]))
             for t in range(n_tc)],
            lam,
        ) + jnp.sum(r_u * Jdu_u, axis=0)

        # Post-step multiplier estimates for the merit ramp.
        gN = [jnp.zeros((Bt,), dtype) for _ in range(sd)]
        for t in range(n_tc):
            gN[term_costs[t].coord] = gN[term_costs[t].coord] + mu_c[t]
        for j in range(n_t):
            gN[term_eqs[j].coord] = gN[term_eqs[j].coord] + nu[j]
        pi = list(gN)
        pi_max = jnp.zeros((Bt,), dtype)
        for s in reversed(range(S)):
            mags = jnp.abs(pi[0])
            for i in range(1, sd):
                mags = jnp.maximum(mags, jnp.abs(pi[i]))
            pi_max = jnp.maximum(pi_max, mags)
            pi = [
                _fold_sum(
                    [(jx_at(i, j, s), pi[i]) for i in range(sd)], pi[j]
                )
                for j in range(sd)
            ]
        sigma_inf = jnp.abs(pi[0])
        for i in range(1, sd):
            sigma_inf = jnp.maximum(sigma_inf, jnp.abs(pi[i]))
        if n_t:
            nu_abs = jnp.abs(nu[0])
            for j in range(1, n_t):
                nu_abs = jnp.maximum(nu_abs, jnp.abs(nu[j]))
        else:
            nu_abs = jnp.zeros((Bt,), dtype)
        nu_inf = jnp.maximum(nu_abs, jnp.maximum(pi_max, sigma_inf))

        # Unified first-order diagnostic (pre-step residual multipliers).
        gN_pre = [jnp.zeros((Bt,), dtype) for _ in range(sd)]
        for t in range(n_tc):
            c = term_costs[t].coord
            gN_pre[c] = gN_pre[c] + w_costs[t] * r_term[t]
        for j in range(n_t):
            c = term_eqs[j].coord
            gN_pre[c] = gN_pre[c] + nu[j]
        pi = list(gN_pre)
        gu_rows = [None] * K
        for s in reversed(range(S)):
            for t in range(sp):
                gu_rows[s * sp + t] = _fold_sum(
                    [(ju_at(t, i, s), pi[i]) for i in range(sd)], pi[0]
                )
            pi = [
                _fold_sum(
                    [(jx_at(i, j, s), pi[i]) for i in range(sd)], pi[j]
                )
                for j in range(sd)
            ]
        g_u_full = g_s + jnp.stack(gu_rows)
        first_order = jnp.max(jnp.abs(g_u_full), axis=0)

        qp_ok = jnp.all(jnp.isfinite(du), axis=0)
        for i in range(sd):
            qp_ok = qp_ok & jnp.all(jnp.isfinite(dxs[i]), axis=0)
        if n_all:
            qp_ok = qp_ok & jnp.all(jnp.isfinite(mu_v), axis=0)

        if _stop_after == 4:  # after expansion + diagnostics
            return _dbg(*(dxs + [first_order, nu_inf,
                                 qp_ok.astype(dtype)]))

        # ================================================ merit + trials
        cost = 0.5 * (
            _fold_sum([(1.0, r_term[t] ** 2) for t in range(n_tc)], lam)
            + jnp.sum(r_u * r_u, axis=0)
        )
        viol1 = jnp.zeros((Bt,), dtype)
        for i in range(sd):
            viol1 = viol1 + jnp.sum(jnp.abs(defect[i]), axis=0)
            viol1 = viol1 + jnp.abs(pin[i])
        for j in range(n_t):
            viol1 = viol1 + jnp.abs(c_term[j])

        # Zero the step where the QP failed (fail_qp is terminal).
        du = jnp.where(qp_ok[None, :], du, jnp.zeros_like(du))
        dxs = [
            jnp.where(qp_ok[None, :], dxs[i], jnp.zeros_like(dxs[i]))
            for i in range(sd)
        ]

        mu_new = jnp.maximum(
            mu_pen, config.penalty_multiplier_margin * nu_inf
        )
        phi0 = cost + mu_new * viol1
        dphi = jr_dz - mu_new * viol1

        # Folded line search: all trials as a leading axis.
        xs_tr = []  # per-coord (n_ls, N, Bt)
        u_tr = []  # per-trial (K, Bt)
        for a in alphas:
            ua = jnp.clip(u + a * du, -u_limit, u_limit)
            u_tr.append(ua)
            rows = []
            for i in range(sd):
                v = xs[i] + a * dxs[i]  # (N, Bt)
                v = wrap(i, v)
                if i == 0:
                    v = jnp.clip(v, -b_x_limit, b_x_limit)
                rows.append(v)
            xs_tr.append(rows)
        x0_tr = tuple(
            jnp.stack([xs_tr[t][i][:-1] for t in range(n_ls)])
            for i in range(sd)
        )  # (n_ls, S, Bt)
        us_tr = [
            jnp.stack(
                [
                    jnp.stack(
                        [_at(u_tr[a], s * sp + t) for s in range(S)]
                    )
                    for a in range(n_ls)
                ]
            )
            for t in range(sp)
        ]  # sp entries of (n_ls, S, Bt)
        fr = lambda xr, u_: dyn_core(params_t, xr, u_)
        x = x0_tr
        for t in range(sp):
            x = rk4_step_rows(fr, x, us_tr[t], dt)
            x = tuple(wrap(i, x[i]) for i in range(sd))
        cost_a = jnp.zeros((n_ls, Bt), dtype)
        viol_a = jnp.zeros((n_ls, Bt), dtype)
        for i in range(sd):
            d_tr = wrap(
                i,
                x[i]
                - jnp.stack([xs_tr[t][i][1:] for t in range(n_ls)]),
            )  # (n_ls, S, Bt)
            viol_a = viol_a + jnp.sum(jnp.abs(d_tr), axis=1)
            pin_tr = wrap(
                i,
                jnp.stack([_at(xs_tr[t][i], 0) for t in range(n_ls)])
                - xc[i][None, :],
            )
            viol_a = viol_a + jnp.abs(pin_tr)
        last_tr = [
            jnp.stack([_at(xs_tr[t][i], N - 1) for t in range(n_ls)])
            for i in range(sd)
        ]
        rt_tr, ru_tr = cost_rows(
            last_tr,
            jnp.stack(u_tr, axis=1),  # (K, n_ls, Bt)
            up[None, :],
        )
        for t in range(n_tc):
            cost_a = cost_a + 0.5 * rt_tr[t] ** 2
        cost_a = cost_a + 0.5 * jnp.sum(ru_tr * ru_tr, axis=0)
        for ce in eq_rows(last_tr):
            viol_a = viol_a + jnp.abs(ce)

        phi_tr = cost_a + mu_new[None, :] * viol_a
        phi_tr = jnp.where(jnp.isfinite(phi_tr), phi_tr, jnp.inf)
        slack = config.merit_slack_ulps * eps * jnp.abs(phi0)
        if _stop_after == 5:  # after the folded trial rollouts
            return _dbg(phi_tr, phi0, dphi)

        alpha_used = jnp.zeros((Bt,), dtype)
        phi_sel = jnp.zeros((Bt,), dtype)
        found = jnp.zeros((Bt,), bool)
        for t, a in enumerate(alphas):
            phi_t = _at(phi_tr, t)
            acc_t = phi_t <= phi0 + config.armijo_c1 * (a * dphi) + slack
            take = acc_t & ~found
            alpha_used = jnp.where(take, jnp.asarray(a, dtype), alpha_used)
            phi_sel = jnp.where(take, phi_t, phi_sel)
            found = found | acc_t
        any_accept = found & qp_ok
        alpha_used = jnp.where(any_accept, alpha_used, jnp.zeros_like(alpha_used))
        phi_new = jnp.where(any_accept, phi_sel, phi0)

        # Accepted iterate: re-retract at the accepted alpha.
        u_acc = jnp.clip(u + alpha_used[None, :] * du, -u_limit, u_limit)
        xs_acc = []
        for i in range(sd):
            v = xs[i] + alpha_used[None, :] * dxs[i]
            v = wrap(i, v)
            if i == 0:
                v = jnp.clip(v, -b_x_limit, b_x_limit)
            xs_acc.append(v)

        lam_next = jnp.where(
            any_accept,
            lam * config.lambda_decrease,
            jnp.maximum(
                lam * config.lambda_increase, config.lambda_failure_floor
            ),
        )
        u_next = jnp.where(any_accept[None, :], u_acc, u)
        xs_next = [
            jnp.where(any_accept[None, :], xs_acc[i], xs[i])
            for i in range(sd)
        ]

        prev_ok = jnp.isfinite(merit_prev)
        mp = jnp.where(prev_ok, merit_prev, jnp.zeros((), dtype))
        rel_change = jnp.where(
            prev_ok,
            jnp.abs(mp - phi_new)
            / jnp.maximum(jnp.abs(mp), jnp.asarray(1.0e-30, dtype)),
            jnp.asarray(jnp.inf, dtype),
        )
        conv_rel = any_accept & (rel_change < config.relative_exit_tol)
        conv_first = first_order < config.absolute_first_derivative_tol
        fail_lambda = lam_next > config.lambda_max
        fail_qp = ~qp_ok

        from ..ops.solver import NLSTerminationState

        new_term = jnp.where(
            conv_first,
            NLSTerminationState.SATISFIED_FIRST_ORDER_TOL,
            jnp.where(
                conv_rel,
                NLSTerminationState.SATISFIED_RELATIVE_TOL,
                jnp.where(
                    fail_qp,
                    NLSTerminationState.QP_INDEFINITE,
                    jnp.where(
                        fail_lambda,
                        NLSTerminationState.MAX_LAMBDA,
                        NLSTerminationState.MAX_ITERATIONS,
                    ),
                ),
            ),
        ).astype(jnp.int32)
        now_done = conv_rel | conv_first | fail_lambda | fail_qp

        xs_out = jnp.stack(
            [jnp.where(done[None, :], xs[i], xs_next[i]) for i in range(sd)]
        )  # (sd, N, Bt)
        u_out = jnp.where(done[None, :], u, u_next)
        lam_out = jnp.where(done, lam, lam_next)
        mu_out = jnp.where(done, mu_pen, mu_new)
        merit_out = jnp.where(done, merit_prev, phi_new)
        term_out = jnp.where(done, term, new_term)
        fo_out = jnp.where(done, fo_carry, first_order)
        done_out = done | now_done

        nan = jnp.asarray(jnp.nan, dtype)
        violmax = jnp.zeros((Bt,), dtype)
        for i in range(sd):
            violmax = jnp.maximum(
                violmax, jnp.max(jnp.abs(defect[i]), axis=0)
            )
            violmax = jnp.maximum(violmax, jnp.abs(pin[i]))
        for j in range(n_t):
            violmax = jnp.maximum(violmax, jnp.abs(c_term[j]))

        return (
            xs_out, u_out, lam_out, mu_out, merit_out,
            done_out.astype(jnp.int32), term_out, fo_out,
            jnp.where(done, nan, cost),
            jnp.where(done, nan, violmax),
            jnp.where(done, nan, lam),
            jnp.where(done, jnp.zeros((), dtype), alpha_used),
            jnp.where(done, nan, first_order),
            (~done).astype(jnp.int32),
        )

    # -------------------------------------------------------------- kernel
    n_iter = int(config.max_iterations)

    def kernel(params_ref, QT_ref, Q_ref, eigs_ref, JuT_ref, Juc_ref,
               xc_ref, spt_ref, up_ref,
               xs_ref, u_ref, lam_ref, mu_ref, merit_ref, done_ref,
               term_ref, fo_ref,
               xs_o, u_o, lam_o, mu_o, merit_o, done_o, term_o, fo_o,
               tc_o, tv_o, tl_o, ta_o, tf_o, tap_o):
        # 1-D (B,)-batched operands ride as (1, B) with (1, Bt) blocks:
        # XLA picks a T(1024) 1-D tiling for f32[4096] that Mosaic
        # rejects against any other block size ("XLA layout does not
        # match Mosaic layout", measured 2026-08-20); 2-D rows tile as
        # (8, 128) and decouple the block from B.
        if single_launch:
            # Grid (B/Bt, n_iter): the carry-block index maps ignore the
            # minor (iteration) dim, so each carry block is initialized
            # from the inputs at it == 0, stays resident in VMEM for all
            # n_iter steps, and is flushed to HBM once per batch tile.
            it = pl.program_id(1)

            @pl.when(it == 0)
            def _init():
                xs_o[...] = xs_ref[...]
                u_o[...] = u_ref[...]
                for dst, src in (
                    (lam_o, lam_ref), (mu_o, mu_ref), (merit_o, merit_ref),
                    (done_o, done_ref), (term_o, term_ref), (fo_o, fo_ref),
                ):
                    dst[...] = src[...]

            xs_in, u_in = xs_o, u_o
            lam_in, mu_in, merit_in = lam_o, mu_o, merit_o
            done_in, term_in, fo_in = done_o, term_o, fo_o
        else:
            xs_in, u_in = xs_ref, u_ref
            lam_in, mu_in, merit_in = lam_ref, mu_ref, merit_ref
            done_in, term_in, fo_in = done_ref, term_ref, fo_ref
        outs = body(
            jax.tree.unflatten(
                treedef,
                # Batched: per-leaf (Bt,) rows of the VMEM block;
                # scalar: SMEM scalars (in-kernel constant folding).
                [params_ref[i, :] for i in range(n_p)] if batched_params
                else [params_ref[0, i] for i in range(n_p)],
            ),
            [xc_ref[i, :] for i in range(sd)],  # per-coord (Bt,)
            spt_ref[0, :], up_ref[0, :],
            [xs_in[i, :, :] for i in range(sd)],  # per-coord (N, Bt)
            u_in[...], lam_in[0, :], mu_in[0, :], merit_in[0, :],
            done_in[0, :] != 0, term_in[0, :], fo_in[0, :],
            QT_ref[...], Q_ref[...], eigs_ref[...],
            JuT_ref[...], Juc_ref[...],
        )
        xs_o[...] = outs[0]
        u_o[...] = outs[1]
        for ref, val in zip(
            (lam_o, mu_o, merit_o, done_o, term_o, fo_o), outs[2:8]
        ):
            ref[0, :] = val
        for ref, val in zip((tc_o, tv_o, tl_o, ta_o, tf_o, tap_o), outs[8:]):
            if single_launch:
                ref[0, 0, :] = val  # iteration rides the block index
            else:
                ref[0, :] = val

    # ------------------------------------------------------ pallas plumbing
    # All index maps take (g, [it]) — g is the batch-tile id; the
    # iteration id of the single-launch grid is ignored by everything but
    # the trace outputs.
    def rep(shape):
        nz = len(shape)
        return pl.BlockSpec(
            shape, (lambda *_: (0,) * nz), memory_space=pltpu.VMEM
        )

    def batched(shape_prefix):
        shape = shape_prefix + (Bt,)
        nz = len(shape_prefix)

        def idx(g, *_):
            return (0,) * nz + (g,)

        return pl.BlockSpec(shape, idx, memory_space=pltpu.VMEM)

    def row():
        # (B,)-batched scalars as (1, B) arrays with (1, Bt) blocks —
        # see the layout note in ``kernel``.
        return pl.BlockSpec(
            (1, Bt), (lambda g, *_: (0, g)), memory_space=pltpu.VMEM
        )

    def trace_spec():
        # (n_iter, 1, B) outputs; the iteration grid id selects the row.
        return pl.BlockSpec(
            (1, 1, Bt), (lambda g, it: (it, 0, g)),
            memory_space=pltpu.VMEM,
        )

    in_specs = [
        batched((n_p,)) if batched_params else
        pl.BlockSpec((1, n_p), (lambda *_: (0, 0)), memory_space=pltpu.SMEM),
        rep((K, K)), rep((K, K)), rep((K, 1)),
        rep((K, n_u)), rep((n_u, K)),
        batched((sd,)), row(), row(),
        batched((sd, N)), batched((K,)),
        row(), row(), row(),
        row(), row(), row(),
    ]
    f = dtype

    def rshape(dt=f):
        return jax.ShapeDtypeStruct((1, B), dt)

    carry_shape = [
        jax.ShapeDtypeStruct((sd, N, B), f),
        jax.ShapeDtypeStruct((K, B), f),
        rshape(), rshape(), rshape(),
        rshape(jnp.int32), rshape(jnp.int32), rshape(),
    ]
    carry_specs = [
        batched((sd, N)), batched((K,)),
        row(), row(), row(), row(), row(), row(),
    ]
    if single_launch:
        grid = (B // Bt, n_iter)
        trace_dts = (f, f, f, f, f, jnp.int32)
        out_shape = carry_shape + [
            jax.ShapeDtypeStruct((n_iter, 1, B), dt) for dt in trace_dts
        ]
        out_specs = carry_specs + [trace_spec()] * 6
    else:
        out_shape = carry_shape + [
            rshape(), rshape(), rshape(), rshape(), rshape(),
            rshape(jnp.int32),
        ]
        out_specs = carry_specs + [row()] * 6
    if emulate:
        # Manual application of the SAME grid/BlockSpec tiling (batched
        # index maps slice the trailing batch axis in Bt blocks;
        # replicated statics pass through whole), calling the same tile
        # ``body`` — plain jnp, no pallas_call. In single-launch mode the
        # tile carry loops through n_iter body applications before the
        # next tile, mirroring the (B/Bt, n_iter) grid order.
        def call(params_a, QT_a, Q_a, eigs_a, JuT_a, Juc_a,
                 xc_a, spt_a, up_a, xs_a, u_a, lam_a, mu_a,
                 merit_a, done_a, term_a, fo_a):
            tiles = []
            for g in range(B // Bt):
                sl = slice(g * Bt, (g + 1) * Bt)
                params_t = jax.tree.unflatten(
                    treedef,
                    [params_a[i, sl] for i in range(n_p)]
                    if batched_params
                    else [params_a[0, i] for i in range(n_p)],
                )
                args_t = (
                    [xc_a[i, sl] for i in range(sd)],
                    spt_a[sl], up_a[sl],
                )
                statics_t = (QT_a, Q_a, eigs_a, JuT_a, Juc_a)
                carry_t = (
                    [xs_a[i, :, sl] for i in range(sd)],
                    u_a[:, sl], lam_a[sl], mu_a[sl], merit_a[sl],
                    done_a[sl] != 0, term_a[sl], fo_a[sl],
                )
                if single_launch:
                    rows = []
                    for _ in range(n_iter):
                        outs = body(params_t, *args_t,
                                    *carry_t, *statics_t)
                        carry_t = (
                            [outs[0][i] for i in range(sd)], outs[1],
                            outs[2], outs[3], outs[4], outs[5] != 0,
                            outs[6], outs[7],
                        )
                        rows.append(outs[8:])
                    traces_t = tuple(
                        jnp.stack([r[k] for r in rows])
                        for k in range(6)
                    )  # each (n_iter, Bt)
                    tiles.append(
                        (outs[0], outs[1]) + tuple(outs[2:8]) + traces_t
                    )
                else:
                    tiles.append(body(params_t, *args_t,
                                      *carry_t, *statics_t))
            return tuple(
                jnp.concatenate([t[k] for t in tiles], axis=-1)
                if len(tiles) > 1 else tiles[0][k]
                for k in range(14)
            )
    else:
        pallas_fn = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=out_shape,
            interpret=interpret,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=vmem_limit_bytes,
                dimension_semantics=(
                    ("arbitrary", "arbitrary") if single_launch else None
                ),
            ),
        )

        def call(params_a, QT_a, Q_a, eigs_a, JuT_a, Juc_a,
                 xc_a, spt_a, up_a, xs_a, u_a, lam_a, mu_a,
                 merit_a, done_a, term_a, fo_a):
            outs = pallas_fn(
                params_a, QT_a, Q_a, eigs_a, JuT_a, Juc_a,
                xc_a, spt_a[None], up_a[None], xs_a, u_a,
                lam_a[None], mu_a[None], merit_a[None],
                done_a[None], term_a[None], fo_a[None],
            )
            carry = outs[:2] + tuple(o[0] for o in outs[2:8])
            if single_launch:
                traces = tuple(o[:, 0, :] for o in outs[8:])
            else:
                traces = tuple(o[0] for o in outs[8:])
            return carry + traces

    xc_arr = problem.x_current
    spt_arr = problem.set_point
    up_arr = problem.u_prev

    def run_call(Z, lam, mu_pen, merit_prev, done, term, fo_carry):
        return call(
            params_vec, QTm, Qm, eigs2, JuT, Juc,
            xc_arr, spt_arr, up_arr,
            Z.xs, Z.u, lam, mu_pen, merit_prev,
            done.astype(jnp.int32), term, fo_carry,
        )

    if single_launch:
        def solve(carry0):
            """(carry0) -> (carryN, traces): the whole fixed-trip solve
            in one launch; trace arrays are (n_iter, B), matching the
            stacked outputs of the scan over ``iteration``."""
            (xs2, u2, lam2, mu2, merit2, done2, term2, fo2,
             tcost, tviol, tlam, talpha, tfirst, tap) = run_call(*carry0)
            carry = (
                _Z(xs=xs2, u=u2), lam2, mu2, merit2, done2 != 0, term2, fo2
            )
            return carry, (tcost, tviol, tlam, talpha, tfirst, tap != 0)

        return solve

    def iteration(carry, _):
        (xs2, u2, lam2, mu2, merit2, done2, term2, fo2,
         tcost, tviol, tlam, talpha, tfirst, tap) = run_call(*carry)
        carry2 = (
            _Z(xs=xs2, u=u2), lam2, mu2, merit2, done2 != 0, term2, fo2
        )
        trace = (tcost, tviol, tlam, talpha, tfirst, tap != 0)
        return carry2, trace

    return iteration
