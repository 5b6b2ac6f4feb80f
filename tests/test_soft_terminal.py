"""Soft-terminal-cost (positive-weight) mode in f32 — regression tests.

The reference exposes terminal objectives as either quadratic costs or
hard equality constraints, switched per-coordinate by the weight sign
(``/root/reference/optimization/optimization.hpp:43-48``,
``optimization.cc:236-267``; the web UI's cost<->constraint checkboxes,
``viz/src/application.ts:279-342``). Round 2 found the soft-cost mode
produced garbage steps on the deployment dtype (f32): folding w=150
terminal rows into the condensed normal equations squares the weights
into the factorized matrix (cond ~ w^2 ||M_N||^2 / u_cost_weight^2 ~
1e7+), and the all-soft branch had no refinement step. Measured: 0/16
near-upright double-pole instances stabilized in f32 (16/16 in f64).

The fix is the augmented-KKT formulation in
``mpc/problem.py::make_condensed_step`` and ``mpc/lanes.py``: terminal
cost rows are eliminated through the same tiny Schur complement as the
equality rows, with 1/w^2 on its diagonal — weights never enter a
factorized matrix. These tests pin (a) step-level f32/f64 agreement on
an all-soft problem, (b) the end-to-end f32 double-pole
disturbance-rejection loop that failed before the fix.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np

from cartpole_tpu import (
    DOUBLE_CARTPOLE,
    OptimizationParams,
    default_double_params,
    make_mpc,
)
from cartpole_tpu.mpc.controller import MPCState
from cartpole_tpu.mpc.lanes import run_closed_loop_lanes

UP = math.pi / 2

# The double-pole disturbance-rejection config (bench.py --model double):
# all-soft terminal objectives, no swing-up sinusoid kick.
_SOFT = dict(
    th_final_cost_weight=150.0,
    th_dot_final_cost_weight=10.0,
    b_x_dot_final_cost_weight=10.0,
    u_guess_sinusoid_amplitude=0.0,
)


def _near_upright_x0s(n, seed=0):
    """First ``n`` of the bench's perturbed-upright draw (bench.py)."""
    rng = np.random.RandomState(seed)
    x0s = np.tile(np.array([0.0, UP, UP, 0.0, 0.0, 0.0]), (4096, 1))
    x0s[:, 0] += rng.uniform(-0.3, 0.3, 4096)
    x0s[:, 1] += rng.uniform(-0.15, 0.15, 4096)
    x0s[:, 2] += rng.uniform(-0.1, 0.1, 4096)
    return x0s[:n]


class TestSoftTerminalF32:
    def test_linear_step_f32_matches_f64(self):
        """One all-soft condensed LINEAR step (fixed iterate, lam=0)
        agrees across dtypes to ~1e-3 of the step scale. Pre-fix the f32
        step was O(1)-wrong — weight-squared conditioning ~1e7 vs f32
        eps 6e-8. (A full 8-iteration solve is NOT compared: line-search
        and damping decisions make it chaotically precision-sensitive.)"""
        from cartpole_tpu.mpc.lanes import _LanesProblem, _Z

        mpc = make_mpc(
            OptimizationParams(
                state_spacing=5, window_length=60, kkt_method="condensed",
                **_SOFT,
            ),
            DOUBLE_CARTPOLE,
        )
        spec = mpc.spec
        B, sd, K, N = 4, spec.state_dim, spec.window_length, spec.num_states
        x0s = _near_upright_x0s(B)
        rng = np.random.RandomState(1)
        xs_np = np.repeat(x0s[None, :, :], N, axis=0).transpose(
            2, 0, 1
        ) + 0.01 * rng.randn(sd, N, B)
        u_np = 0.5 * rng.randn(K, B)
        dus = {}
        for dtype in (jnp.float32, jnp.float64):
            dp = default_double_params(dtype)
            prob = _LanesProblem(
                spec,
                jnp.asarray(x0s.T, dtype),
                jnp.zeros((B,), dtype),
                jnp.zeros((B,), dtype),
                dp,
            )
            Z = _Z(xs=jnp.asarray(xs_np, dtype), u=jnp.asarray(u_np, dtype))
            dZ, *_ = jax.jit(prob.condensed_step)(Z, jnp.zeros((B,), dtype))
            dus[np.dtype(dtype).name] = np.asarray(dZ.u, np.float64)
        scale = np.abs(dus["float64"]).max()
        err = np.abs(dus["float32"] - dus["float64"]).max() / scale
        assert err < 1e-3, f"relative du error {err:.2e}"

    def test_double_disturbance_rejection_f32(self):
        """8 perturbed-upright double poles, 250 ticks, f32, lanes path:
        every instance stays/returns upright with zero failed solves.
        Pre-fix: 0/8 upright (the f32 soft-cost defect)."""
        dtype = jnp.float32
        n, ticks, chunks = 8, 50, 5
        mpc = make_mpc(
            OptimizationParams(
                max_iterations=8, state_spacing=5, window_length=60,
                kkt_method="condensed", **_SOFT,
            ),
            DOUBLE_CARTPOLE,
        )
        dp = default_double_params(dtype)
        x = jnp.asarray(_near_upright_x0s(n), dtype)
        sps = jnp.zeros((n,), dtype)
        st = MPCState(
            previous_solution=jnp.zeros((n, mpc.spec.dim), dtype),
            warm=jnp.zeros((n,), bool),
        )
        run = jax.jit(
            lambda x_, s_, st_: run_closed_loop_lanes(
                mpc, x_, dp, ticks, s_, mpc_state=st_
            )
        )
        n_failed = 0
        for _ in range(chunks):
            res = run(x, sps, st)
            x, st = res.final_state, res.final_mpc_state
            t = np.asarray(res.termination_states)
            n_failed += int(np.sum((t == 3) | (t == 4)))
        th = np.asarray(x, np.float64)[:, 1:3]
        dev = np.abs(np.mod(th - UP + math.pi, 2 * math.pi) - math.pi)
        assert n_failed == 0
        assert np.all(dev < 0.1), f"angle deviations {dev.max(axis=1)}"
