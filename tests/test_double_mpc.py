"""Double-pendulum MPC tests — capability beyond the reference.

The reference derives a double-pole model (``symbolic/dynamics_double.py``,
marked WIP) but never wires it into the controller (hard-coded
``state_dim = 4`` with a generalization TODO, ``optimization.cc:197-198``).
Here the whole stack is model-generic, so the 6-state double pole gets the
full MPC treatment: stabilization near upright and a full swing-up.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cartpole_tpu import (
    DOUBLE_CARTPOLE,
    OptimizationParams,
    default_double_params,
    make_mpc,
    run_closed_loop,
)
from cartpole_tpu.ops.solver import NLSTerminationState

UP = np.pi / 2


def _no_failures(term):
    term = np.asarray(term)
    assert not np.any(term == NLSTerminationState.QP_INDEFINITE)
    assert not np.any(term == NLSTerminationState.MAX_LAMBDA)


class TestDoubleMPC:
    def test_problem_dimensions(self):
        params = OptimizationParams(state_spacing=5)
        mpc = make_mpc(params, DOUBLE_CARTPOLE)
        # 9 shooting states x 6 + 40 controls.
        assert mpc.spec.dim == 9 * 6 + 40
        assert mpc.spec.n_defect == 8 * 6
        # Initial pin (6) + three terminal equalities (th1, th2 via the
        # shared negative th weight, b_x_dot, th1_dot, th2_dot).
        assert mpc.spec.n_eq == mpc.spec.n_defect + 6 + 5

    def test_receding_horizon_solves_converge(self):
        """A cold solve can't close a double-pole window in 10 GN
        iterations; in the receding-horizon regime warm starts converge
        the solves — late windows close to <=1e-6 and the predicted
        terminal state satisfies the terminal equalities. Window 60: the
        default 0.4 s window leaves this perturbation on the edge of the
        region of attraction (convergence then depends on rounding luck)."""
        params = OptimizationParams(
            max_iterations=10, state_spacing=5, window_length=60
        )
        mpc = make_mpc(params, DOUBLE_CARTPOLE)
        dp = default_double_params(jnp.float64)
        x0 = jnp.array([0.0, UP + 0.1, UP - 0.05, 0.0, 0.0, 0.0])
        res = jax.jit(lambda x: run_closed_loop(mpc, x, dp, 250))(x0)
        viol = np.asarray(res.constraint_violations)
        assert viol[200:].max() < 1e-6
        xT = np.asarray(res.terminal_predictions[-1])
        assert abs(xT[1] - UP) < 1e-4 and abs(xT[2] - UP) < 1e-4
        assert abs(xT[3]) < 1e-4 and abs(xT[4]) < 1e-4 and abs(xT[5]) < 1e-4

    def test_stabilization_closed_loop(self):
        """Recover from a perturbation near upright."""
        params = OptimizationParams(
            max_iterations=10, state_spacing=5, window_length=60
        )
        mpc = make_mpc(params, DOUBLE_CARTPOLE)
        dp = default_double_params(jnp.float64)
        x0 = jnp.array([0.0, UP + 0.15, UP - 0.1, 0.0, 0.0, 0.0])
        res = jax.jit(lambda x: run_closed_loop(mpc, x, dp, 200))(x0)
        _no_failures(res.termination_states)
        xf = np.asarray(res.final_state)
        assert abs(xf[1] - UP) < 1e-3
        assert abs(xf[2] - UP) < 1e-3
        assert abs(xf[4]) < 1e-2 and abs(xf[5]) < 1e-2

    def test_batched_stabilization_respects_control_bounds(self):
        """Batched double-pole MPC with control bounds (the BASELINE
        'double-pendulum batched MPC with control bounds' config): the
        retraction clamp bounds every control and all scenarios stabilize.
        (A tightly binding limit on the double pole is genuinely
        infeasible — any sustained saturation drops the pole — so the
        binding-saturation case is covered on the single model in
        tests/test_control_bounds.py.)"""
        params = OptimizationParams(
            max_iterations=10, state_spacing=5, window_length=60,
        )
        mpc = make_mpc(params, DOUBLE_CARTPOLE)
        dp = default_double_params(jnp.float64)
        n = 4
        rng = np.random.RandomState(0)
        x0s = np.tile(
            np.array([0.0, UP, UP, 0.0, 0.0, 0.0]), (n, 1)
        )
        x0s[:, 1] += rng.uniform(-0.08, 0.08, n)
        x0s[:, 2] += rng.uniform(-0.08, 0.08, n)
        run = jax.jit(
            jax.vmap(lambda x: run_closed_loop(mpc, x, dp, 200))
        )
        res = run(jnp.asarray(x0s))
        u = np.asarray(res.controls)
        assert np.all(np.abs(u) <= 300.0 + 1e-12)
        xf = np.asarray(res.final_state)
        assert np.all(np.abs(xf[:, 1] - UP) < 1e-2)
        assert np.all(np.abs(xf[:, 2] - UP) < 1e-2)
        _no_failures(res.termination_states)

    @pytest.mark.slow
    def test_swingup_closed_loop(self):
        """Full double-pole swing-up from hanging — the capability the
        reference's TODO points at (longer window, higher force limit)."""
        params = OptimizationParams(
            max_iterations=10,
            state_spacing=5,
            window_length=60,
            u_limit=600.0,
        )
        mpc = make_mpc(params, DOUBLE_CARTPOLE)
        dp = default_double_params(jnp.float64)
        x0 = jnp.array([0.0, -UP, -UP, 0.0, 0.0, 0.0])
        res = jax.jit(lambda x: run_closed_loop(mpc, x, dp, 300))(x0)
        _no_failures(res.termination_states)
        xf = np.asarray(res.final_state)
        assert abs(xf[1] - UP) < 5e-3
        assert abs(xf[2] - UP) < 5e-3
        assert abs(xf[3]) < 5e-2 and abs(xf[4]) < 5e-2 and abs(xf[5]) < 5e-2
