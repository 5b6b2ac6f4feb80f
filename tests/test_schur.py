"""Augmented-Lagrangian Schur KKT path: parity with the LU path.

The TPU fast path (``NLSConfig.kkt_method="schur"``) replaces the
symmetric-indefinite LU factorization with two SPD Cholesky solves on the
equilibrated augmented system (see ops/solver.py) — ~3x faster on TPU where
XLA's batched LU underperforms. These tests pin its correctness against
the reference-parity LU path.
"""

import jax
import jax.numpy as jnp
import numpy as np

from cartpole_tpu import (
    OptimizationParams,
    default_single_params,
    make_mpc,
    run_closed_loop,
)
from cartpole_tpu.ops.solver import NLSTerminationState

DOWN = np.array([0.0, -np.pi / 2, 0.0, 0.0])


def _mpc(method):
    return make_mpc(
        OptimizationParams(
            max_iterations=10, state_spacing=5, kkt_method=method
        )
    )


class TestSchurParity:
    def test_single_solve_matches_lu(self):
        """The first GN step of a cold solve is the same linear system;
        both paths must produce (near-)identical iterates in f64."""
        dp = default_single_params(jnp.float64)
        x0 = jnp.asarray(DOWN)
        out_lu, _ = jax.jit(
            lambda s, x: _mpc("lu").step(s, x, dp)
        )(_mpc("lu").init_state(jnp.float64), x0)
        out_sc, _ = jax.jit(
            lambda s, x: _mpc("schur").step(s, x, dp)
        )(_mpc("schur").init_state(jnp.float64), x0)
        # Ten GN iterations amplify last-ulp differences through the line
        # search; the iterates stay within ~1e-3 N of each other.
        np.testing.assert_allclose(
            np.asarray(out_sc.u), np.asarray(out_lu.u), rtol=0, atol=5e-3
        )

    def test_closed_loop_meets_reference_thresholds(self):
        """Full 250-tick swing-up through the schur path passes the same
        gates as the LU path (optimization_test.cc thresholds)."""
        dp = default_single_params(jnp.float64)
        res = jax.jit(
            lambda x: run_closed_loop(_mpc("schur"), x, dp, 250)
        )(jnp.asarray(DOWN))
        term = np.asarray(res.termination_states)
        assert not np.any(
            (term == NLSTerminationState.QP_INDEFINITE)
            | (term == NLSTerminationState.MAX_LAMBDA)
        )
        xf = np.asarray(res.final_state)
        assert abs(xf[1] - np.pi / 2) < 1e-4
        assert abs(xf[2]) < 1e-4
        assert abs(xf[3]) < 1e-3
        tp = np.asarray(res.terminal_predictions)[21:]
        np.testing.assert_array_less(np.abs(tp[:, 1] - np.pi / 2), 1e-4)
        assert np.asarray(res.constraint_violations)[21:].max() < 1e-4

    def test_u_sequence_close_to_lu_path(self):
        dp = default_single_params(jnp.float64)
        run_lu = jax.jit(lambda x: run_closed_loop(_mpc("lu"), x, dp, 100))
        run_sc = jax.jit(lambda x: run_closed_loop(_mpc("schur"), x, dp, 100))
        u_lu = np.asarray(run_lu(jnp.asarray(DOWN)).controls)
        u_sc = np.asarray(run_sc(jnp.asarray(DOWN)).controls)
        # Iterates diverge slightly mid-swing (different rounding paths);
        # bounded drift, same trajectory.
        assert np.abs(u_lu - u_sc).max() < 5e-2
