"""f32 robustness regression: the round-1 bench ``n_failed`` defect.

On TPU f32 (and CPU f32 — same mechanism), 8 of 81,920 bench solves hit
QP_INDEFINITE: mid-swing-up iterates with fast-spinning trajectories
(theta_dot ~ -15 rad/s) produce segment-Jacobian chains whose Gram
matrices span ~1e30, where the old *absolute* 1e-12 jitter is relatively
meaningless; f32 cancellation then pushed a Cholesky pivot negative ->
sqrt -> NaN -> ``ok=False``. The reference's invariant is that the solver
NEVER terminates QP_INDEFINITE/MAX_LAMBDA
(``/root/reference/optimization/optimization_test.cc:44-46``).

The fix is the scale-relative ridge + pivot floor in
``mpc/problem.py::_tiny_spd_solve``. These tests pin (a) the exact
offending bench instances (seed 0 of ``bench.py``'s x0 draw), (b) the
tiny-solve robustness at the pathological scale directly.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np

from cartpole_tpu import OptimizationParams, default_single_params, make_mpc
from cartpole_tpu.mpc.lanes import run_closed_loop_lanes
from cartpole_tpu.mpc.problem import _tiny_spd_solve

# Instance indices (within bench.py's seed-0 draw of 4096 x0s) that
# failed in round 1's BENCH_r01.json run, and fail identically on CPU f32.
_FAILING_INSTANCES = [447, 547, 809, 951, 1005, 1285, 2127, 2939]


def _bench_x0s(n=4096, seed=0):
    rng = np.random.RandomState(seed)
    x0s = np.tile(np.array([0.0, -math.pi / 2, 0.0, 0.0]), (n, 1))
    x0s[:, 0] += rng.uniform(-0.5, 0.5, n)
    x0s[:, 1] += rng.uniform(-0.5, 0.5, n)
    return x0s


class TestF32FailingInstances:
    def test_no_failed_solves_on_offending_seeds(self):
        """The 8 bench instances run their first 20 ticks (the bench
        program) in f32 with zero QP_INDEFINITE/MAX_LAMBDA codes."""
        dtype = jnp.float32
        dp = default_single_params(dtype)
        x0 = jnp.asarray(_bench_x0s()[_FAILING_INSTANCES], dtype)
        sps = jnp.zeros((len(_FAILING_INSTANCES),), dtype)
        mpc = make_mpc(
            OptimizationParams(
                max_iterations=8, state_spacing=5, kkt_method="condensed"
            )
        )
        res = jax.jit(
            lambda x, s: run_closed_loop_lanes(mpc, x, dp, 20, s)
        )(x0, sps)
        term = np.asarray(res.termination_states)
        n_failed = int(np.sum((term == 3) | (term == 4)))
        assert n_failed == 0, f"{n_failed} failed solves: {term.tolist()}"
        # The loop must still be making progress (finite, plausible states).
        assert np.all(np.isfinite(np.asarray(res.final_state)))
        assert np.all(np.abs(np.asarray(res.final_state)) < 100.0)


class TestTinySpdRobustness:
    def test_huge_scale_gram_f32(self):
        """Gram matrices with ~1e30 entries (Jacobian-chain quadratic
        forms at stiff iterates) must factor without NaN in f32."""
        rng = np.random.RandomState(3)
        U = rng.randn(3, 8).astype(np.float32) * 1e15
        S = jnp.asarray(U @ U.T)  # entries ~1e30, PSD, condition ~1e3+
        b = jnp.asarray(rng.randn(3).astype(np.float32) * 1e15)
        x = _tiny_spd_solve(S, b)
        assert bool(jnp.all(jnp.isfinite(x)))
        # Residual is small relative to the problem scale.
        r = S @ x - b
        assert float(jnp.max(jnp.abs(r))) < 1e-3 * float(jnp.max(jnp.abs(b)))

    def test_near_singular_f32_no_nan(self):
        """Numerically rank-deficient f32 Gram (exact cancellation regime):
        the result may be heavily damped but must be finite."""
        u = np.ones((4, 1), dtype=np.float32) * 1e14
        S = jnp.asarray(u @ u.T)  # rank 1, entries 1e28
        b = jnp.ones((4,), jnp.float32)
        x = _tiny_spd_solve(S, b)
        assert bool(jnp.all(jnp.isfinite(x)))

    def test_zero_matrix_finite(self):
        S = jnp.zeros((2, 2), jnp.float32)
        b = jnp.ones((2,), jnp.float32)
        x = _tiny_spd_solve(S, b)
        assert bool(jnp.all(jnp.isfinite(x)))

    def test_well_conditioned_accuracy_preserved(self):
        """The relative ridge is ~eps-sized in the normal regime: f64
        solves stay accurate to ~1e-12."""
        rng = np.random.RandomState(0)
        A = rng.randn(4, 4)
        S = jnp.asarray(A @ A.T + 4.0 * np.eye(4))
        b = jnp.asarray(rng.randn(4))
        x = _tiny_spd_solve(S, b)
        expected = np.linalg.solve(np.asarray(S), np.asarray(b))
        np.testing.assert_allclose(np.asarray(x), expected, rtol=1e-10)

    def test_mixed_row_scales_f32(self):
        """Rows of wildly different physical scale (the augmented Schur
        complement mixes soft terminal-cost rows with hard equality
        rows): Jacobi equilibration keeps the ridge proportionate per
        row — a trace-relative ridge would swamp the small rows."""
        rng = np.random.RandomState(7)
        A = rng.randn(4, 6)
        d = np.diag([1e4, 1e4, 1.0, 1e-3])
        S_np = d @ (A @ A.T + 0.5 * np.eye(4)) @ d  # row scales span 1e14
        b_np = d @ rng.randn(4)
        x = np.asarray(
            _tiny_spd_solve(
                jnp.asarray(S_np, jnp.float32), jnp.asarray(b_np, jnp.float32)
            ),
            np.float64,
        )
        expected = np.linalg.solve(S_np, b_np)
        err = np.abs(x - expected) / np.abs(expected)
        assert err.max() < 1e-3, f"relative error {err}"

    def test_lanes_layout_batched(self):
        rng = np.random.RandomState(1)
        A = rng.randn(5, 3, 3)
        S_np = np.einsum("bij,bkj->bik", A, A) + 2.0 * np.eye(3)
        b_np = rng.randn(5, 3)
        S = jnp.asarray(S_np.transpose(1, 2, 0))  # (n, n, B)
        b = jnp.asarray(b_np.T)  # (n, B)
        x = np.asarray(_tiny_spd_solve(S, b)).T
        expected = np.stack(
            [np.linalg.solve(S_np[i], b_np[i]) for i in range(5)]
        )
        np.testing.assert_allclose(x, expected, rtol=1e-9)
