"""Machine-generated analytic Jacobians and the chain-rule integrator.

Validates the hot-path replacements for ``jacfwd``: the symbolically
generated ``dynamics_jac`` modules (``models/_*_gen.py``) and
``rk4_step_with_jac`` / ``segment_rollout_with_jac`` (the
``integration.hpp:13-49`` capability) against AD of the hand-written
dynamics — including the drag-Jacobian singularity guard at rest
(``dynamics_single.py:102-108``).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cartpole_tpu import default_double_params, default_single_params
from cartpole_tpu.models import DOUBLE_CARTPOLE, SINGLE_CARTPOLE
from cartpole_tpu.ops.integrate import (
    rk4_step,
    rk4_step_with_jac,
    rollout,
    segment_rollout_with_jac,
)

CASES = [
    (SINGLE_CARTPOLE, default_single_params),
    (DOUBLE_CARTPOLE, default_double_params),
]


@pytest.mark.parametrize("model,default_params", CASES)
class TestGeneratedJacobians:
    def test_matches_ad_at_random_states(self, model, default_params):
        dp = default_params(jnp.float64)
        f = lambda x, u: model.dynamics(dp, x, u)
        rng = np.random.RandomState(0)
        for _ in range(20):
            x = jnp.asarray(rng.uniform(-2, 2, model.state_dim))
            u = rng.uniform(-50.0, 50.0)
            xd, Jx, Ju = model.dynamics_jac(dp, x, u)
            np.testing.assert_allclose(
                np.asarray(xd), np.asarray(f(x, u)), atol=1e-12
            )
            np.testing.assert_allclose(
                np.asarray(Jx),
                np.asarray(jax.jacfwd(f, 0)(x, u)),
                atol=1e-11,
            )
            np.testing.assert_allclose(
                np.asarray(Ju),
                np.asarray(jax.jacfwd(f, 1)(x, u)),
                atol=1e-11,
            )

    def test_finite_at_rest(self, model, default_params):
        """The drag-Jacobian guard: exactly zero velocity must give finite
        Jacobians (value 0 for the drag terms), matching AD through the
        safe-where idiom."""
        dp = default_params(jnp.float64)
        x = jnp.zeros((model.state_dim,))
        x = x.at[1].set(-np.pi / 2)
        xd, Jx, Ju = model.dynamics_jac(dp, x, 0.0)
        assert bool(jnp.all(jnp.isfinite(xd)))
        assert bool(jnp.all(jnp.isfinite(Jx)))
        assert bool(jnp.all(jnp.isfinite(Ju)))
        f = lambda xx, uu: model.dynamics(dp, xx, uu)
        np.testing.assert_allclose(
            np.asarray(Jx), np.asarray(jax.jacfwd(f, 0)(x, 0.0)), atol=1e-12
        )


class TestAnalyticFlagIntegration:
    def test_mpc_step_matches_ad_path(self):
        """analytic_jacobians=True yields the same solve (to f64 rounding
        amplified through the line search) as the default AD path."""
        from cartpole_tpu import OptimizationParams, make_mpc

        dp = default_single_params(jnp.float64)
        x0 = jnp.asarray([0.0, -np.pi / 2, 0.0, 0.0])
        us = {}
        for flag in (False, True):
            mpc = make_mpc(
                OptimizationParams(
                    max_iterations=4,
                    state_spacing=5,
                    kkt_method="condensed",
                    analytic_jacobians=flag,
                )
            )
            out, _ = jax.jit(lambda s, x: mpc.step(s, x, dp))(
                mpc.init_state(jnp.float64), x0
            )
            us[flag] = np.asarray(out.u)
        np.testing.assert_allclose(us[True], us[False], rtol=0, atol=1e-4)


@pytest.mark.parametrize("model,default_params", CASES)
class TestChainRuleIntegrator:
    def test_rk4_step_jacobians(self, model, default_params):
        dp = default_params(jnp.float64)
        f = lambda x, u: model.dynamics(dp, x, u)
        fj = lambda x, u: model.dynamics_jac(dp, x, u)
        rng = np.random.RandomState(1)
        for _ in range(5):
            x = jnp.asarray(rng.uniform(-2, 2, model.state_dim))
            u = rng.uniform(-20.0, 20.0)
            xn, A, B = rk4_step_with_jac(fj, x, u, 0.01)
            np.testing.assert_allclose(
                np.asarray(xn), np.asarray(rk4_step(f, x, u, 0.01)), atol=1e-12
            )
            np.testing.assert_allclose(
                np.asarray(A),
                np.asarray(
                    jax.jacfwd(lambda xx: rk4_step(f, xx, u, 0.01))(x)
                ),
                atol=1e-11,
            )
            np.testing.assert_allclose(
                np.asarray(B),
                np.asarray(
                    jax.jacfwd(lambda uu: rk4_step(f, x, uu, 0.01))(u)
                ),
                atol=1e-11,
            )

    def test_segment_jacobians(self, model, default_params):
        dp = default_params(jnp.float64)
        f = lambda x, u: model.dynamics(dp, x, u)
        fj = lambda x, u: model.dynamics_jac(dp, x, u)
        rng = np.random.RandomState(2)
        x0 = jnp.asarray(rng.uniform(-1, 1, model.state_dim))
        us = jnp.asarray(rng.uniform(-20, 20, 5))

        def seg(x0_, us_):
            x_end, _ = rollout(f, x0_, us_, 0.01, model.angle_indices)
            return x_end

        x_end, Jx, Ju = segment_rollout_with_jac(
            fj, x0, us, 0.01, model.angle_indices
        )
        np.testing.assert_allclose(
            np.asarray(x_end), np.asarray(seg(x0, us)), atol=1e-12
        )
        np.testing.assert_allclose(
            np.asarray(Jx), np.asarray(jax.jacfwd(seg, 0)(x0, us)), atol=1e-10
        )
        np.testing.assert_allclose(
            np.asarray(Ju), np.asarray(jax.jacfwd(seg, 1)(x0, us)), atol=1e-10
        )
