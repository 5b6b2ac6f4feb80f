"""Differentiable MPC (``cartpole_tpu/diff.py``): implicit-function-theorem
gradients through the receding-horizon solve, validated against central
finite differences of the full solver.

No reference parallel: the reference's solver is an opaque C++ submodule;
end-to-end differentiability is a capability of the pure-JAX rebuild.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cartpole_tpu import (
    MPCState,
    OptimizationParams,
    default_single_params,
    get_model,
    make_mpc,
)
from cartpole_tpu.diff import make_differentiable_solve


def _small_mpc(**overrides):
    """A small, deeply-converged solver: gradient tests need the forward
    solve at stationarity (the IFT is exact only at g = 0)."""
    kwargs = dict(
        max_iterations=20,
        window_length=20,
        state_spacing=5,
        u_guess_sinusoid_amplitude=0.0,
    )
    kwargs.update(overrides)
    return make_mpc(OptimizationParams(**kwargs), get_model("single"))


def _cold_state(mpc, dtype=jnp.float64):
    return MPCState(
        previous_solution=jnp.zeros((mpc.spec.dim,), dtype),
        warm=jnp.zeros((), bool),
    )


def _fd_grad(f, x, eps):
    """Central finite differences of scalar ``f`` at 1-D ``x``."""
    x = np.asarray(x, np.float64)
    g = np.zeros_like(x)
    for i in range(x.size):
        dx = np.zeros_like(x)
        dx[i] = eps
        g[i] = (float(f(jnp.asarray(x + dx))) - float(f(jnp.asarray(x - dx)))) / (
            2 * eps
        )
    return g


@pytest.fixture(scope="module")
def setup():
    mpc = _small_mpc()
    dp = default_single_params(jnp.float64)
    solve = make_differentiable_solve(mpc)
    state = _cold_state(mpc)
    # Near-upright disturbance rejection: a benign, locally-unique optimum.
    x0 = jnp.array([0.1, np.pi / 2 + 0.15, -0.05, 0.1], jnp.float64)
    return mpc, dp, solve, state, x0


class TestGradVsFiniteDifferences:
    def test_wrt_initial_state(self, setup):
        mpc, dp, solve, state, x0 = setup
        spec = mpc.spec

        def loss(x):
            z = solve(x, dp, 0.0, state)
            u = z[spec.u_start :]
            return jnp.sum(u**2) + 10.0 * jnp.sum(
                (z[: spec.state_dim * 2] - 0.3) ** 2
            )

        g = np.asarray(jax.grad(loss)(x0))
        g_fd = _fd_grad(loss, x0, 1e-6)
        assert np.allclose(g, g_fd, rtol=2e-4, atol=1e-7), (g, g_fd)

    def test_wrt_set_point(self, setup):
        mpc, dp, solve, state, x0 = setup
        spec = mpc.spec

        def loss(sp):
            z = solve(x0, dp, sp[0], state)
            return jnp.sum(z[spec.u_start :] ** 2)

        g = float(jax.grad(lambda s: loss(s))(jnp.array([0.2]))[0])
        g_fd = _fd_grad(loss, jnp.array([0.2]), 1e-6)[0]
        assert np.isclose(g, g_fd, rtol=2e-4, atol=1e-8), (g, g_fd)

    def test_wrt_dynamics_params(self, setup):
        """System identification direction: d loss / d (m_b, m_1, l_1)."""
        mpc, dp, solve, state, x0 = setup
        spec = mpc.spec
        fields = ("m_b", "m_1", "l_1")

        def loss_from_vec(v):
            dpv = dataclasses.replace(
                dp, **{f: v[i] for i, f in enumerate(fields)}
            )
            z = solve(x0, dpv, 0.0, state)
            return jnp.sum(z[spec.u_start :] ** 2)

        v0 = jnp.array([float(getattr(dp, f)) for f in fields], jnp.float64)
        g = np.asarray(jax.grad(loss_from_vec)(v0))
        g_fd = _fd_grad(loss_from_vec, v0, 1e-6)
        assert np.allclose(g, g_fd, rtol=2e-4, atol=1e-7), (g, g_fd)

    def test_warm_start_carries_no_gradient(self, setup):
        """The warm start selects the basin but is not a differentiable
        input: its cotangent must be identically zero (and the VJP must
        not crash on the PyTree state)."""
        mpc, dp, solve, state, x0 = setup
        spec = mpc.spec

        def loss(x, prev):
            st = MPCState(previous_solution=prev, warm=jnp.ones((), bool))
            z = solve(x, dp, 0.0, st)
            return jnp.sum(z[spec.u_start :] ** 2)

        # Warm-start from a real prior solution (so `warm=True` is honest).
        z_prev = solve(x0, dp, 0.0, state)
        gx, gprev = jax.grad(loss, argnums=(0, 1))(x0, z_prev)
        assert np.all(np.asarray(gprev) == 0.0)
        assert np.all(np.isfinite(np.asarray(gx)))


class TestDefaultWindow:
    def test_reference_default_window_fd_match(self):
        """Regression for the separable KKT assembly: a monolithic
        jacfwd-of-stationarity over the reference-default 8-segment window
        is miscompiled by XLA:CPU on this image (glibc heap corruption —
        see the diff.py docstring); the per-segment assembly must be both
        crash-free and FD-exact at this size."""
        mpc = make_mpc(
            OptimizationParams(state_spacing=5, max_iterations=20),
            get_model("single"),
        )
        dp = default_single_params(jnp.float64)
        solve = make_differentiable_solve(mpc)
        state = _cold_state(mpc)
        spec = mpc.spec
        x0 = jnp.array([0.1, np.pi / 2 + 0.15, -0.05, 0.1], jnp.float64)

        def loss(x):
            z = solve(x, dp, 0.0, state)
            return jnp.sum(z[spec.u_start :] ** 2)

        g = np.asarray(jax.grad(loss)(x0))
        g_fd = _fd_grad(loss, x0, 1e-6)
        assert np.allclose(g, g_fd, rtol=2e-4, atol=1e-7), (g, g_fd)


class TestComposability:
    def test_vmap_and_jit(self, setup):
        """The differentiable solve composes with vmap + jit + grad —
        batched sensitivity analysis in one compiled program."""
        mpc, dp, solve, state, x0 = setup
        spec = mpc.spec
        xs = jnp.stack([x0, x0 + jnp.array([0.05, -0.1, 0.02, 0.0])])

        def loss(x):
            z = solve(x, dp, 0.0, state)
            return jnp.sum(z[spec.u_start :] ** 2)

        gs = jax.jit(jax.vmap(jax.grad(loss)))(xs)
        g0 = jax.grad(loss)(xs[0])
        assert np.allclose(np.asarray(gs[0]), np.asarray(g0), rtol=1e-10)
        assert np.all(np.isfinite(np.asarray(gs)))
