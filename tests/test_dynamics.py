"""Tier-1 tests: dynamics Jacobians vs high-order finite differences, and the
physics invariants the reference validates (dissipation, symmetry), see
``/root/reference/optimization/integration_test.cc``. We additionally check
energy conservation for both model families (the reference has no such test)
and AD-safety of the drag-singularity guard at |v| = 0.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np

from cartpole_tpu import (
    DOUBLE_CARTPOLE,
    DoubleCartPoleParams,
    SINGLE_CARTPOLE,
    SingleCartPoleParams,
    rk4_step,
)


def numerical_jacobian(func, x, h=0.01):
    """6th-order central differences — same stencil as the reference harness
    (``integration_test.cc:10-42``)."""
    x = np.asarray(x, np.float64)
    y0 = np.asarray(func(x))
    J = np.zeros(y0.shape + x.shape)

    def d(fn, dx):
        c1 = fn(dx) - fn(-dx)
        c2 = fn(2 * dx) - fn(-2 * dx)
        c3 = fn(3 * dx) - fn(-3 * dx)
        return (45 * c1 - 9 * c2 + c3) / (60 * dx)

    for j in range(x.size):
        def probe(dx, j=j):
            delta = np.zeros_like(x)
            delta.flat[j] = dx
            return np.asarray(func(x + delta.reshape(x.shape)))

        J[..., j] = d(probe, h)
    return J


TEST_PARAMS = SingleCartPoleParams(1.0, 0.1, 0.25, 9.81, 0.0, 0.1, 0.0, 0.8, 10.0)
FULL_PARAMS = SingleCartPoleParams(1.0, 0.1, 0.25, 9.81, 0.03, 0.1, 0.13, 0.8, 100.0)


class TestSingleJacobians:
    def test_dynamics_jacobian_matches_finite_differences(self):
        x = jnp.array([1.2, 0.7, 0.4, -0.15])
        u = 0.1
        f = lambda x_: SINGLE_CARTPOLE.dynamics(TEST_PARAMS, x_, u)
        J_ad = jax.jacfwd(f)(x)
        J_num = numerical_jacobian(lambda x_: np.asarray(f(jnp.asarray(x_))), x)
        assert np.linalg.norm(J_ad - J_num) < 1e-10

    def test_rk4_jacobians_match_finite_differences(self):
        """The reference's TestDerivatives (integration_test.cc:45-80):
        d(rk4 step)/dx and /du to 1e-12."""
        x = jnp.array([1.2, 0.7, 0.4, -0.15])
        u = jnp.asarray(0.1)
        dt = 0.01
        f = lambda x_, u_: SINGLE_CARTPOLE.dynamics(TEST_PARAMS, x_, u_)
        step = lambda x_, u_: rk4_step(f, x_, u_, dt)

        J_x = jax.jacfwd(step, argnums=0)(x, u)
        J_u = jax.jacfwd(step, argnums=1)(x, u)

        J_x_num = numerical_jacobian(lambda x_: np.asarray(step(jnp.asarray(x_), u)), x)
        J_u_num = numerical_jacobian(
            lambda u_: np.asarray(step(x, jnp.asarray(u_[0]))), np.array([0.1])
        )
        assert np.linalg.norm(J_x - J_x_num) < 1e-12
        assert np.linalg.norm(np.asarray(J_u).reshape(4, 1) - J_u_num) < 1e-12

    def test_full_model_jacobian_with_all_terms(self):
        """Jacobian correctness through friction/drag/springs (nonsmooth
        terms active away from their kinks)."""
        x = jnp.array([0.85, 0.4, 0.6, -1.3])  # b_x near spring at x_s=0.8
        u = 2.0
        f = lambda x_: SINGLE_CARTPOLE.dynamics(FULL_PARAMS, x_, u)
        J_ad = jax.jacfwd(f)(x)
        J_num = numerical_jacobian(lambda x_: np.asarray(f(jnp.asarray(x_))), x, h=1e-3)
        assert np.linalg.norm(J_ad - J_num) < 1e-8

    def test_drag_gradient_safe_at_zero_velocity(self):
        """The |v|=0 drag singularity must not poison gradients (the
        reference guards it symbolically, dynamics_single.py:102-108)."""
        x = jnp.zeros(4)
        f = lambda x_: SINGLE_CARTPOLE.dynamics(FULL_PARAMS, x_, 0.0)
        J = jax.jacfwd(f)(x)
        assert bool(jnp.all(jnp.isfinite(J)))
        g = jax.grad(lambda x_: f(x_)[2])(x)
        assert bool(jnp.all(jnp.isfinite(g)))

    def test_generated_drag_gradient_safe_at_zero_velocity(self):
        """Same guard on the machine-generated path: CSE hoists the drag
        sqrt out of its Piecewise guard, so the emitter must clamp the
        sqrt argument (safe-sqrt idiom) or AD through the gen module NaNs
        at the standard hang state where |v_1| = 0."""
        from cartpole_tpu.models._single_gen import single_dynamics

        pt = tuple(FULL_PARAMS.as_dict().values())
        x = jnp.array([0.0, -math.pi / 2, 0.0, 0.0])
        J = jax.jacfwd(lambda x_: single_dynamics(pt, x_, 0.0))(x)
        assert bool(jnp.all(jnp.isfinite(J)))


class TestSinglePhysicsInvariants:
    def _integrate(self, params, x0, n, dt=0.01, u=0.0, f_base=None):
        f = lambda x_, u_: SINGLE_CARTPOLE.dynamics(params, x_, u_, f_base)

        def body(x, _):
            return rk4_step(f, x, u, dt), None

        x, _ = jax.lax.scan(body, jnp.asarray(x0, jnp.float64), None, length=n)
        return x

    def test_friction_dissipation(self):
        """integration_test.cc:82-103 — Coulomb friction drives velocities
        to zero over 20k steps."""
        params = SingleCartPoleParams(1.0, 0.5, 0.4, 9.81, 0.5, 0.1, 0.0, 0.0, 0.0)
        x = self._integrate(params, [0.0, 0.0, 0.0, 0.0], 20000)
        assert abs(float(x[2])) < 1e-6
        assert abs(float(x[3])) < 1e-4

    def test_drag_dissipation(self):
        """integration_test.cc:105-125 — cubic air drag dissipates to rest."""
        params = SingleCartPoleParams(0.8, 0.1, 0.4, 9.81, 0.01, 0.1, 5.0, 0.0, 0.0)
        x = self._integrate(params, [0.0, -math.pi, 0.0, 0.0], 10000)
        assert abs(float(x[2])) < 1e-6
        assert abs(float(x[3])) < 3e-5

    def test_external_force_symmetry(self):
        """integration_test.cc:127-175 — mirrored forces give mirrored
        trajectories to 1e-12."""
        params = SingleCartPoleParams(1.0, 0.1, 0.25, 9.81, 0.1, 0.1, 0.0, 0.0, 0.0)
        dt = 0.001
        x0 = jnp.asarray([0.0, -math.pi / 2, 0.0, 0.0], jnp.float64)

        def run(sign):
            def body(x, i):
                force = jnp.where(i < 500, sign * 5.0, 0.0)
                f = lambda x_, u_: SINGLE_CARTPOLE.dynamics(
                    params, x_, u_, jnp.stack([force, jnp.zeros_like(force)])
                )
                return rk4_step(f, x, 0.0, dt), None

            x, _ = jax.lax.scan(body, x0, jnp.arange(3000))
            return x

        xl, xr = run(1.0), run(-1.0)
        assert float(xl[0]) > 0 and float(xr[0]) < 0
        np.testing.assert_allclose(float(xl[0]), -float(xr[0]), atol=1e-12)
        np.testing.assert_allclose(float(xl[2]), -float(xr[2]), atol=1e-12)
        np.testing.assert_allclose(
            -math.pi / 2 - float(xl[1]), float(xr[1]) + math.pi / 2, atol=1e-12
        )
        np.testing.assert_allclose(float(xl[3]), -float(xr[3]), atol=1e-12)

    def test_energy_conservation_without_dissipation(self):
        params = SingleCartPoleParams(1.0, 0.1, 0.25, 9.81, 0.0, 0.1, 0.0, 0.0, 0.0)
        x0 = [0.1, 0.3, 0.2, -0.5]
        e0 = float(SINGLE_CARTPOLE.energy(params, jnp.asarray(x0)))
        x = self._integrate(params, x0, 5000, dt=0.001)
        e1 = float(SINGLE_CARTPOLE.energy(params, x))
        assert abs(e1 - e0) < 1e-8

    def test_energy_decreases_with_dissipation(self):
        x0 = jnp.asarray([0.0, 0.0, 1.0, 2.0], jnp.float64)
        e0 = float(SINGLE_CARTPOLE.energy(FULL_PARAMS, x0))
        x = self._integrate(FULL_PARAMS, x0, 1000, dt=0.001)
        e1 = float(SINGLE_CARTPOLE.energy(FULL_PARAMS, x))
        assert e1 < e0


class TestDoublePendulum:
    PARAMS = DoubleCartPoleParams(1.0, 0.1, 0.08, 0.25, 0.2, 9.81)

    def test_jacobian_matches_finite_differences(self):
        x = jnp.array([0.3, 0.7, -0.4, 0.5, -0.2, 0.9])
        u = 0.4
        f = lambda x_: DOUBLE_CARTPOLE.dynamics(self.PARAMS, x_, u)
        J_ad = jax.jacfwd(f)(x)
        J_num = numerical_jacobian(lambda x_: np.asarray(f(jnp.asarray(x_))), x, h=1e-3)
        assert np.linalg.norm(J_ad - J_num) < 1e-8

    def test_energy_conservation(self):
        """The reference double model is conservative (no friction/drag)."""
        x0 = jnp.asarray([0.0, -1.2, 0.7, 0.0, 0.0, 0.0], jnp.float64)
        e0 = float(DOUBLE_CARTPOLE.energy(self.PARAMS, x0))
        f = lambda x_, u_: DOUBLE_CARTPOLE.dynamics(self.PARAMS, x_, u_)

        def body(x, _):
            return rk4_step(f, x, 0.0, 0.0005), None

        x, _ = jax.lax.scan(body, x0, None, length=10000)
        e1 = float(DOUBLE_CARTPOLE.energy(self.PARAMS, x))
        assert abs(e1 - e0) < 1e-7

    def test_reduces_to_single_when_second_mass_vanishes(self):
        """With m_2 -> 0 and the second link slaved, cart+first-link accel
        matches the single-pole model without friction/drag/springs."""
        single = SingleCartPoleParams(1.0, 0.1, 0.25, 9.81, 0.0, 1e9, 0.0, 0.0, 0.0)
        double = DoubleCartPoleParams(1.0, 0.1, 1e-12, 0.25, 0.2, 9.81)
        xs = jnp.array([0.2, 0.8, -0.3, 0.6])
        xd = jnp.array([0.2, 0.8, 0.0, -0.3, 0.6, 0.0])
        u = 1.5
        ds = SINGLE_CARTPOLE.dynamics(single, xs, u)
        dd = DOUBLE_CARTPOLE.dynamics(double, xd, u)
        np.testing.assert_allclose(np.asarray(dd)[[0, 1, 3, 4]], np.asarray(ds), atol=1e-6)

    def test_external_forces(self):
        """Generalized forces: a y-force at the second mass torques both links."""
        x = jnp.array([0.0, 0.3, 0.9, 0.0, 0.0, 0.0])
        d0 = DOUBLE_CARTPOLE.dynamics(self.PARAMS, x, 0.0)
        d1 = DOUBLE_CARTPOLE.dynamics(
            self.PARAMS, x, 0.0, f_mass_2=jnp.array([0.0, 3.0])
        )
        assert not np.allclose(np.asarray(d0)[4], np.asarray(d1)[4])
        assert not np.allclose(np.asarray(d0)[5], np.asarray(d1)[5])
