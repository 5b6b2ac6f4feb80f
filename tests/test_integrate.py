"""Tests for the integration ops: mod_pi semantics, rollout equivalence,
simulator substepping."""

import math

import jax
import jax.numpy as jnp
import numpy as np

from cartpole_tpu import SINGLE_CARTPOLE, SingleCartPoleParams, mod_pi, rk4_step, rollout
from cartpole_tpu.mpc import simulator_step
from cartpole_tpu.ops.integrate import substep_rollout

PARAMS = SingleCartPoleParams(1.0, 0.1, 0.25, 9.81, 0.03, 0.1, 0.13, 0.8, 100.0)


def _ref_mod_pi(angle):
    """Literal transcription of the reference semantics
    (integration.hpp:64-73) in python floats."""
    two_pi = 2 * math.pi
    angle = math.fmod(angle, two_pi)
    angle += (angle < 0) * two_pi
    angle -= (angle > math.pi) * two_pi
    return angle


class TestModPi:
    def test_matches_reference_semantics(self):
        for a in np.linspace(-25.0, 25.0, 2001):
            np.testing.assert_allclose(
                float(mod_pi(jnp.float64(a))), _ref_mod_pi(a), atol=1e-12, err_msg=str(a)
            )

    def test_half_open_boundary(self):
        """Range is (-pi, pi]: pi maps to pi, -pi maps to pi."""
        assert float(mod_pi(jnp.float64(math.pi))) == math.pi
        np.testing.assert_allclose(float(mod_pi(jnp.float64(-math.pi))), math.pi)

    def test_identity_inside_range(self):
        for a in [-3.0, -0.5, 0.0, 1.0, 3.1]:
            np.testing.assert_allclose(float(mod_pi(jnp.float64(a))), a, atol=1e-15)


class TestRollout:
    def test_rollout_matches_manual_stepping(self):
        f = lambda x, u: SINGLE_CARTPOLE.dynamics(PARAMS, x, u)
        x0 = jnp.asarray([0.0, -math.pi / 2, 0.0, 0.0], jnp.float64)
        us = jnp.linspace(-3.0, 3.0, 15)
        x_final, xs = rollout(f, x0, us, 0.01, SINGLE_CARTPOLE.angle_indices)

        x = x0
        for u in np.asarray(us):
            x = rk4_step(f, x, u, 0.01)
            x = x.at[1].set(mod_pi(x[1]))
        np.testing.assert_allclose(np.asarray(x_final), np.asarray(x), atol=1e-14)
        np.testing.assert_allclose(np.asarray(xs[-1]), np.asarray(x), atol=1e-14)
        assert xs.shape == (15, 4)

    def test_rollout_is_differentiable(self):
        f = lambda x, u: SINGLE_CARTPOLE.dynamics(PARAMS, x, u)
        x0 = jnp.asarray([0.0, 0.3, 0.0, 0.0], jnp.float64)
        us = jnp.zeros(10)
        g = jax.grad(lambda us_: rollout(f, x0, us_, 0.01, (1,))[0][1])(us)
        assert bool(jnp.all(jnp.isfinite(g)))
        assert float(jnp.max(jnp.abs(g))) > 0


class TestSimulatorSubstepping:
    def test_substep_count_and_remainder(self):
        """dt=0.0105 -> ten 1 ms substeps + one 0.5 ms substep
        (simulator.cc:17-23 arithmetic)."""
        f = lambda x, u: SINGLE_CARTPOLE.dynamics(PARAMS, x, u)
        x0 = jnp.asarray([0.0, 0.4, 0.1, -0.2], jnp.float64)
        out = substep_rollout(f, x0, 1.0, 0.0105, 1.0e-3, (1,))

        x = x0
        for h in [1.0e-3] * 10 + [0.0005]:
            x = rk4_step(f, x, 1.0, h)
            x = x.at[1].set(mod_pi(x[1]))
        np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-13)

    def test_simulator_step_uses_1khz_substeps(self):
        x0 = jnp.asarray([0.0, -math.pi / 2, 0.0, 0.0], jnp.float64)
        a = simulator_step(PARAMS, x0, 0.01, 5.0)
        # Ten explicit 1ms steps:
        f = lambda x, u: SINGLE_CARTPOLE.dynamics(PARAMS, x, u)
        b = x0
        for _ in range(10):
            b = rk4_step(f, b, 5.0, 1.0e-3)
            b = b.at[1].set(mod_pi(b[1]))
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-13)

    def test_simulator_applies_external_forces(self):
        x0 = jnp.asarray([0.0, -math.pi / 2, 0.0, 0.0], jnp.float64)
        a = simulator_step(PARAMS, x0, 0.01, 0.0)
        b = simulator_step(PARAMS, x0, 0.01, 0.0, f_base=jnp.array([4.0, 0.0]))
        assert float(b[2]) > float(a[2])
