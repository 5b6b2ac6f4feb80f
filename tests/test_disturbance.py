"""Disturbance-rejection closed loop — the browser UI's user-poke semantics.

The reference app injects decaying mouse forces into the PLANT that the
planner never sees (``application.ts:424-489``); here a per-tick
disturbance schedule drives the same capability and the controller must
recover the upright equilibrium.
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


class TestDisturbanceRejection:
    def test_impulse_recovery(self):
        """Swing up (150 ticks), then a 10-tick lateral shove at the pole
        mass; the controller recovers upright by the end."""
        mpc = make_mpc(OptimizationParams(max_iterations=10, state_spacing=5))
        dp = default_single_params(jnp.float64)
        steps = 300
        dist = np.zeros((steps, 2, 2))
        dist[150:160, 1, 0] = 4.0  # horizontal force at the pole mass
        run = jax.jit(
            lambda x, d: run_closed_loop(
                mpc, x, dp, steps, disturbances=d
            )
        )
        res = run(jnp.asarray(DOWN), jnp.asarray(dist))

        states = np.asarray(res.states)
        # The poke visibly displaces the pole...
        assert np.abs(states[150:175, 1] - np.pi / 2).max() > 5e-3
        # ...and the controller recovers.
        xf = np.asarray(res.final_state)
        assert abs(xf[1] - np.pi / 2) < 1e-3
        assert abs(xf[3]) < 1e-2
        term = np.asarray(res.termination_states)
        assert not np.any(term == NLSTerminationState.QP_INDEFINITE)

    def test_zero_disturbance_matches_plain_run(self):
        mpc = make_mpc(OptimizationParams(max_iterations=6, state_spacing=5))
        dp = default_single_params(jnp.float64)
        steps = 30
        res_a = jax.jit(
            lambda x: run_closed_loop(mpc, x, dp, steps)
        )(jnp.asarray(DOWN))
        res_b = jax.jit(
            lambda x, d: run_closed_loop(mpc, x, dp, steps, disturbances=d)
        )(jnp.asarray(DOWN), jnp.zeros((steps, 2, 2)))
        np.testing.assert_allclose(
            np.asarray(res_a.controls), np.asarray(res_b.controls), atol=1e-12
        )


class TestSimulatorSecondLinkForce:
    def test_stateful_wrapper_passes_f_mass_2(self):
        """The stateful ``Simulator`` wrapper must expose the second-link
        force (``f_mass_2``) that ``simulator_step`` supports for the
        double-pole model — the interactive driver pokes that mass."""
        from cartpole_tpu import DOUBLE_CARTPOLE, DoubleCartPoleParams
        from cartpole_tpu.mpc.simulator import Simulator, simulator_step

        dp = DoubleCartPoleParams()
        sim_a = Simulator(model=DOUBLE_CARTPOLE)
        sim_b = Simulator(model=DOUBLE_CARTPOLE)
        x0 = sim_a.get_state()
        xa = sim_a.step(dp, 0.01, 0.0, f_mass_2=jnp.array([5.0, 0.0]))
        xb = sim_b.step(dp, 0.01, 0.0)
        assert not np.allclose(np.asarray(xa), np.asarray(xb))
        want = simulator_step(
            dp, x0, 0.01, 0.0, None, None, DOUBLE_CARTPOLE,
            f_mass_2=jnp.array([5.0, 0.0]),
        )
        np.testing.assert_allclose(np.asarray(xa), np.asarray(want))
