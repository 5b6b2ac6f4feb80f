"""Time-varying cost schedules (``mpc/schedule.py``).

The public API for the round-4 transient-shaping mechanism
(``transient_shaping.json``): phase-wise OptimizationParams overrides with
plant state + warm start chained across phase (and chunk) boundaries.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from cartpole_tpu import (
    OptimizationParams,
    default_single_params,
    make_mpc,
    run_closed_loop,
    run_closed_loop_lanes,
    run_scheduled_closed_loop,
)

DOWN = np.array([0.0, -np.pi / 2, 0.0, 0.0])


def _mpc(**kw):
    kw.setdefault("window_length", 10)
    kw.setdefault("state_spacing", 5)
    kw.setdefault("max_iterations", 4)
    return make_mpc(OptimizationParams(**kw))


class TestSingleLayout:
    def test_trivial_schedule_matches_plain_loop(self):
        """One no-override phase, chunked into 3-tick programs, must be
        tick-for-tick identical to one 6-tick program (the warm start is
        an explicit carry, so chunking cannot change the trajectory)."""
        mpc = _mpc()
        dp = default_single_params(jnp.float64)
        x0 = jnp.asarray(DOWN)
        ref = run_closed_loop(mpc, x0, dp, 6)
        res = run_scheduled_closed_loop(
            mpc, x0, dp, [(6, None)], max_ticks_per_program=3
        )
        np.testing.assert_allclose(
            np.asarray(res.controls), np.asarray(ref.controls), atol=1e-12
        )
        np.testing.assert_allclose(
            np.asarray(res.final_state), np.asarray(ref.final_state),
            atol=1e-12,
        )
        np.testing.assert_array_equal(
            np.asarray(res.termination_states),
            np.asarray(ref.termination_states),
        )
        assert np.asarray(res.states).shape[0] == 6

    def test_phase_override_matches_hand_chaining(self):
        """A two-phase schedule equals running the override controller
        for phase 1 and the base controller for phase 2 by hand."""
        import dataclasses

        # Default window: at very short horizons with hard terminal
        # equalities the first swing-up solves track the cold-start guess
        # regardless of u-cost weights, which would make the
        # "override changes behavior" sanity check vacuous.
        mpc = make_mpc(OptimizationParams(max_iterations=4))
        over = {"u_derivative_cost_weight": 0.8}
        mpc_t = make_mpc(dataclasses.replace(mpc.params, **over))
        dp = default_single_params(jnp.float64)
        x0 = jnp.asarray(DOWN)

        r1 = run_closed_loop(mpc_t, x0, dp, 4)
        r2 = run_closed_loop(
            mpc, r1.final_state, dp, 4, mpc_state=r1.final_mpc_state
        )
        res = run_scheduled_closed_loop(
            mpc, x0, dp, [(4, over), (4, None)]
        )
        np.testing.assert_allclose(
            np.asarray(res.controls),
            np.concatenate([np.asarray(r1.controls), np.asarray(r2.controls)]),
            atol=1e-12,
        )
        np.testing.assert_allclose(
            np.asarray(res.final_state), np.asarray(r2.final_state),
            atol=1e-12,
        )
        # The override must actually change the transient.
        base = run_closed_loop(mpc, x0, dp, 4)
        assert np.abs(
            np.asarray(base.controls) - np.asarray(r1.controls)
        ).max() > 1e-6

    def test_layout_preserving_validation(self):
        mpc = _mpc()
        dp = default_single_params(jnp.float64)
        with pytest.raises(ValueError, match="decision-vector layout"):
            run_scheduled_closed_loop(
                mpc, jnp.asarray(DOWN), dp, [(2, {"window_length": 20})]
            )
        with pytest.raises(ValueError, match="at least one phase"):
            run_scheduled_closed_loop(mpc, jnp.asarray(DOWN), dp, [])


class TestLanesLayout:
    def test_lanes_schedule_matches_lanes_loop(self):
        mpc = _mpc(kkt_method="condensed")
        dp = default_single_params(jnp.float64)
        rng = np.random.RandomState(3)
        B = 3
        x0 = np.tile(DOWN, (B, 1))
        x0[:, 1] += rng.uniform(-0.3, 0.3, B)
        x0 = jnp.asarray(x0)
        ref = run_closed_loop_lanes(mpc, x0, dp, 6, 0.0)
        res = run_scheduled_closed_loop(
            mpc, x0, dp, [(6, None)], layout="lanes",
            max_ticks_per_program=4,
        )
        np.testing.assert_allclose(
            np.asarray(res.controls), np.asarray(ref.controls), atol=1e-12
        )
        assert np.asarray(res.states).shape[:2] == (B, 6)

    def test_lanes_two_phase(self):
        import dataclasses

        mpc = _mpc(kkt_method="condensed")
        over = {"u_derivative_cost_weight": 0.9}
        mpc_t = make_mpc(dataclasses.replace(mpc.params, **over))
        dp = default_single_params(jnp.float64)
        B = 2
        x0 = jnp.asarray(np.tile(DOWN, (B, 1)))
        r1 = run_closed_loop_lanes(mpc_t, x0, dp, 3, 0.0)
        r2 = run_closed_loop_lanes(
            mpc, r1.final_state, dp, 3, 0.0, mpc_state=r1.final_mpc_state
        )
        res = run_scheduled_closed_loop(
            mpc, x0, dp, [(3, over), (3, None)], layout="lanes"
        )
        np.testing.assert_allclose(
            np.asarray(res.controls),
            np.concatenate(
                [np.asarray(r1.controls), np.asarray(r2.controls)], axis=1
            ),
            atol=1e-12,
        )
