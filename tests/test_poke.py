"""Poke-force model + interactive driver (the web demo's interaction
semantics, ``/root/reference/viz/src/application.ts:208-373, 424-489``)."""

import io
import math

import jax.numpy as jnp
import numpy as np

from cartpole_tpu import (
    OptimizationParams,
    SingleCartPoleParams,
    default_single_params,
    make_mpc,
    run_closed_loop,
)
from cartpole_tpu.interactive import InteractiveLoop, render_ascii
from cartpole_tpu.mpc.poke import (
    POKE_FORCE_SCALE,
    POKE_TIME_CONSTANT,
    decay_external_forces,
    make_poke_schedule,
    poke_force,
)

DOWN = np.array([0.0, -np.pi / 2, 0.0, 0.0])


class TestPokeModel:
    def test_poke_force_scaling_and_direction(self):
        """10x the clicked mass; direction (-cos a, sin a)
        (application.ts:474-489)."""
        p = SingleCartPoleParams(m_b=1.0, m_1=0.1)
        fx, fy = poke_force(0, 0.0, p)
        assert fx == -POKE_FORCE_SCALE * 1.0 and fy == 0.0
        fx, fy = poke_force(1, math.pi / 2, p)
        np.testing.assert_allclose(
            [fx, fy], [0.0, POKE_FORCE_SCALE * 0.1], atol=1e-12
        )
        fx, fy = poke_force(1, math.pi, p)
        np.testing.assert_allclose(
            [fx, fy], [POKE_FORCE_SCALE * 0.1, 0.0], atol=1e-12
        )

    def test_decay_formula(self):
        """f *= max(0, 1 - dt/tau), snap to 0 below 1e-6
        (application.ts:461-472)."""
        f = np.array([[2.0, -1.0], [0.5, 1.1e-6]])
        out = decay_external_forces(f, 0.01)
        scale = 1 - 0.01 / POKE_TIME_CONSTANT
        np.testing.assert_allclose(out[0], [2.0 * scale, -1.0 * scale])
        assert out[1, 1] == 0.0  # snapped (1.1e-6 * 0.9 < 1e-6)
        # dt >= tau kills the force entirely
        assert np.all(decay_external_forces(f, 0.2) == 0.0)

    def test_schedule_matches_recurrence(self):
        p = SingleCartPoleParams()
        sched = make_poke_schedule(10, 0.01, [(2, 1, 0.0)], p)
        assert sched.shape == (10, 2, 2)
        assert np.all(sched[:2] == 0.0)
        f0 = poke_force(1, 0.0, p)
        np.testing.assert_allclose(sched[2, 1], f0)
        scale = 1 - 0.01 / POKE_TIME_CONSTANT
        np.testing.assert_allclose(
            sched[3, 1], np.asarray(f0) * scale, rtol=1e-12
        )
        assert np.all(sched[:, 0] == 0.0)  # base never poked

    def test_schedule_rejects_out_of_range_ticks(self):
        """A tick outside [0, num_steps) would be silently dropped and the
        run misread as 'controller rejected the poke' — raise instead."""
        import pytest

        p = SingleCartPoleParams()
        with pytest.raises(ValueError, match="tick"):
            make_poke_schedule(10, 0.01, [(10, 1, 0.0)], p)
        with pytest.raises(ValueError, match="tick"):
            make_poke_schedule(10, 0.01, [(-1, 1, 0.0)], p)

    def test_schedule_drives_closed_loop(self):
        """A scheduled poke perturbs the plant; the controller recovers —
        the flagship 'human pokes, MPC recovers' capability, offline."""
        mpc = make_mpc(
            OptimizationParams(max_iterations=10, state_spacing=5)
        )
        dp = default_single_params(jnp.float64)
        import jax

        up = jnp.asarray([0.0, np.pi / 2, 0.0, 0.0])
        sched = make_poke_schedule(
            120, 0.01, [(10, 1, 0.0)], SingleCartPoleParams()
        )
        res = jax.jit(
            lambda x, d: run_closed_loop(mpc, x, dp, 120, disturbances=d)
        )(up, jnp.asarray(sched))
        states = np.asarray(res.states)
        # the poke knocked the pole visibly off upright...
        assert np.abs(states[10:40, 1] - np.pi / 2).max() > 0.05
        # ...and the controller recovered it (to within the settling
        # transient 1.1 s after the poke)
        xf = np.asarray(res.final_state)
        assert abs(xf[1] - np.pi / 2) < 1e-2
        assert abs(xf[3]) < 5e-2


class TestInteractiveLoop:
    def _loop(self, **kw):
        kw.setdefault("render", False)
        kw.setdefault(
            "params",
            OptimizationParams(max_iterations=4, state_spacing=5),
        )
        kw.setdefault("dtype", jnp.float64)
        return InteractiveLoop(**kw)

    def test_scripted_stabilize_and_poke(self):
        loop = self._loop()
        loop.x = jnp.asarray([0.0, np.pi / 2, 0.0, 0.0], jnp.float64)
        # run 30 ticks, poke the pole at tick 10
        cmds = [None] * 10 + ["p"] + [None] * 19
        loop.run(max_ticks=30, realtime=False, commands=cmds)
        assert loop.tick_count == 30
        # the poke decays geometrically: 19 ticks after the poke the
        # force is 0.9^19 of the initial 1 N magnitude
        f0 = abs(poke_force(1, 0.0, loop.dp)[0])
        assert abs(loop.forces[1, 0]) < f0 * 0.9 ** 18
        # solve log captured every enabled tick
        assert len(loop.log.entries()) == 30

    def test_toggle_resets_warm_start(self):
        """Re-enabling the controller resets the warm start
        (application.ts:209-214)."""
        loop = self._loop()
        loop.run(max_ticks=3, realtime=False)
        assert bool(loop.mpc_state.warm)
        loop.handle_command("c")  # off
        assert not loop.enabled
        loop.tick()  # controller off: plant-only tick
        loop.handle_command("c")  # on again -> Reset()
        assert loop.enabled
        assert not bool(loop.mpc_state.warm)

    def test_live_param_updates(self):
        loop = self._loop()
        m0 = float(loop.dp.m_1)
        loop.handle_command("2")
        assert float(loop.dp.m_1) > m0
        w0 = loop.params.th_final_cost_weight
        loop.handle_command("t")  # cost <-> equality toggle rebuilds
        assert loop.params.th_final_cost_weight == -w0
        loop.run(max_ticks=2, realtime=False)  # still solves after rebuild
        assert loop.tick_count == 2

    def test_quit_command(self):
        loop = self._loop()
        assert loop.handle_command("q") is False

    def test_render_ascii(self):
        frame = render_ascii(DOWN, SingleCartPoleParams(), enabled=False)
        assert "=" in frame and "o" in frame and "OFF" in frame

    def test_disabled_controller_applies_zero(self):
        loop = self._loop()
        loop.enabled = False
        x_before = np.asarray(loop.x)
        loop.tick()
        # free fall from hanging rest: stays put except gravity symmetry
        assert len(loop.log.entries()) == 0
        assert np.isfinite(np.asarray(loop.x)).all()
        assert abs(np.asarray(loop.x)[0] - x_before[0]) < 1e-6

    def test_draw_writes_frame(self):
        buf = io.StringIO()
        loop = self._loop(render=True, out=buf)
        loop.run(max_ticks=1, realtime=False)
        assert "ctrl=" in buf.getvalue()

    def test_double_model(self):
        """The loop is generic over the model family: 6-state double pole,
        second-link pokes, two-link renderer."""
        from cartpole_tpu import DOUBLE_CARTPOLE, default_double_params

        loop = self._loop(
            params=OptimizationParams(
                max_iterations=4, state_spacing=5, window_length=60
            ),
            model=DOUBLE_CARTPOLE,
        )
        assert loop.forces.shape == (3, 2)
        # start perturbed-upright; poke the second link mass at tick 5
        loop.x = jnp.asarray(
            [0.0, np.pi / 2 + 0.05, np.pi / 2, 0.0, 0.0, 0.0], jnp.float64
        )
        cmds = [None] * 5 + ["o"] + [None] * 9
        loop.run(max_ticks=15, realtime=False, commands=cmds)
        assert loop.tick_count == 15
        assert np.isfinite(np.asarray(loop.x)).all()
        # the second-link poke scales with m_2 and decays
        f0 = abs(poke_force(2, 0.0, default_double_params(jnp.float64))[0])
        assert 0 < abs(loop.forces[2, 0]) < f0
        frame = render_ascii(np.asarray(loop.x), loop.dp)
        assert frame.count("o") >= 2  # two link masses drawn
        loop.reset_plant()
        assert loop.x.shape == (6,)
