"""Log replay — the "JSON log doubles as a replayable record" capability
(``/root/reference/viz/src/application.ts:344-351,429-434``; SURVEY.md §5).
A session saved as log.json (either on-disk format) must reconstruct the
closed-loop trajectory exactly and re-render offline."""

import json
import math

import jax
import jax.numpy as jnp
import numpy as np

from cartpole_tpu import (
    OptimizationParams,
    default_single_params,
    make_mpc,
)
from cartpole_tpu.mpc.simulator import simulator_step
from cartpole_tpu.utils import SolveLog, load_log, replay_log

DOWN = np.array([0.0, -math.pi / 2, 0.0, 0.0])


def _record_session(ticks=5):
    """Run a few real MPC ticks, logging each solve like the web app."""
    mpc = make_mpc(OptimizationParams(max_iterations=3, state_spacing=5))
    dp = default_single_params(jnp.float64)
    step = jax.jit(lambda s, x: mpc.step(s, x, dp, 0.0))
    log = SolveLog()
    state = mpc.init_state(jnp.float64)
    x = jnp.asarray(DOWN)
    xs, us = [], []
    for _ in range(ticks):
        outputs, state = step(state, x)
        log.append(outputs)
        xs.append(np.asarray(x))
        us.append(float(np.asarray(outputs.u)[0]))
        x = simulator_step(dp, x, mpc.params.control_dt,
                           np.asarray(outputs.u)[0])
    return log, np.asarray(xs), np.asarray(us), mpc


class TestReplaySolveLogFormat:
    def test_round_trips_states_controls_predictions(self, tmp_path):
        log, xs, us, mpc = _record_session()
        path = tmp_path / "log.json"
        log.save(str(path))

        rep = replay_log(load_log(str(path)))
        np.testing.assert_allclose(rep.states, xs, rtol=0, atol=1e-12)
        np.testing.assert_allclose(rep.controls, us, rtol=0, atol=1e-12)
        assert rep.predicted_states is not None
        assert rep.predicted_states.shape == (
            len(xs), mpc.params.window_length, 4
        )
        assert rep.termination_states.shape == (len(xs),)
        assert np.all((rep.termination_states >= 0)
                      & (rep.termination_states < 5))

    def test_null_scalars_become_nan(self, tmp_path):
        log, *_ = _record_session(ticks=1)
        entries = log.entries()
        entries[0]["u"][0] = None  # how the writer spells non-finite
        path = tmp_path / "log.json"
        path.write_text(json.dumps(entries))
        rep = replay_log(load_log(str(path)))
        assert math.isnan(rep.controls[0])

    def test_rejects_unknown_entry_shape(self, tmp_path):
        path = tmp_path / "log.json"
        path.write_text(json.dumps([{"bogus": 1}]))
        import pytest

        with pytest.raises(ValueError, match="unrecognized"):
            replay_log(load_log(str(path)))


class TestReplayCliFormat:
    def test_round_trips(self, tmp_path):
        entries = [
            {"state": [0.0, -1.5, 0.1, 0.2], "u": 3.5,
             "termination_state": "MAX_ITERATIONS"},
            {"state": [0.1, -1.4, 0.2, 0.1], "u": -2.0,
             "termination_state": "SATISFIED_RELATIVE_TOL"},
        ]
        path = tmp_path / "cl.json"
        path.write_text(json.dumps(entries))
        rep = replay_log(load_log(str(path)))
        assert rep.states.shape == (2, 4)
        assert rep.predicted_states is None
        np.testing.assert_allclose(rep.controls, [3.5, -2.0])
        assert list(rep.termination_states) == [0, 1]


class TestReplayCli:
    def test_replay_subcommand_renders(self, tmp_path):
        log, *_ = _record_session(ticks=3)
        path = tmp_path / "log.json"
        log.save(str(path))
        charts = tmp_path / "charts.png"
        gif = tmp_path / "replay.gif"

        from cartpole_tpu.cli import main

        rc = main(["replay", str(path), "--charts", str(charts),
                   "--gif", str(gif)])
        assert rc == 0
        assert charts.stat().st_size > 0
        assert gif.stat().st_size > 0
