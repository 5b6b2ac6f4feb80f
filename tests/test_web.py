"""Web front-end tests — cartpole_tpu/web/.

Exercises the JSON API surface that replaces the reference's WASM
embinding (``/root/reference/optimization/wasm.cc``) and the application
behaviors it feeds (``viz/src/application.ts``): state snapshots with
ghost predictions, poke semantics, live dynamics updates, optimizer
rebuild on cost/equality changes, controller toggle with reset, the
ring-buffer log export, and the trace export.
"""

import json
import math
import urllib.request

import numpy as np
import pytest

from cartpole_tpu.interactive import InteractiveLoop
from cartpole_tpu.mpc.config import OptimizationParams
from cartpole_tpu.mpc.poke import POKE_FORCE_SCALE
from cartpole_tpu.utils import tracing
from cartpole_tpu.web import WebApp
from cartpole_tpu.web.page import PAGE_HTML


def _make_app(**kw):
    loop = InteractiveLoop(
        params=OptimizationParams(max_iterations=4, state_spacing=5),
        render=False,
        **kw,
    )
    return WebApp(loop=loop, realtime=False)


@pytest.fixture(scope="module")
def served():
    """One live server (port 0 = ephemeral) shared by the HTTP tests."""
    app = _make_app()
    host, port = app.start("127.0.0.1", 0)
    yield app, f"http://{host}:{port}"
    app.stop()


def _get(base, path):
    with urllib.request.urlopen(base + path, timeout=30) as r:
        return r.status, r.read()


def _post(base, path, payload):
    req = urllib.request.Request(
        base + path, data=json.dumps(payload).encode(), method="POST"
    )
    try:
        with urllib.request.urlopen(req, timeout=120) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


class TestSnapshot:
    def test_initial_state_hangs_down(self):
        app = _make_app()
        s = app.snapshot()
        assert s["model"] == "single"
        assert s["tick"] == 0
        assert s["x"][1] == pytest.approx(-math.pi / 2)
        assert s["enabled"] is True
        assert len(s["lengths"]) == 1
        assert len(s["masses"]) == 2  # base + pole tip
        assert s["optimization"]["window_length"] == 40

    def test_tick_populates_prediction_and_plots(self):
        app = _make_app()
        app.step_ticks(3)
        s = app.snapshot()
        assert s["tick"] == 3
        pred = np.asarray(s["predicted"])
        assert pred.shape == (40, 4)  # (window_length, state_dim)
        assert np.isfinite(pred).all()
        for name in ("control", "angle", "speed"):
            assert len(s["plots"][name]["t"]) == 3
        # Controller is pushing: u0 recorded in the control plot.
        assert s["plots"]["control"]["y"][-1] == s["u0"]

    def test_double_model_snapshot(self):
        from cartpole_tpu.models.base import DOUBLE_CARTPOLE

        loop = InteractiveLoop(
            params=OptimizationParams(
                max_iterations=2, state_spacing=10, window_length=20
            ),
            render=False,
            model=DOUBLE_CARTPOLE,
        )
        app = WebApp(loop=loop, realtime=False)
        app.step_ticks(1)
        s = app.snapshot()
        assert s["model"] == "double"
        assert len(s["lengths"]) == 2
        assert len(s["masses"]) == 3  # base + two link tips
        # The double model has no springs/friction/drag: the page must
        # tolerate the absent fields (wallX fallback + hidden sliders).
        assert "x_s" not in s["dynamics"]
        assert np.asarray(s["predicted"]).shape == (20, 6)

    def test_mass_locations_follow_kinematics(self):
        app = _make_app()
        s = app.snapshot()
        base, tip = s["masses"]
        l1 = s["lengths"][0]
        th = s["x"][1]
        assert tip[0] == pytest.approx(base[0] + l1 * math.cos(th))
        assert tip[1] == pytest.approx(l1 * math.sin(th))


class TestMutations:
    def test_poke_applies_10x_mass_force(self):
        app = _make_app()
        app.poke(1, 0.0)  # pole mass, angle 0 -> force (-10*m_1, 0)
        f = np.asarray(app.snapshot()["forces"])
        m_1 = app.snapshot()["dynamics"]["m_1"]
        assert f[1, 0] == pytest.approx(-POKE_FORCE_SCALE * m_1)
        assert f[1, 1] == pytest.approx(0.0, abs=1e-12)
        # Forces decay after ticks (tau = 0.1 s).
        app.step_ticks(2)
        f2 = np.asarray(app.snapshot()["forces"])
        assert abs(f2[1, 0]) < abs(f[1, 0])

    def test_dynamics_update_no_rebuild(self):
        app = _make_app()
        mpc_before = app.loop.mpc
        app.set_dynamics(m_1=0.25)
        assert app.snapshot()["dynamics"]["m_1"] == pytest.approx(0.25)
        assert app.loop.mpc is mpc_before  # jit argument, no rebuild

    def test_optimization_update_rebuilds(self):
        app = _make_app()
        mpc_before = app.loop.mpc
        app.set_optimization(th_final_cost_weight=120.0)
        assert app.loop.mpc is not mpc_before
        assert app.snapshot()["optimization"]["th_final_cost_weight"] == 120.0
        # Equality convention: negative weight.
        app.set_optimization(th_final_cost_weight=-1.0)
        assert app.snapshot()["optimization"]["th_final_cost_weight"] == -1.0

    def test_unknown_fields_rejected(self):
        app = _make_app()
        with pytest.raises(ValueError, match="unknown dynamics"):
            app.set_dynamics(bogus=1.0)
        with pytest.raises(ValueError, match="unknown optimization"):
            app.set_optimization(bogus=1.0)

    def test_explicit_loop_plus_kwargs_rejected(self):
        loop = InteractiveLoop(
            params=OptimizationParams(max_iterations=2), render=False
        )
        with pytest.raises(TypeError, match="loop_kwargs"):
            WebApp(loop=loop, sim_rate=0.5)

    def test_window_length_change_resizes_plot_rings(self):
        app = _make_app()
        app.step_ticks(1)
        old_len = app._plots["control"].maxlen
        app.set_optimization(window_length=20)
        assert app._plots["control"].maxlen != old_len
        # History survives the resize; ticking keeps appending.
        assert len(app._plots["control"]) == 1
        app.step_ticks(1)
        assert len(app._plots["control"]) == 2

    def test_toggle_and_reset(self):
        app = _make_app()
        app.step_ticks(2)
        app.set_control(enabled=False)
        s = app.snapshot()
        assert s["enabled"] is False and s["predicted"] is None
        app.step_ticks(1)
        assert app.snapshot()["u0"] == 0.0  # control not applied
        app.set_control(enabled=True)  # re-enable resets warm start
        assert app.snapshot()["enabled"] is True
        app.set_control(sim_rate=0.5, set_point=0.3)
        s = app.snapshot()
        assert s["sim_rate"] == 0.5 and s["set_point"] == 0.3
        app.reset()
        assert app.snapshot()["x"][1] == pytest.approx(-math.pi / 2)


class TestHTTP:
    def test_page_serves(self, served):
        _, base = served
        status, body = _get(base, "/")
        assert status == 200
        html = body.decode()
        # The UI ids the reference page wires up (application.ts:208-365).
        for el in (
            "cartPoleCanvas", "controlPlot", "anglePlot", "speedPlot",
            "enableControllerCheckbox", "simRateSlider",
            "baseMassSlider", "cartSetPointSlider",
            "thetaCostSlider", "thetaCostCheckbox",
            "saveLogButton", "saveTracesButton",
        ):
            assert el in html

    def test_state_tick_poke_roundtrip(self, served):
        app, base = served
        status, _ = _post(base, "/tick", {"n": 2})
        assert status == 200
        status, body = _get(base, "/state")
        s = json.loads(body)
        assert status == 200 and s["tick"] >= 2
        status, _ = _post(
            base, "/poke", {"mass_index": 0, "incident_angle": math.pi}
        )
        assert status == 200
        f = np.asarray(json.loads(_get(base, "/state")[1])["forces"])
        assert f[0, 0] > 0  # +x force at the base (cos(pi) flips sign)

    def test_param_endpoints(self, served):
        app, base = served
        status, _ = _post(base, "/dynamics", {"m_1": 0.3})
        assert status == 200
        status, _ = _post(base, "/control", {"set_point": -0.2})
        assert status == 200
        s = json.loads(_get(base, "/state")[1])
        assert s["dynamics"]["m_1"] == pytest.approx(0.3)
        assert s["set_point"] == -0.2
        status, err = _post(base, "/dynamics", {"nope": 1.0})
        assert status == 400 and "unknown" in err["error"]
        status, err = _post(base, "/nope", {})
        assert status == 404
        # Non-object JSON bodies get a clean 400, not a dropped connection.
        status, err = _post(base, "/control", [1, 2, 3])
        assert status == 400 and "JSON object" in err["error"]

    def test_malformed_bodies_get_structured_400s(self, served):
        """Route bodies are schema-checked (the typed boundary the
        reference's embind gives it, wasm.cc:30-43): missing/typo'd/
        mistyped fields come back as descriptive 400s, not raw KeyError
        reprs like "'mass_index'"."""
        app, base = served
        # /poke: missing required field — names the field and the route.
        status, err = _post(base, "/poke", {"incident_angle": 0.0})
        assert status == 400
        assert "missing required field 'mass_index'" in err["error"]
        assert err["error"] != "'mass_index'"
        # /poke: wrong type.
        status, err = _post(
            base, "/poke", {"mass_index": "zero", "incident_angle": 0.0}
        )
        assert status == 400 and "must be a number" in err["error"]
        # /poke: unknown extra field.
        status, err = _post(
            base, "/poke",
            {"mass_index": 0, "incident_angle": 0.0, "massIndex": 1},
        )
        assert status == 400 and "unknown fields" in err["error"]
        # /dynamics: non-numeric value.
        status, err = _post(base, "/dynamics", {"m_1": "heavy"})
        assert status == 400 and "must be a number" in err["error"]
        # /optimization: unknown field (already covered) + bad value type.
        status, err = _post(base, "/optimization", {"window_length": -3})
        assert status == 400
        # /control: boolean field with non-boolean value.
        status, err = _post(base, "/control", {"enabled": "yes"})
        assert status == 400 and "must be a boolean" in err["error"]
        # /control: unknown field.
        status, err = _post(base, "/control", {"sim_rat": 0.5})
        assert status == 400 and "unknown fields" in err["error"]
        # /tick: non-integer and out-of-range n.
        status, err = _post(base, "/tick", {"n": 1.5})
        assert status == 400 and "integer" in err["error"]
        status, err = _post(base, "/tick", {"n": 0})
        assert status == 400 and ">= 1" in err["error"]
        # /reset: any field is unknown.
        status, err = _post(base, "/reset", {"hard": True})
        assert status == 400 and "unknown fields" in err["error"]
        # Invalid JSON body.
        import urllib.request as _ur

        req = _ur.Request(
            base + "/poke", data=b"{not json", method="POST"
        )
        try:
            with _ur.urlopen(req, timeout=30) as r:
                status = r.status
        except urllib.error.HTTPError as e:
            status, err = e.code, json.loads(e.read())
        assert status == 400 and "not valid JSON" in err["error"]
        # The loop survives all of the above.
        status, _ = _post(base, "/tick", {"n": 1})
        assert status == 200

    def test_log_and_traces_endpoints(self, served):
        app, base = served
        _post(base, "/tick", {"n": 1})
        status, body = _get(base, "/log")
        entries = json.loads(body)
        assert status == 200 and isinstance(entries, list) and entries
        # Same JSON shape as the reference log (wasm.cc:46-65 fields).
        assert "u" in entries[-1] and "predicted_states" in entries[-1]
        tracing.set_tracing_enabled(True)
        try:
            with tracing.trace_scope("web-test"):
                pass
            status, body = _get(base, "/traces")
            trace = json.loads(body)
            assert status == 200
            assert any(ev["name"] == "web-test" for ev in trace["traceEvents"])
        finally:
            tracing.set_tracing_enabled(False)


class TestRealtimeThread:
    def test_ticks_advance_in_realtime_mode(self):
        import time

        loop = InteractiveLoop(
            params=OptimizationParams(max_iterations=2, state_spacing=10),
            render=False, sim_rate=1.0,
        )
        app = WebApp(loop=loop, realtime=True)
        app.start("127.0.0.1", 0)
        try:
            loop.tick()  # compile before timing the thread
            start = loop.tick_count
            deadline = time.time() + 10.0
            while loop.tick_count == start and time.time() < deadline:
                time.sleep(0.05)
            assert loop.tick_count > start
        finally:
            app.stop()


def test_page_html_is_selfcontained():
    # No external scripts/styles: the page must work with zero egress.
    assert "http://" not in PAGE_HTML and "https://" not in PAGE_HTML
    assert "<script src" not in PAGE_HTML


def test_leak_endpoint(served):
    _, base = served
    status, body = _get(base, "/leak")
    report = json.loads(body)
    assert status == 200
    assert {"count", "nbytes", "by_shape"} <= set(report)
    assert report["nbytes"] > 0  # the loop's warm-start state is live


def test_tick_thread_error_surfaces_in_state():
    """A raising tick must not silently kill the realtime thread: the
    error shows up in the snapshot and the thread stays alive."""
    import time

    loop = InteractiveLoop(
        params=OptimizationParams(max_iterations=2, state_spacing=10),
        render=False,
    )
    app = WebApp(loop=loop, realtime=True)
    boom = RuntimeError("injected tick failure")
    original_tick = loop.tick

    def failing_tick():
        raise boom

    app.start("127.0.0.1", 0)
    try:
        deadline = time.time() + 10.0
        while loop.tick_count == 0 and time.time() < deadline:
            time.sleep(0.05)
        assert loop.tick_count > 0  # thread is ticking
        loop.tick = failing_tick
        deadline = time.time() + 10.0
        while app.snapshot()["error"] is None and time.time() < deadline:
            time.sleep(0.05)
        assert "injected tick failure" in app.snapshot()["error"]
        # Recovery: restore the tick, the thread resumes and clears it.
        loop.tick = original_tick
        deadline = time.time() + 15.0
        while app.snapshot()["error"] is not None and time.time() < deadline:
            time.sleep(0.1)
        assert app.snapshot()["error"] is None
    finally:
        app.stop()
