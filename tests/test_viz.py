"""Offline renderer — frame composition invariants of the canvas-renderer
analog (``/root/reference/viz/src/renderer.ts``): every drawn configuration
must fit inside the axes limits, in particular the canonical hanging start
state of the swing-up demos."""

import math

from conftest import require_or_skip

matplotlib = require_or_skip("matplotlib")
matplotlib.use("Agg")

import numpy as np  # noqa: E402

from cartpole_tpu.viz import animate_closed_loop, draw_frame, strip_charts  # noqa: E402

DOWN = np.array([0.0, -math.pi / 2, 0.0, 0.0])
DOWN_DOUBLE = np.array([0.0, -math.pi / 2, -math.pi / 2, 0.0, 0.0, 0.0])


def _lowest_drawn_y(state, lengths):
    """Forward-kinematics minimum y of the drawn scene (pivot at cart top)."""
    pivot_y = 0.025 + 0.1  # _WHEEL_R + _CART_H
    y = pivot_y
    lo = 0.0
    for i, length in enumerate(lengths):
        y = y + length * math.sin(state[1 + i])
        lo = min(lo, y)
    return lo


class TestFrameLimits:
    def test_hanging_single_pole_inside_frame(self):
        ax = draw_frame(DOWN, lengths=(0.25,))
        lo, hi = ax.get_ylim()
        assert lo <= _lowest_drawn_y(DOWN, (0.25,)) - 0.02
        assert hi >= 0.125 + 0.25  # upright tip stays visible too
        ax.figure.clf()

    def test_hanging_double_pole_inside_frame(self):
        lengths = (0.25, 0.25)
        ax = draw_frame(DOWN_DOUBLE, lengths=lengths)
        lo, _ = ax.get_ylim()
        assert lo <= _lowest_drawn_y(DOWN_DOUBLE, lengths) - 0.02
        ax.figure.clf()

    def test_ghosts_and_force_arrow(self, tmp_path):
        preds = np.tile(DOWN, (40, 1))
        out = tmp_path / "frame.png"
        draw_frame(DOWN, predicted_states=preds, force=50.0,
                   save_to=str(out))
        assert out.stat().st_size > 0


class _FakeResult:
    def __init__(self, states, controls):
        self.states = states
        self.controls = controls


class TestAnimationAndCharts:
    def test_animation_covers_hanging_phase(self, tmp_path):
        t = np.linspace(0.0, 1.0, 6)
        states = np.stack(
            [np.zeros_like(t), -math.pi / 2 + t * math.pi,
             np.zeros_like(t), np.zeros_like(t)], axis=1
        )
        res = _FakeResult(states, np.zeros(len(t)))
        out = tmp_path / "anim.gif"
        animate_closed_loop(res, stride=1, save_to=str(out))
        assert out.stat().st_size > 0

    def test_strip_charts_smoke(self, tmp_path):
        states = np.tile(DOWN, (10, 1))
        res = _FakeResult(states, np.linspace(-1, 1, 10))
        out = tmp_path / "charts.png"
        strip_charts(res, save_to=str(out))
        assert out.stat().st_size > 0
