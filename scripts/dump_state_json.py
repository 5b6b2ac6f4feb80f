"""Dump one REAL ``/state`` snapshot (``web/server.py::WebApp.snapshot``)
as JSON on stdout — the canned payload for ``scripts/page_js_harness.js``,
so the node-executed front end polls exactly what the live server serves
(schema drift between server and harness is impossible by construction).

Runs a couple of real control ticks first so the plot rings and predicted
window are populated. CPU, f32, tiny iteration budget: ~20 s.
"""

import json
import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import jax

jax.config.update("jax_platforms", "cpu")


def main() -> int:
    from cartpole_tpu import OptimizationParams
    from cartpole_tpu.web.server import WebApp, _json_finite

    app = WebApp(
        realtime=False,
        params=OptimizationParams(state_spacing=5, max_iterations=3),
    )
    for _ in range(3):
        app.tick()
    json.dump(_json_finite(app.snapshot()), sys.stdout)
    return 0


if __name__ == "__main__":
    sys.exit(main())
