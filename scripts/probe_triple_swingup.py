"""Probe: triple-pendulum swing-up from hang (VERDICT r3 item 6).

The triple model (beyond the reference's roadmap) stabilizes near upright
(`tests/test_triple.py`) but has never swung up from hang. Template: the
double's swing-up configuration (f64, hard terminal equalities, longer
window, raised force limit — `tests/test_double_mpc.py::
test_swingup_closed_loop`). This probe tries a small ladder of
window/force configurations and records the end state of each attempt in
``triple_swingup.json`` — either a working recipe for a swing-up test, or
the measured region-of-attraction negative PARITY asks for.

CPU, f64: run with ``python scripts/probe_triple_swingup.py``.
"""

import json
import math
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "triple_swingup.json",
)

UP = math.pi / 2

CONFIGS = [
    dict(window_length=60, u_limit=600.0, ticks=300),
    dict(window_length=80, u_limit=600.0, ticks=400),
    dict(window_length=80, u_limit=1000.0, ticks=400),
    dict(window_length=100, u_limit=1000.0, ticks=500),
]


def main():
    from cartpole_tpu import (
        OptimizationParams, default_triple_params, get_model, make_mpc,
        run_closed_loop,
    )

    model = get_model("triple")
    dp = default_triple_params(jnp.float64)
    results = []
    only = sys.argv[1:] and int(sys.argv[1])
    for i, cfg in enumerate(CONFIGS):
        if only and i != only - 1:
            continue
        ticks = cfg.pop("ticks")
        params = OptimizationParams(
            max_iterations=10, state_spacing=5, **cfg
        )
        mpc = make_mpc(params, model)
        x0 = jnp.array([0.0, -UP, -UP, -UP, 0.0, 0.0, 0.0, 0.0])
        t0 = time.time()
        res = jax.jit(lambda x: run_closed_loop(mpc, x, dp, ticks))(x0)
        xf = np.asarray(res.final_state)
        term = np.asarray(res.termination_states)
        ang_err = [float(abs(xf[k] - UP)) for k in (1, 2, 3)]
        vel = [float(abs(v)) for v in xf[4:]]
        row = {
            **cfg, "ticks": ticks,
            "final_angle_err": [round(a, 4) for a in ang_err],
            "final_vel": [round(v, 4) for v in vel],
            "upright": bool(max(ang_err) < 5e-2),
            "n_failed": int(np.sum((term == 3) | (term == 4))),
            "max_lambda_frac": round(float(np.mean(term == 3)), 4),
            "wall_s": round(time.time() - t0, 1),
        }
        results.append(row)
        print(json.dumps(row), flush=True)
        with open(OUT, "w") as f:
            json.dump(results, f, indent=1)
        if row["upright"]:
            break
    return 0


if __name__ == "__main__":
    sys.exit(main())
