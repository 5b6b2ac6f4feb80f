"""Roofline table for the lanes MPC tick phases (VERDICT r1 item 6).

Compiles the hot-path phases, pulls XLA's FLOP/byte counts, and prints
them against v5e peaks. Pass measured per-phase times (from
scripts/phase_timing.py on the real chip) to get utilization fractions:

  python scripts/roofline.py [--batch 4096] \
      [--measured cstep_ms,eval_ms,tick_ms]
"""

import argparse
import json
import math
import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)
os.environ.setdefault("XLA_FLAGS", "")

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--measured", default=None,
                    help="cstep_ms,eval_ms,tick_ms from phase_timing.py")
    ap.add_argument("--tpu", action="store_true",
                    help="compile on the TPU backend (default: CPU — the "
                    "op/byte counts are program properties)")
    args = ap.parse_args()
    if not args.tpu:
        jax.config.update("jax_platforms", "cpu")

    from cartpole_tpu import (
        OptimizationParams, default_single_params, make_mpc,
    )
    from cartpole_tpu.mpc.controller import MPCState
    from cartpole_tpu.mpc.lanes import _LanesProblem, _Z, step_lanes
    from cartpole_tpu.ops.lanes import rollout_lanes
    from cartpole_tpu.utils.roofline import roofline_row, xla_cost

    dtype = jnp.float32
    B = args.batch
    mpc = make_mpc(OptimizationParams(
        max_iterations=8, state_spacing=5, kkt_method="condensed"))
    spec = mpc.spec
    dp = default_single_params(dtype)
    rng = np.random.RandomState(0)
    x0 = np.tile(np.array([0.0, -math.pi / 2, 0.0, 0.0]), (B, 1))
    x0[:, 0] += rng.uniform(-0.5, 0.5, B)
    xc = jnp.asarray(x0, dtype).T
    sps = jnp.zeros((B,), dtype)
    problem = _LanesProblem(spec, xc, sps, jnp.zeros((B,), dtype), dp)

    K = spec.window_length
    k = jnp.arange(K, dtype=dtype)
    u0 = 10.0 * jnp.sin(k / K * 2 * math.pi)[:, None] * jnp.ones((1, B), dtype)
    f = lambda a, b: mpc.model.dynamics(dp, a, b)
    _, xs_roll = rollout_lanes(f, xc, u0, 0.01, mpc.model.angle_indices,
                               stack_states=True)
    shoot = jnp.concatenate(
        [xc[:, None, :], xs_roll[:, spec.spacing - 1::spec.spacing, :]],
        axis=1)
    Z0 = _Z(xs=shoot, u=u0)
    lam0 = jnp.zeros((B,), dtype)

    measured = [None, None, None]
    if args.measured:
        measured = [float(v) / 1e3 for v in args.measured.split(",")]

    with jax.default_matmul_precision("float32"):
        rows = [
            roofline_row(
                "condensed_step",
                xla_cost(problem.condensed_step, Z0, lam0),
                measured[0],
            ),
            roofline_row(
                "ls evaluate (1 alpha)",
                xla_cost(problem.evaluate, Z0),
                measured[1],
            ),
        ]
        st = MPCState(
            previous_solution=jnp.zeros((B, spec.dim), dtype),
            warm=jnp.zeros((B,), bool),
        )
        rows.append(
            roofline_row(
                "full MPC tick",
                xla_cost(
                    lambda s, x: step_lanes(mpc, s, x, dp, sps)[0].u,
                    st, jnp.asarray(x0, dtype),
                ),
                measured[2],
            )
        )
    for r in rows:
        print(json.dumps(r))
    tick = rows[-1]
    per_solve_flops = tick["gflops"] * 1e9 / B
    per_solve_bytes = tick["mbytes"] * 1e6 / B
    print(json.dumps({
        "per_solve_kflops": round(per_solve_flops / 1e3, 1),
        "per_solve_kbytes": round(per_solve_bytes / 1e3, 1),
        "batch": B,
    }))


if __name__ == "__main__":
    sys.exit(main())
