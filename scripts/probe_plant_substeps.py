"""Probe the non-solver slice of the closed-loop tick (VERDICT r2 item 6).

The bench tick (solve + plant + warm-start bookkeeping) measured 6.9-7.1 ms
at batch 4096 vs a 6.45 ms solver phase-sum — this probe attributes the
remainder. Times, with the dispatch-free two-point method of
scripts/phase_timing.py:

  - the FULL closed-loop tick body (step_lanes + simulator_step_lanes);
  - step_lanes alone (the solve);
  - simulator_step_lanes alone (10x 1 kHz RK4 substeps, rows layout), and
    the same chain at scan unroll 1/2/5/10 to see if the default
    (rollout_rows unroll=4) leaves anything on the table.

Usage: python scripts/probe_plant_substeps.py [--batch 4096] [--reps 20]
"""

import argparse
import math
import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
import numpy as np

_CACHE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"
)
jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

from phase_timing import _timed  # noqa: E402  (scripts dir on sys.path)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--reps", type=int, default=20)
    args = ap.parse_args()

    from cartpole_tpu import (
        OptimizationParams, default_single_params, make_mpc,
    )
    from cartpole_tpu.mpc.controller import MPCState
    from cartpole_tpu.mpc.lanes import simulator_step_lanes, step_lanes
    from cartpole_tpu.ops.lanes import rollout_rows

    dtype = jnp.float32
    B = args.batch
    mpc = make_mpc(OptimizationParams(
        max_iterations=8, state_spacing=5, kkt_method="condensed"
    ))
    dp = default_single_params(dtype)
    rng = np.random.RandomState(0)
    x0 = np.tile(np.array([0.0, -math.pi / 2, 0.0, 0.0]), (B, 1))
    x0[:, 0] += rng.uniform(-0.5, 0.5, B)
    x0[:, 1] += rng.uniform(-0.5, 0.5, B)
    x_lanes = jnp.asarray(x0, dtype).T  # (sd, B)
    u = jnp.asarray(rng.uniform(-5, 5, B), dtype)
    sp_ = jnp.zeros((B,), dtype)
    st0 = MPCState(
        previous_solution=jnp.zeros((B, mpc.spec.dim), dtype),
        warm=jnp.ones((B,), bool),
    )

    with jax.default_matmul_precision("float32"):
        # Full tick (solve + plant), the closed-loop body.
        def tick(st, x):
            out, st2 = step_lanes(mpc, st, x.T, dp, sp_)
            x2 = simulator_step_lanes(
                dp, x, mpc.params.control_dt, out.u[:, 0], model=mpc.model
            )
            return (st2, x2)

        t_tick = _timed(tick, (st0, x_lanes), 2, "tick (solve+plant)")

        # Solve only.
        def solve_only(st, x):
            out, st2 = step_lanes(mpc, st, x.T, dp, sp_)
            return (st2, x + 0.0 * jnp.sum(out.u[:, 0]))

        t_solve = _timed(solve_only, (st0, x_lanes), 2, "step_lanes only")

        # Plant substeps only (product path: rows layout, unroll=4).
        def plant(x, u_):
            x2 = simulator_step_lanes(
                dp, x, mpc.params.control_dt, u_, model=mpc.model
            )
            return (x2, u_)

        t_plant = _timed(plant, (x_lanes, u), args.reps, "plant (product)")

        # Unroll variants of the 10-substep chain.
        core = mpc.model.dynamics_core
        angle = mpc.model.angle_indices
        fr = lambda xr, u_: core(dp, xr, u_)
        for unroll in (1, 2, 5, 10):
            def plant_u(x, u_, _unroll=unroll):
                rows = tuple(x[i] for i in range(x.shape[0]))
                rows = rollout_rows(
                    fr, rows, jnp.broadcast_to(u_, (10,) + u_.shape),
                    1.0e-3, angle, unroll=_unroll,
                )
                return (jnp.stack(rows), u_)

            _timed(plant_u, (x_lanes, u), args.reps,
                   f"plant unroll={unroll}")

    print()
    print(f"tick - solve = {1e3 * (t_tick - t_solve):7.3f} ms "
          f"(plant+bookkeeping inside the tick)")
    print(f"plant alone  = {1e3 * t_plant:7.3f} ms")


if __name__ == "__main__":
    sys.exit(main())
