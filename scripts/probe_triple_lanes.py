"""Diagnose tests/test_triple.py::test_lanes_path_matches_and_stabilizes.

Runs the SAME initial states through the vmapped reference path and the
batch-in-lanes condensed path on the triple model (CPU f64, the test's
environment) and prints per-tick max state deltas plus both final states,
to tell a lanes-path bug (early, large divergence) apart from a
region-of-attraction / chaos problem (both paths fail, or late split).

Usage: python scripts/probe_triple_lanes.py [--ticks 60]
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

from cartpole_tpu import (
    TRIPLE_CARTPOLE,
    OptimizationParams,
    default_triple_params,
    make_mpc,
    run_closed_loop,
    run_closed_loop_lanes,
)

UP = np.pi / 2


def _params():
    # EXACTLY tests/test_triple.py::_stabilization_params
    return OptimizationParams(
        max_iterations=10,
        state_spacing=5,
        window_length=60,
        th_final_cost_weight=150.0,
        th_dot_final_cost_weight=10.0,
        b_x_dot_final_cost_weight=10.0,
        u_guess_sinusoid_amplitude=0.0,
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ticks", type=int, default=60)
    ap.add_argument("--chunk", type=int, default=10)
    args = ap.parse_args()

    mpc = make_mpc(_params(), TRIPLE_CARTPOLE)
    dp = default_triple_params(jnp.float64)
    rng = np.random.RandomState(11)
    B = 4
    x0s = np.tile(np.array([0.0, UP, UP, UP, 0.0, 0.0, 0.0, 0.0]), (B, 1))
    x0s[:, 1:4] += rng.uniform(-0.06, 0.06, (B, 3))
    x0s = jnp.asarray(x0s)

    vmapped = jax.jit(
        jax.vmap(lambda x: run_closed_loop(mpc, x, dp, args.chunk)),
        static_argnums=(),
    )
    lanes = jax.jit(lambda x: run_closed_loop_lanes(mpc, x, dp, args.chunk))

    xv = x0s
    xl = x0s
    stv = stl = None
    t0 = time.time()
    for tick in range(0, args.ticks, args.chunk):
        if stv is None:
            rv = vmapped(xv)
            rl = lanes(xl)
        else:
            rv = jax.jit(jax.vmap(
                lambda x, s: run_closed_loop(
                    mpc, x, dp, args.chunk, mpc_state=s)
            ))(xv, stv)
            rl = jax.jit(lambda x, s: run_closed_loop_lanes(
                mpc, x, dp, args.chunk, mpc_state=s))(xl, stl)
        xv, stv = rv.final_state, rv.final_mpc_state
        xl, stl = rl.final_state, rl.final_mpc_state
        d = np.abs(np.asarray(xv) - np.asarray(xl)).max()
        term_v = np.asarray(rv.termination_states)
        term_l = np.asarray(rl.termination_states)
        print(
            f"tick {tick + args.chunk:4d}: |xv-xl|max {d:9.3e}  "
            f"vmap th {np.abs(np.asarray(xv)[:, 1:4] - UP).max():7.4f}  "
            f"lanes th {np.abs(np.asarray(xl)[:, 1:4] - UP).max():7.4f}  "
            f"[{time.time() - t0:5.0f}s]",
            flush=True,
        )
        del term_v, term_l
    print("final vmap :", np.asarray(xv).round(4))
    print("final lanes:", np.asarray(xl).round(4))


if __name__ == "__main__":
    main()
