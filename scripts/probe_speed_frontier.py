"""Speed/health frontier: solver effort (GN iterations x line-search
alphas) vs closed-loop health at the bench operating point.

The bench runs the reference-parity solver effort (max_iterations=8,
max_line_search_iterations=5, `optimization.hpp` defaults). The fixed-trip
formulation pays ALL trips for every instance, so cutting trips is a
direct ~linear throughput lever — IF health (n_failed, fraction_upright
over >= 250 ticks) survives. probe_iter_distribution.py showed a batch-wide
early exit cannot skip trips (every tick has an 8-iteration straggler);
this probe asks the orthogonal question: does the straggler actually NEED
its 8th iteration for closed-loop health, or only for the per-solve
tolerance?

Measures, per (iters, ls) config on the single-model swing-up regime
(batch 4096, f32, lanes/condensed — bench.py's headline point):
  - solves/s and tick latency (50-tick chunks, best of reps)
  - n_failed over the full run, fraction_upright at >= 250 ticks
  - final-state quality: median |residual cost| proxy via upright margin

Each config is a separate XLA compile (scan lengths are static); expect
1-6 min per UNCACHED config over the tunnel.

Usage: python scripts/probe_speed_frontier.py [--configs 8x5,6x5,6x3,5x3]
       [--batch 4096] [--ticks 250] [--json speed_frontier.json]
       [--model single]
"""

import argparse
import json
import math
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import jax

_CACHE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"
)
jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

import jax.numpy as jnp
import numpy as np

from bench import DOUBLE_SOFT_OPT_KWARGS, make_x0s

CHUNK = 50  # ticks per compiled program (tunnel-safe, bench default)


def _upright_mask(xf, angle_indices):
    th = np.asarray(xf)[:, list(angle_indices)]
    return np.all(
        np.abs(np.mod(th - math.pi / 2 + math.pi, 2 * math.pi) - math.pi)
        < 0.1,
        axis=1,
    )


def _run_config(model, iters, ls, batch, total_ticks, reps, dtype):
    from cartpole_tpu import (
        MPCState, OptimizationParams, get_model, make_mpc,
    )
    from cartpole_tpu.mpc.lanes import run_closed_loop_lanes

    kwargs = dict(
        max_iterations=iters,
        max_line_search_iterations=ls,
        state_spacing=5,
        kkt_method="condensed",
    )
    if model in ("double", "triple"):
        kwargs.update(DOUBLE_SOFT_OPT_KWARGS)
    mpc = make_mpc(OptimizationParams(**kwargs), get_model(model))
    dp = jax.tree.map(lambda v: jnp.asarray(v, dtype),
                      get_model(model).default_params())
    x = make_x0s(model, batch, dtype)
    sps = jnp.zeros((batch,), dtype)
    st = MPCState(
        previous_solution=jnp.zeros((batch, mpc.spec.dim), dtype),
        warm=jnp.zeros((batch,), bool),
    )
    run = jax.jit(
        lambda x_, st_: run_closed_loop_lanes(
            mpc, x_, dp, CHUNK, sps, mpc_state=st_
        )
    )

    # Warm-up / compile, then timing reps on the cold chunk.
    res = run(x, st)
    np.asarray(res.final_state[:4])
    best = math.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        res = run(x, st)
        np.asarray(res.final_state[:4])
        best = min(best, time.perf_counter() - t0)

    # Health over the full horizon, chunked on the same compiled program.
    n_failed = 0
    xc, stc = x, st
    ticks = 0
    while ticks < total_ticks:
        resc = run(xc, stc)
        xc, stc = resc.final_state, resc.final_mpc_state
        ticks += CHUNK
        term = np.asarray(resc.termination_states)
        n_failed += int(np.sum((term == 3) | (term == 4)))
    m = _upright_mask(xc, mpc.model.angle_indices)
    return {
        "iters": iters,
        "ls": ls,
        "solves_per_s": round(batch * CHUNK / best, 1),
        "tick_latency_ms": round(best / CHUNK * 1e3, 3),
        "n_failed": n_failed,
        "fraction_upright": round(float(m.mean()), 4),
        "health_ticks": ticks,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--configs", default="8x5,7x5,6x5,8x3,6x3,5x3")
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--ticks", type=int, default=250)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--model", default="single",
                    choices=("single", "double", "triple"))
    ap.add_argument("--json", default="speed_frontier.json")
    args = ap.parse_args()

    dtype = jnp.float32
    rows = []
    for spec in args.configs.split(","):
        iters, ls = (int(v) for v in spec.split("x"))
        t0 = time.time()
        row = _run_config(args.model, iters, ls, args.batch, args.ticks,
                          args.reps, dtype)
        row["model"] = args.model
        rows.append(row)
        print(json.dumps(row), f"({time.time()-t0:.0f}s)", flush=True)

    base = rows[0]
    for r in rows[1:]:
        r["speedup_vs_first"] = round(
            r["solves_per_s"] / base["solves_per_s"], 3)
    with open(args.json, "w") as f:
        json.dump({"batch": args.batch, "rows": rows}, f, indent=1)
    print(f"-> {args.json}")


if __name__ == "__main__":
    sys.exit(main())
