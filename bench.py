"""Headline benchmark: batched MPC solves/s on one chip.

Measures the BASELINE.json single-chip config — 4096 swing-up scenarios
vmapped into one XLA program, receding-horizon stepping with on-device
warm-start carry — and prints ONE JSON line.

Baseline anchor: the reference publishes no numbers (BASELINE.md); its
implied budget is one MPC solve per 10 ms control tick on a single
browser/WASM thread (``optimization.hpp:14``, ``application.ts:393-399``),
i.e. 100 solves/s. ``vs_baseline`` is solves/s relative to that.

Usage: python bench.py [--batch 4096] [--ticks 20] [--reps 3] [--f64]
"""

import argparse
import json
import math
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

BASELINE_SOLVES_PER_S = 100.0  # 1 solve / 10 ms real-time budget, 1 thread.


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--ticks", type=int, default=20,
                    help="receding-horizon steps timed per repetition")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--f64", action="store_true",
                    help="parity precision instead of the f32 fast path")
    args = ap.parse_args(argv)

    if args.f64:
        jax.config.update("jax_enable_x64", True)
    dtype = jnp.float64 if args.f64 else jnp.float32

    from cartpole_tpu import (
        OptimizationParams,
        default_single_params,
        make_mpc,
    )
    from cartpole_tpu.parallel import (
        make_scenario_mesh,
        make_sharded_step,
        shard_scenarios,
    )

    dev = jax.devices()[0]
    mpc = make_mpc(OptimizationParams())  # reference defaults: 60 vars, 8 iters
    dynamics_params = jax.tree.map(
        lambda v: jax.device_put(v), default_single_params(dtype)
    )

    n = args.batch
    mesh = make_scenario_mesh(jax.devices()[:1])  # single-chip headline number
    rng = np.random.RandomState(0)
    x0s_np = np.tile(np.array([0.0, -math.pi / 2, 0.0, 0.0]), (n, 1))
    x0s_np[:, 0] += rng.uniform(-0.5, 0.5, n)
    x0s_np[:, 1] += rng.uniform(-0.5, 0.5, n)
    x0s = shard_scenarios(jnp.asarray(x0s_np, dtype), mesh)
    set_points = shard_scenarios(jnp.zeros((n,), dtype), mesh)
    states = shard_scenarios(
        jax.vmap(lambda _: mpc.init_state(dtype))(jnp.arange(n)), mesh
    )

    step = make_sharded_step(mpc, mesh, donate_state=True)

    # Warm-up: compile + settle into steady-state warm-started solves (the
    # receding-horizon regime the 10 ms budget applies to).
    for _ in range(3):
        outputs, states, diag = step(states, x0s, dynamics_params, set_points)
    jax.block_until_ready(states)

    best = math.inf
    for _ in range(args.reps):
        t0 = time.perf_counter()
        for _ in range(args.ticks):
            outputs, states, diag = step(states, x0s, dynamics_params, set_points)
        jax.block_until_ready(states)
        best = min(best, time.perf_counter() - t0)

    solves = n * args.ticks
    solves_per_s = solves / best
    latency_ms = best / args.ticks * 1e3  # full-batch tick latency

    result = {
        "metric": "batched_mpc_solves_per_s_per_chip",
        "value": round(solves_per_s, 1),
        "unit": "solves/s",
        "vs_baseline": round(solves_per_s / BASELINE_SOLVES_PER_S, 2),
        "batch": n,
        "tick_latency_ms": round(latency_ms, 3),
        "dtype": str(dtype.__name__ if hasattr(dtype, "__name__") else dtype),
        "device": str(dev.platform),
        "n_failed": int(diag.n_failed),
    }
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
