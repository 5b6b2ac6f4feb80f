"""TPU probe: lanes vs vmapped condensed closed loop, batch 4096 x 20 ticks.

Run on the real chip: python scripts/probe_lanes_tpu.py [--batch N]
[--ticks T] [--paths lanes,vmap]. Prints per-path wall times (host-transfer
synced — block_until_ready returns early over the tunnel, CLAUDE.md).
"""

import argparse
import math
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import jax
import jax.numpy as jnp
import numpy as np

_CACHE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"
)
jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--ticks", type=int, default=20)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--paths", default="lanes,vmap")
    args = ap.parse_args()

    from cartpole_tpu import (
        OptimizationParams, default_single_params, make_mpc, run_closed_loop,
    )
    from cartpole_tpu.mpc.lanes import run_closed_loop_lanes

    dtype = jnp.float32
    dp = default_single_params(dtype)
    n, ticks = args.batch, args.ticks
    rng = np.random.RandomState(0)
    x0s = np.tile(np.array([0.0, -math.pi / 2, 0.0, 0.0]), (n, 1))
    x0s[:, 0] += rng.uniform(-0.5, 0.5, n)
    x0s[:, 1] += rng.uniform(-0.5, 0.5, n)
    x0s = jnp.asarray(x0s, dtype)
    sps = jnp.zeros((n,), dtype)

    mpc = make_mpc(
        OptimizationParams(
            max_iterations=8, state_spacing=5, kkt_method="condensed"
        )
    )

    runners = {}
    if "lanes" in args.paths:
        runners["lanes"] = jax.jit(
            lambda x, s: run_closed_loop_lanes(mpc, x, dp, ticks, s)
        )
    if "vmap" in args.paths:
        runners["vmap"] = jax.jit(
            jax.vmap(
                lambda x, s: run_closed_loop(mpc, x, dp, ticks, s),
                in_axes=(0, 0),
            )
        )

    for name, run in runners.items():
        t0 = time.perf_counter()
        res = run(x0s, sps)
        np.asarray(res.final_state[:4])
        compile_s = time.perf_counter() - t0
        best = math.inf
        for _ in range(args.reps):
            t0 = time.perf_counter()
            res = run(x0s, sps)
            np.asarray(res.final_state[:4])
            best = min(best, time.perf_counter() - t0)
        term = np.asarray(res.termination_states)
        n_failed = int(np.sum((term == 3) | (term == 4)))
        print(
            f"{name}: compile {compile_s:.1f}s  best {best*1e3:.1f} ms  "
            f"{n*ticks/best:,.0f} solves/s  n_failed={n_failed}",
            flush=True,
        )


if __name__ == "__main__":
    sys.exit(main())
