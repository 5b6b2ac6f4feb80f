"""Probe: scan-unroll sweep for the SoA rollouts on the chip.

The scanned rows rollouts trade kernel-launch overhead (one dispatch
chain per scan iteration) against trace/compile size (body x unroll).
Times the window rollout (K steps) and the folded line-search segment
rollout at several unroll factors with the dispatch-cancelling slope
method.

Usage: python scripts/probe_unroll.py [--batch 4096]
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


def _timed(fn, args, inner, label):
    def scanned(n):
        def body(carry, _):
            return fn(*carry), None

        def run(*a):
            out, _ = jax.lax.scan(body, a, None, length=n)
            return out

        return jax.jit(run)

    times = {}
    for n in (inner, 3 * inner):
        f = scanned(n)
        out = f(*args)
        np.asarray(jax.tree.leaves(out)[0]).ravel()[:4]
        best = math.inf
        for _ in range(3):
            t0 = time.perf_counter()
            out = f(*args)
            np.asarray(jax.tree.leaves(out)[0]).ravel()[:4]
            best = min(best, time.perf_counter() - t0)
        times[n] = best
    per = (times[3 * inner] - times[inner]) / (2 * inner)
    print(f"{label:40s} {per*1e3:9.3f} ms/call", flush=True)
    return per


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--reps", type=int, default=20)
    args = ap.parse_args()

    from cartpole_tpu import default_single_params
    from cartpole_tpu.models.base import SINGLE_CARTPOLE
    from cartpole_tpu.ops.lanes import (
        rollout_rows,
        segment_rollout_with_jac_scan,
    )

    dtype = jnp.float32
    B = args.batch
    K, S, sp = 40, 8, 5
    dp = default_single_params(dtype)
    rng = np.random.RandomState(0)
    model = SINGLE_CARTPOLE
    fr = lambda xr, u_: model.dynamics_core(dp, xr, u_)
    fj = lambda xr, u_: model.dynamics_jac_core(dp, xr, u_)

    xw = tuple(jnp.asarray(rng.uniform(-1, 1, B), dtype) for _ in range(4))
    uw = jnp.asarray(rng.uniform(-5, 5, (K, B)), dtype)
    M = 5 * S * B  # folded LS lanes
    xs = tuple(jnp.asarray(rng.uniform(-1, 1, M), dtype) for _ in range(4))
    us = jnp.asarray(rng.uniform(-5, 5, (sp, M)), dtype)
    Mj = S * B
    xj = tuple(jnp.asarray(rng.uniform(-1, 1, Mj), dtype) for _ in range(4))
    uj = jnp.asarray(rng.uniform(-5, 5, (sp, Mj)), dtype)

    for unroll in (1, 2, 4, 8, 40):
        def roll(x0, u0, _n=unroll):
            out = rollout_rows(fr, x0, u0, 0.01, (1,), unroll=_n)
            return (out, u0)

        _timed(roll, (xw, uw), args.reps,
               f"window rollout K={K} unroll={unroll}")

    for unroll in (1, 5):
        def seg(x0, u0, _n=unroll):
            out = rollout_rows(fr, x0, u0, 0.01, (1,), unroll=_n)
            return (out, u0)

        _timed(seg, (xs, us), args.reps,
               f"LS segment rollout T={sp} x5 unroll={unroll}")

    for unroll in (1, 5):
        def jroll(x0, u0, _n=unroll):
            xe, Jx, Ju = segment_rollout_with_jac_scan(
                fj, x0, u0, 0.01, (1,), unroll=_n
            )
            return (tuple(xe[i] + 0.0 * Jx[0, 0] for i in range(4)), u0)

        _timed(jroll, (xj, uj), args.reps,
               f"jac segment rollout T={sp} unroll={unroll}")


if __name__ == "__main__":
    sys.exit(main())
