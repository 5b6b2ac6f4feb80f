"""Bisect the Mosaic compile fault in the fused GN-iteration kernel.

First on-device compile attempt (2026-08-20) died with a FATAL inside the
TPU compiler: ``Check failed: limits[i] <= dim(i) (5 vs. 1)`` (SIGABRT —
not a Python exception). This probe compiles ONE fused iteration (no
scan, no solve) under a configurable problem so the failing construct can
be bisected: ``--ls N`` (line-search trials), ``--window K``, ``--batch``,
``--tile``, ``--model``.

Usage: python scripts/probe_fused_bisect.py --ls 5 --window 40
"""

import argparse
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import jax
import jax.numpy as jnp

_CACHE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"
)
jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ls", type=int, default=5)
    ap.add_argument("--window", type=int, default=40)
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--tile", type=int, default=512)
    ap.add_argument("--model", default="single")
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--run", action="store_true",
                    help="also execute the compiled iteration once")
    ap.add_argument("--vmem-mb", type=int, default=0,
                    help="pallas CompilerParams vmem_limit_bytes, in MiB")
    ap.add_argument("--stop-after", type=int, default=0,
                    help="early-out after kernel stage N (1=linearize, "
                         "2=condense, 3=kkt, 4=expand, 5=trials)")
    args = ap.parse_args()

    from cartpole_tpu import (
        OptimizationParams, default_double_params, default_single_params,
        default_triple_params, get_model, make_mpc,
    )
    from cartpole_tpu.mpc import lanes as L
    from cartpole_tpu.ops.fused import make_fused_iteration

    dtype = jnp.float32
    model = get_model(args.model)
    mpc = make_mpc(
        OptimizationParams(
            max_iterations=args.iters, state_spacing=5,
            window_length=args.window, kkt_method="condensed",
            max_line_search_iterations=args.ls,
        ),
        model,
    )
    dp = {
        "single": default_single_params,
        "double": default_double_params,
        "triple": default_triple_params,
    }[args.model](dtype)
    B = args.batch
    sd = model.state_dim
    xc = jnp.zeros((sd, B), dtype)
    problem = L._LanesProblem(
        mpc.spec, xc, jnp.zeros((B,), dtype), jnp.zeros((B,), dtype), dp
    )
    it = make_fused_iteration(
        problem, mpc.nls_config, batch_tile=args.tile,
        emulate=False, interpret=False, _stop_after=args.stop_after,
        vmem_limit_bytes=args.vmem_mb * 1024 * 1024 or None,
    )
    Z0 = L._Z(
        xs=jnp.zeros((sd, problem.N, B), dtype),
        u=jnp.zeros((problem.K, B), dtype),
    )
    carry = (
        Z0, jnp.ones((B,), dtype), jnp.ones((B,), dtype),
        jnp.full((B,), jnp.inf, dtype), jnp.zeros((B,), bool),
        jnp.zeros((B,), jnp.int32), jnp.full((B,), jnp.inf, dtype),
    )
    print(f"lowering: ls={args.ls} window={args.window} batch={B} "
          f"tile={args.tile} model={args.model}", flush=True)
    t0 = time.perf_counter()
    lowered = jax.jit(lambda c: it(c, None)).lower(carry)
    print(f"lowered in {time.perf_counter() - t0:.1f}s; compiling ...",
          flush=True)
    t0 = time.perf_counter()
    compiled = lowered.compile()
    print(f"COMPILE OK in {time.perf_counter() - t0:.1f}s", flush=True)
    if args.run:
        import numpy as np
        t0 = time.perf_counter()
        out = compiled(carry)
        np.asarray(out[0][1][:1])
        print(f"RUN OK in {time.perf_counter() - t0:.3f}s", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
