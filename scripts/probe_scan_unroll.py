"""Probe: does unrolling the GN-iteration / closed-loop-tick scans help?

The rollout scans have a tuned ``unroll`` already (``probe_unroll.py``);
the GN-iteration scan (8 trips, ``mpc/lanes.py``) and the tick scan
(20-50 trips) run at the default unroll=1. This probe wraps
``jax.lax.scan`` so calls WITHOUT an explicit ``unroll`` get a chosen
value, then times the bench program (batch 4096, 20 ticks) per setting.

Run on the chip: ``python scripts/probe_scan_unroll.py``
"""

import argparse
import math
import sys
import time

import jax
import numpy as np

sys.path.insert(0, ".")


def timed(run, x0s, sps, st0, reps=3):
    def once():
        t0 = time.perf_counter()
        res = run(x0s, sps, st0)
        np.asarray(res.final_state[:4])  # host-transfer sync (CLAUDE.md)
        return time.perf_counter() - t0

    once()  # compile
    return min(once() for _ in range(reps))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--ticks", type=int, default=20)
    ap.add_argument("--unrolls", type=int, nargs="+", default=[1, 2, 4])
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp

    from cartpole_tpu import OptimizationParams, default_single_params, make_mpc
    from cartpole_tpu.mpc.lanes import run_closed_loop_lanes
    from cartpole_tpu import MPCState

    orig_scan = jax.lax.scan

    def make_patched(unroll):
        def scan(*a, **kw):
            if "unroll" not in kw:
                kw["unroll"] = unroll
            return orig_scan(*a, **kw)

        return scan

    dtype = jnp.float32
    dp = default_single_params(dtype)
    mpc = make_mpc(OptimizationParams(max_iterations=8, state_spacing=5))
    rng = np.random.RandomState(0)
    x0s = np.tile(np.array([0.0, -math.pi / 2, 0.0, 0.0]), (args.batch, 1))
    x0s[:, 0] += rng.uniform(-0.5, 0.5, args.batch)
    x0s[:, 1] += rng.uniform(-0.5, 0.5, args.batch)
    x0s = jnp.asarray(x0s, dtype)
    sps = jnp.zeros((args.batch,), dtype)
    st0 = MPCState(
        previous_solution=jnp.zeros((args.batch, mpc.spec.dim), dtype),
        warm=jnp.zeros((args.batch,), bool),
    )

    for unroll in args.unrolls:
        jax.lax.scan = make_patched(unroll)
        try:
            run = jax.jit(
                lambda x, s, st: run_closed_loop_lanes(
                    mpc, x, dp, args.ticks, s, mpc_state=st
                )
            )
            best = timed(run, x0s, sps, st0)
            print(
                f"default-unroll={unroll}: {best * 1e3:8.1f} ms "
                f"({args.batch * args.ticks / best:,.0f} solves/s)",
                flush=True,
            )
        finally:
            jax.lax.scan = orig_scan


if __name__ == "__main__":
    main()
