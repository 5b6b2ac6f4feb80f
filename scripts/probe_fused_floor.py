"""TPU probe: floor accounting for the fused GN megakernel (VERDICT r4 #4).

Round 4 shipped the fused path at 3.46 ms/tick (batch 4096) with no model
of what bounds it: the 8 kernel launches + HBM carry round-trips per tick,
or in-kernel VPU time? This probe measures the decomposition directly:

1. closed-loop per-tick time of the 8-launch scan path (the round-4
   default) vs the round-5 ``single_launch`` whole-solve kernel (one
   pallas_call per solve, carry resident in VMEM) — the difference IS the
   inter-iteration launch + carry cost, measured rather than modeled;
2. a ``max_iterations=1`` closed loop — isolating one iteration's
   in-kernel time + the per-tick non-solver work (guess fill, predicted
   rollout, plant substeps, warm shift);
3. an analytic HBM-traffic floor for the carry/statics streams (the only
   HBM the fused path touches), against the measured times.

Writes ``fused_floor.json``. The accounting target: explain the measured
tick within ~15% as  T_tick = n_iter * T_iter_kernel + T_launch_carry +
T_rest  (SURVEY §6 speed-of-light mandate for the hot kernels).

Usage: python scripts/probe_fused_floor.py [--batch 4096] [--ticks 50]
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
import jax.numpy as jnp
import numpy as np

_CACHE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"
)
jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "fused_floor.json",
)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--ticks", type=int, default=50)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--tile", type=int, default=512)
    args = ap.parse_args()

    from cartpole_tpu import (
        OptimizationParams, default_single_params, make_mpc,
    )
    from cartpole_tpu.mpc.lanes import run_closed_loop_lanes

    dtype = jnp.float32
    dp = default_single_params(dtype)
    n, ticks = args.batch, args.ticks
    results = {
        "device": jax.devices()[0].device_kind,
        "date": time.strftime("%Y-%m-%d %H:%M:%S"),
        "batch": n, "ticks": ticks, "tile": args.tile,
    }

    def save():
        with open(OUT, "w") as f:
            json.dump(results, f, indent=1)

    rng = np.random.RandomState(0)
    x0s = np.tile(np.array([0.0, -math.pi / 2, 0.0, 0.0]), (n, 1))
    x0s[:, 0] += rng.uniform(-0.5, 0.5, n)
    x0s[:, 1] += rng.uniform(-0.5, 0.5, n)
    x0s = jnp.asarray(x0s, dtype)
    sps = jnp.zeros((n,), dtype)

    def timed_loop(name, max_iter, single_launch):
        mpc = make_mpc(OptimizationParams(
            max_iterations=max_iter, state_spacing=5,
            kkt_method="condensed",
        ))
        fused_opts = {"batch_tile": args.tile, "interpret": False}
        if single_launch:
            fused_opts["single_launch"] = True
        run = jax.jit(lambda x, s: run_closed_loop_lanes(
            mpc, x, dp, ticks, s, fused=True, fused_opts=fused_opts,
        ))
        print(f"[{name}] compiling ...", flush=True)
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
        row = {
            "max_iterations": max_iter,
            "single_launch": single_launch,
            "compile_s": round(compile_s, 1),
            "ms_per_tick": round(best / ticks * 1e3, 4),
            "solves_per_s": round(n * ticks / best, 1),
            "n_failed": int(np.sum((term == 3) | (term == 4))),
        }
        results[name] = row
        print(f"[{name}] {json.dumps(row)}", flush=True)
        save()
        return row, res

    # The three measured points.
    row8, res8 = timed_loop("scan8", 8, False)
    rowsl, ressl = timed_loop("single_launch8", 8, True)
    row1, _ = timed_loop("scan1", 1, False)

    # Identity: single-launch must reproduce the scan path on-device.
    same_term = bool(np.array_equal(
        np.asarray(res8.termination_states),
        np.asarray(ressl.termination_states),
    ))
    du = float(np.max(np.abs(
        np.asarray(res8.controls) - np.asarray(ressl.controls)
    )))
    results["identity"] = {
        "term_identical": same_term, "max_abs_du": du,
    }

    # ---- the accounting.
    t8 = row8["ms_per_tick"]
    tsl = rowsl["ms_per_tick"]
    t1 = row1["ms_per_tick"]
    # Per-iteration marginal cost (launch + carry + in-kernel), from the
    # scan path's 1 -> 8 iteration slope.
    t_iter_marginal = (t8 - t1) / 7.0
    # Inter-iteration launch + carry overhead the single launch removes.
    t_launch_carry = t8 - tsl
    # Non-solver remainder (guess fill + predicted rollout + plant +
    # shift + 1 iteration) is t1 minus one marginal iteration.
    t_rest = t1 - t_iter_marginal

    # Analytic HBM floor of the solve's carry/static/trace streams.
    mpc = make_mpc(OptimizationParams(
        max_iterations=8, state_spacing=5, kkt_method="condensed"))
    spec = mpc.spec
    sd, N, K = spec.state_dim, spec.num_states, spec.window_length
    bytes_carry = (sd * N + K + 6) * n * 4  # one direction, one iteration
    statics = (2 * K * K + K + 2 * K * 1) * 4 * (n // args.tile)
    n_iter = 8
    hbm_bytes_scan = n_iter * (2 * bytes_carry + statics)
    hbm_bytes_single = 2 * bytes_carry + statics + 6 * n_iter * n * 4
    peak_gbps = 819.0  # v5e
    results["accounting"] = {
        "ms_per_tick_scan8": t8,
        "ms_per_tick_single_launch": tsl,
        "ms_per_tick_scan1": t1,
        "t_iter_marginal_ms": round(t_iter_marginal, 4),
        "t_launch_carry_saved_ms": round(t_launch_carry, 4),
        "t_rest_ms": round(t_rest, 4),
        "model_check_scan8_ms": round(t_rest + 8 * t_iter_marginal, 4),
        "hbm_floor_scan_ms": round(hbm_bytes_scan / peak_gbps / 1e6, 4),
        "hbm_floor_single_ms": round(hbm_bytes_single / peak_gbps / 1e6, 4),
        "note": (
            "T_tick(scan8) decomposes as t_rest + 8*t_iter_marginal by "
            "construction of the 1->8 slope; the independent check is "
            "t_launch_carry_saved (measured scan8 - single_launch) vs "
            "the analytic HBM floor of the 7 removed carry round-trips "
            "+ 7 launches. In-kernel VPU time = t_iter_marginal - "
            "per-iteration launch/carry share."
        ),
    }
    save()
    print(json.dumps(results["accounting"], indent=1), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
