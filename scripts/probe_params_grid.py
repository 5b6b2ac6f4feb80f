"""TPU probe: fused-path throughput with PER-INSTANCE dynamics params.

BASELINE config #5 is a 100k-scenario (mass, length)-GRID sweep; round 4's
fused kernel refused non-scalar param leaves, so the flagship sweep shape
ran only on the 563k XLA lanes path. Round 5 ships the params as an
``(n_p, B)`` VMEM block (``ops/fused.py``). This probe measures the cost
of that path vs the scalar-SMEM constant-folding path at the bench
operating point, plus the XLA lanes path on the same grid for the
old-vs-new comparison. Writes ``fused_params_grid.json``.
"""

import argparse
import dataclasses
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
    "fused_params_grid.json",
)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--ticks", type=int, default=100)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--tile", type=int, default=512)
    args = ap.parse_args()

    from cartpole_tpu import (
        OptimizationParams, default_single_params, make_mpc,
    )
    from cartpole_tpu.mpc.lanes import run_closed_loop_lanes

    dtype = jnp.float32
    n, ticks = args.batch, args.ticks
    mpc = make_mpc(OptimizationParams(
        max_iterations=8, state_spacing=5, kkt_method="condensed"))
    base = default_single_params(dtype)
    rng = np.random.RandomState(0)
    # The (mass, length) grid over the UI slider ranges, tiled up to the
    # batch when side*side < n (non-square batches must still fill every
    # instance: a short (side*side,) leaf would fail fused_supported's
    # per-instance shape check).
    side = max(int(math.sqrt(n)), 1)
    masses = np.linspace(0.05, 0.2, side)
    lengths = np.linspace(0.15, 0.4, side)
    mm, ll = np.meshgrid(masses, lengths)
    m_flat = np.resize(mm.reshape(-1), n)
    l_flat = np.resize(ll.reshape(-1), n)
    grid = dataclasses.replace(
        base,
        m_1=jnp.asarray(m_flat, dtype),
        l_1=jnp.asarray(l_flat, dtype),
    )
    x0s = np.tile(np.array([0.0, -math.pi / 2, 0.0, 0.0]), (n, 1))
    x0s[:, 0] += rng.uniform(-0.5, 0.5, n)
    x0s[:, 1] += rng.uniform(-0.5, 0.5, n)
    x0s = jnp.asarray(x0s, dtype)
    sps = jnp.zeros((n,), dtype)

    results = {
        "device": jax.devices()[0].device_kind,
        "date": time.strftime("%Y-%m-%d %H:%M:%S"),
        "batch": n, "ticks": ticks, "tile": args.tile,
        "grid": f"{side}x{side} (m_1 0.05-0.2, l_1 0.15-0.4)",
    }

    def save():
        with open(OUT, "w") as f:
            json.dump(results, f, indent=1)

    def timed(name, dp, fused):
        fused_opts = (
            {"batch_tile": args.tile, "interpret": False} if fused else None
        )
        run = jax.jit(lambda x, s: run_closed_loop_lanes(
            mpc, x, dp, ticks, s, fused=fused, fused_opts=fused_opts))
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
            "compile_s": round(compile_s, 1),
            "solves_per_s": round(n * ticks / best, 1),
            "ms_per_tick": round(best / ticks * 1e3, 3),
            "n_failed": int(np.sum((term == 3) | (term == 4))),
        }
        results[name] = row
        print(f"[{name}]", json.dumps(row), flush=True)
        save()
        return row

    r_scalar = timed("fused_scalar_params", base, True)
    r_grid = timed("fused_grid_params", grid, True)
    r_xla = timed("xla_grid_params", grid, False)
    results["summary"] = {
        "grid_vs_scalar": round(
            r_grid["solves_per_s"] / r_scalar["solves_per_s"], 4),
        "fused_vs_xla_on_grid": round(
            r_grid["solves_per_s"] / r_xla["solves_per_s"], 2),
        "note": (
            "grid_vs_scalar is the cost of forfeiting in-kernel constant "
            "folding ((n_p, B) VMEM block vs SMEM scalars); "
            "fused_vs_xla_on_grid is what productizing per-instance "
            "params in the kernel bought the BASELINE sweep shape."
        ),
    }
    save()
    print(json.dumps(results["summary"], indent=1), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
