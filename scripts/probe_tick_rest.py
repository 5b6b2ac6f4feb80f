"""TPU probe: decompose the fused tick's non-solver time (t_rest).

fused_floor.json put the fused closed-loop tick at 3.452 ms = 8 x 0.333
(in-kernel GN iterations) + 0.791 ms of everything else. This probe times
the "everything else" pieces standalone at the bench operating point
(batch 4096, f32, lanes layout):

- guess-fill rollout (K RK4 steps on rows, warm shift + cold sinusoid),
- predicted-states rollout (K RK4 steps with the solved controls),
- plant substeps (10 x 1 kHz RK4),
- dispatch / glue (residual).

Each piece is timed as a scan of ``--ticks`` applications inside one
program (chained so XLA cannot elide work), mirroring how it appears in
the closed-loop scan. Writes ``tick_rest.json``.
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
    "tick_rest.json",
)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--ticks", type=int, default=50)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    from cartpole_tpu import OptimizationParams, default_single_params, make_mpc
    from cartpole_tpu.mpc.lanes import simulator_step_lanes
    from cartpole_tpu.ops.lanes import rollout_rows

    dtype = jnp.float32
    dp = default_single_params(dtype)
    mpc = make_mpc(OptimizationParams(
        max_iterations=8, state_spacing=5, kkt_method="condensed"))
    n, T = args.batch, args.ticks
    K = mpc.spec.window_length
    sd = mpc.spec.state_dim
    results = {
        "device": jax.devices()[0].device_kind,
        "date": time.strftime("%Y-%m-%d %H:%M:%S"),
        "batch": n, "ticks": T,
    }

    rng = np.random.RandomState(0)
    x0 = jnp.asarray(rng.uniform(-0.5, 0.5, (sd, n)), dtype)
    u0 = jnp.asarray(rng.uniform(-5, 5, (K, n)), dtype)
    core = mpc.model.dynamics_core
    angle = mpc.model.angle_indices
    dt = mpc.params.control_dt

    def timeit(name, fn, *xs):
        f = jax.jit(fn)
        t0 = time.perf_counter()
        out = f(*xs)
        np.asarray(jax.tree.leaves(out)[0])[:4]
        compile_s = time.perf_counter() - t0
        best = math.inf
        for _ in range(args.reps):
            t0 = time.perf_counter()
            out = f(*xs)
            np.asarray(jax.tree.leaves(out)[0])[:4]
            best = min(best, time.perf_counter() - t0)
        row = {"compile_s": round(compile_s, 1),
               "ms_per_tick": round(best / T * 1e3, 4)}
        results[name] = row
        print(name, json.dumps(row), flush=True)
        with open(OUT, "w") as f2:
            json.dump(results, f2, indent=1)

    fr = lambda xr, u_: core(dp, xr, u_)

    # Guess-fill/predicted-style rollout: K RK4 steps, keep all states.
    def roll_chain(x, u):
        def body(carry, _):
            rows = tuple(carry[i] for i in range(sd))
            _, steps = rollout_rows(fr, rows, u, dt, angle,
                                    stack_states=True)
            nxt = jnp.stack([steps[i][-1] for i in range(sd)])
            return nxt, steps[0][-1]
        xf, outs = jax.lax.scan(body, x, None, length=T)
        return xf, outs

    timeit("window_rollout", roll_chain, x0, u0)

    # Plant substeps: 10 x 1 kHz RK4 per tick.
    def plant_chain(x):
        def body(carry, _):
            nxt = simulator_step_lanes(dp, carry, dt, carry[0],
                                       model=mpc.model)
            return nxt, nxt[0, 0]
        xf, outs = jax.lax.scan(body, x, None, length=T)
        return xf, outs

    timeit("plant_substeps", plant_chain, x0)

    # Warm shift + sinusoid select (elementwise glue).
    def shift_chain(u):
        k = jnp.arange(K, dtype=dtype)
        u_cold = (10.0 * jnp.sin(k / K * (2 * math.pi)))[:, None]

        def body(carry, _):
            u_warm = jnp.concatenate([carry[1:], carry[-1:]])
            nxt = jnp.where(carry[0] > 0, u_warm, u_cold)
            return nxt, nxt[0, 0]
        uf, outs = jax.lax.scan(body, u, None, length=T)
        return uf, outs

    timeit("warm_shift", shift_chain, u0)

    fused_floor = {}
    ff = os.path.join(os.path.dirname(OUT), "fused_floor.json")
    if os.path.exists(ff):
        with open(ff) as f3:
            fused_floor = json.load(f3)
    t_rest = fused_floor.get("accounting", {}).get("t_rest_ms")
    # The decisive observation (2026-08-20, v5e via tunnel): the trivial
    # warm-shift scan costs ~the same per trip as the 160-dynamics-eval
    # window rollout — the per-piece cost is a FIXED per-scan-trip
    # overhead of this runtime (~0.64-0.74 ms/trip; round 3's launch
    # floor measured the same ~0.7 ms as "while-trip ~11%" of the then
    # 6.45 ms tick), not compute. The closed-loop tick pays it once.
    trip_overhead = results["warm_shift"]["ms_per_tick"]
    compute_estimates = {
        k: round(max(results[k]["ms_per_tick"] - trip_overhead, 0.0), 4)
        for k in ("window_rollout", "plant_substeps")
    }
    results["summary"] = {
        "t_rest_ms_from_floor": t_rest,
        "scan_trip_overhead_ms": trip_overhead,
        "piece_compute_over_trip_ms": compute_estimates,
        "note": (
            "per-scan-trip runtime overhead (~0.65-0.74 ms, body-size "
            "independent: a trivial elementwise shift costs the same "
            "per trip as a 40-step RK4 rollout) dominates t_rest; the "
            "actual guess/predicted/plant compute is the small "
            "remainder. With the solve kernel VPU-bound "
            "(fused_floor.json), the fused tick sits at this runtime's "
            "floor: trip overhead + 8 x in-kernel iteration + O(0.1 ms) "
            "glue. Remaining levers are algorithmic (fewer iterations, "
            "shorter line search), not memory/launch."
        ),
    }
    with open(OUT, "w") as f4:
        json.dump(results, f4, indent=1)
    print(json.dumps(results["summary"], indent=1), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
