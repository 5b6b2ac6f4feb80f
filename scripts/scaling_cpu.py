"""Sharded-path scaling artifact on the virtual 8-device CPU mesh.

Machine-readable counterpart of the prose scaling claims in
``docs/PARITY.md`` (VERDICT r1 item 4): a weak-scaling curve for the
scenario-sharded closed loop (``parallel/sharded.py``) at 1/2/4/8
devices, fixed per-device batch — scenarios are embarrassingly parallel,
so throughput should scale ~linearly with device count and the recorded
``efficiency`` column quantifies how close the shard_map program gets.

The absolute numbers are CPU-host numbers (the real chip is single here,
CLAUDE.md); the artifact validates the SPMD program and its scaling
shape, exactly like the driver's ``dryrun_multichip`` hook.

Usage: python scripts/scaling_cpu.py [--per-device 32] [--ticks 10]
Writes scaling_cpu.json next to bench_sweep.json.
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
os.environ["XLA_FLAGS"] = (
    "--xla_force_host_platform_device_count=8 "
    + os.environ.get("XLA_FLAGS", "")
)

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_platforms", "cpu")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--per-device", type=int, default=32)
    ap.add_argument("--ticks", type=int, default=10)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    from cartpole_tpu import (
        OptimizationParams,
        default_single_params,
        make_mpc,
    )
    from cartpole_tpu.parallel import (
        make_scenario_mesh,
        make_sharded_closed_loop,
        shard_scenarios,
    )

    mpc = make_mpc(
        OptimizationParams(max_iterations=8, state_spacing=5)
    )
    dp = default_single_params(jnp.float32)

    rows = []
    for n_dev in (1, 2, 4, 8):
        devices = jax.devices()[:n_dev]
        mesh = make_scenario_mesh(devices)
        n = args.per_device * n_dev  # weak scaling: fixed work per device
        rng = np.random.RandomState(0)
        x0s = np.tile(
            np.array([0.0, -math.pi / 2, 0.0, 0.0], np.float32), (n, 1)
        )
        x0s[:, 1] += rng.uniform(-0.4, 0.4, n).astype(np.float32)
        x0s = shard_scenarios(jnp.asarray(x0s), mesh)
        sps = shard_scenarios(jnp.zeros((n,), jnp.float32), mesh)

        run = make_sharded_closed_loop(
            mpc, mesh, num_steps=args.ticks, layout="lanes"
        )

        def once():
            t0 = time.perf_counter()
            res, diag = run(x0s, dp, sps)
            jax.block_until_ready(res.final_state)
            return time.perf_counter() - t0, diag

        _, diag = once()  # compile
        best = min(once()[0] for _ in range(args.reps))
        solves_per_s = n * args.ticks / best
        rows.append({
            "devices": n_dev,
            "global_batch": n,
            "ticks": args.ticks,
            "solves_per_s": round(solves_per_s, 1),
            "n_failed": int(diag.n_failed),
            "efficiency": 1.0,  # filled below vs the 1-device row
        })
        print(json.dumps(rows[-1]), file=sys.stderr)

    base = rows[0]["solves_per_s"]
    for row in rows:
        row["efficiency"] = round(
            row["solves_per_s"] / (base * row["devices"]), 3
        )

    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "scaling_cpu.json",
    )
    payload = {
        # Virtual devices beyond the physical core count time-share
        # cores, so efficiency there measures host oversubscription, not
        # the SPMD program (which adds only one tiny diagnostics psum).
        "physical_cores": os.cpu_count(),
        "rows": rows,
    }
    with open(out, "w") as f:
        json.dump(payload, f, indent=1)
    print(json.dumps({"artifact": out, **payload}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
