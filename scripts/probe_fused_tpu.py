"""TPU probe: fused GN-iteration Pallas megakernel vs XLA lanes path.

Run on the real chip: python scripts/probe_fused_tpu.py [--batch N]
[--ticks T] [--tile 512] [--check-only]. Stages:

1. correctness — one cold-start tick at a small batch, fused vs XLA, f32
   on-device (prints max |du| and termination-state agreement);
2. throughput — closed-loop programs (``run_closed_loop_lanes``) with and
   without ``fused=True``, host-transfer-synced timing (CLAUDE.md:
   block_until_ready returns early over the tunnel).

Pallas compiles over the tunnel are flaky (CLAUDE.md) — every compile is
wrapped in a coarse wall-clock print so a hang is visible, and the probe
writes its results to fused_probe.json as it goes.
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
    "fused_probe.json",
)


GATE_OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tpu_gate.json",
)


def run_gate(args):
    """``--gate``: the committed on-device regression gate for the REAL
    Pallas plumbing (VERDICT r4 item 3 — the kernel wrapper, BlockSpecs,
    SMEM params row and (1,B) layout workaround are otherwise exercised
    only by bench runs). Asserts, on the chip:

    1. fused vs XLA single-tick identity: termination states and
       iteration counts IDENTICAL, controls within f32 solver tolerance;
    2. the same with PER-INSTANCE (mass, length)-grid dynamics params
       (the (n_p, B) VMEM-block path, BASELINE config-#5 shape);
    3. the scenario-sharded lanes-fused closed loop (shard_map composed
       with pallas_call on the 1-device mesh) == the unsharded fused
       program, bit-for-bit, plus its measured throughput.

    Writes ``tpu_gate.json`` (committed each round alongside BENCH) and
    exits nonzero on any violation. Run via ``make tpu-gate``.
    """
    import dataclasses

    from cartpole_tpu import (
        OptimizationParams, default_single_params, make_mpc,
    )
    from cartpole_tpu.mpc.controller import MPCState
    from cartpole_tpu.mpc.lanes import run_closed_loop_lanes, step_lanes
    from cartpole_tpu.parallel import (
        make_scenario_mesh, make_sharded_closed_loop, shard_scenarios,
    )

    dtype = jnp.float32
    dp = default_single_params(dtype)
    mpc = make_mpc(
        OptimizationParams(
            max_iterations=8, state_spacing=5, kkt_method="condensed"
        )
    )
    results = {
        "device": jax.devices()[0].device_kind,
        "date": time.strftime("%Y-%m-%d %H:%M:%S"),
        "commit": os.popen("git rev-parse --short HEAD 2>/dev/null")
        .read().strip(),
    }
    failures = []

    def save():
        results["failures"] = failures
        results["pass"] = not failures
        with open(GATE_OUT, "w") as f:
            json.dump(results, f, indent=1)

    def x0_batch(n, seed=0):
        rng = np.random.RandomState(seed)
        x0s = np.tile(np.array([0.0, -math.pi / 2, 0.0, 0.0]), (n, 1))
        x0s[:, 0] += rng.uniform(-0.5, 0.5, n)
        x0s[:, 1] += rng.uniform(-0.5, 0.5, n)
        return jnp.asarray(x0s, dtype)

    B = args.gate_batch
    tile = min(args.tile, B)
    x0 = x0_batch(B)
    sp = jnp.zeros((B,), dtype)
    st = MPCState(
        previous_solution=jnp.zeros((B, mpc.spec.dim), dtype),
        warm=jnp.zeros((B,), bool),
    )

    def tick_pair(name, dparams):
        print(f"[{name}] compiling XLA tick ...", flush=True)
        t0 = time.perf_counter()
        out_x, _ = jax.jit(
            lambda s, x: step_lanes(mpc, s, x, dparams, sp)
        )(st, x0)
        ux = np.asarray(out_x.u)
        print(f"  {time.perf_counter() - t0:.1f}s", flush=True)
        print(f"[{name}] compiling FUSED tick ...", flush=True)
        t0 = time.perf_counter()
        out_f, _ = jax.jit(
            lambda s, x: step_lanes(
                mpc, s, x, dparams, sp, fused=True,
                fused_opts={"batch_tile": tile, "interpret": False},
            )
        )(st, x0)
        uf = np.asarray(out_f.u)
        print(f"  {time.perf_counter() - t0:.1f}s", flush=True)
        tx = np.asarray(out_x.solver.termination_state)
        tf = np.asarray(out_f.solver.termination_state)
        nx = np.asarray(out_x.solver.n_iterations)
        nf = np.asarray(out_f.solver.n_iterations)
        rel_du = float(np.max(np.abs(ux - uf)) / max(np.mean(np.abs(ux)),
                                                     1e-9))
        stage = {
            "batch": B, "tile": tile,
            "max_abs_du": float(np.max(np.abs(ux - uf))),
            "mean_abs_u": float(np.mean(np.abs(ux))),
            "rel_du": rel_du,
            "term_identical": bool(np.array_equal(tx, tf)),
            "niter_identical": bool(np.array_equal(nx, nf)),
            "term_agree": float(np.mean(tx == tf)),
            "niter_agree": float(np.mean(nx == nf)),
        }
        results[name] = stage
        print(json.dumps(stage, indent=1), flush=True)
        # Identity thresholds: termination/iteration counts must be
        # IDENTICAL (round-4 measured 100% on-device); controls within
        # f32 solver tolerance of the XLA path (round-4 measured
        # rel_du ~2e-5 at this operating point; 1e-3 allows solver-phase
        # noise on borderline instances without masking a real break).
        if not stage["term_identical"]:
            failures.append(f"{name}: termination states differ")
        if not stage["niter_identical"]:
            failures.append(f"{name}: iteration counts differ")
        if rel_du > 1e-3:
            failures.append(f"{name}: rel_du {rel_du:.2e} > 1e-3")
        save()

    # 1. scalar params (SMEM constant-folding path).
    tick_pair("gate_scalar_params", dp)

    # 2. per-instance (mass, length) grid (the (n_p, B) VMEM-block path).
    rng = np.random.RandomState(1)
    grid = dataclasses.replace(
        dp,
        m_1=jnp.asarray(rng.uniform(0.08, 0.15, B), dtype),
        l_1=jnp.asarray(rng.uniform(0.2, 0.35, B), dtype),
    )
    tick_pair("gate_grid_params", grid)

    # 3. shard_map + pallas_call on the 1-device mesh vs unsharded fused.
    n, ticks = args.batch, args.ticks
    x0s = x0_batch(n)
    sps = jnp.zeros((n,), dtype)
    fused_opts = {"batch_tile": min(args.tile, n), "interpret": False}
    mesh = make_scenario_mesh()
    print("[gate_sharded] compiling sharded lanes-fused loop ...",
          flush=True)
    t0 = time.perf_counter()
    run_s = make_sharded_closed_loop(
        mpc, mesh, num_steps=ticks, layout="lanes-fused",
        fused_opts=fused_opts,
    )
    res_s, diag = run_s(
        shard_scenarios(x0s, mesh), dp, shard_scenarios(sps, mesh)
    )
    np.asarray(res_s.final_state[:4])
    compile_s = time.perf_counter() - t0
    print(f"  {compile_s:.1f}s", flush=True)
    best = math.inf
    for _ in range(args.reps):
        t0 = time.perf_counter()
        res_s, diag = run_s(
            shard_scenarios(x0s, mesh), dp, shard_scenarios(sps, mesh)
        )
        np.asarray(res_s.final_state[:4])
        best = min(best, time.perf_counter() - t0)
    print("[gate_sharded] compiling unsharded fused loop ...", flush=True)
    t0 = time.perf_counter()
    run_u = jax.jit(
        lambda x, s: run_closed_loop_lanes(
            mpc, x, dp, ticks, s, fused=True, fused_opts=fused_opts
        )
    )
    res_u = run_u(x0s, sps)
    np.asarray(res_u.final_state[:4])
    print(f"  {time.perf_counter() - t0:.1f}s", flush=True)
    du = float(np.max(np.abs(
        np.asarray(res_s.controls) - np.asarray(res_u.controls)
    )))
    term_same = bool(np.array_equal(
        np.asarray(res_s.termination_states),
        np.asarray(res_u.termination_states),
    ))
    stage = {
        "batch": n, "ticks": ticks, "devices": int(mesh.devices.size),
        "compile_s": round(compile_s, 1), "best_s": round(best, 4),
        "solves_per_s": round(n * ticks / best, 1),
        "ms_per_tick": round(best / ticks * 1e3, 3),
        "n_failed": int(diag.n_failed),
        "max_abs_du_vs_unsharded": du,
        "term_identical_vs_unsharded": term_same,
    }
    results["gate_sharded"] = stage
    print(json.dumps(stage, indent=1), flush=True)
    if not term_same:
        failures.append("gate_sharded: termination states differ")
    if du > 1e-5:
        failures.append(f"gate_sharded: controls differ ({du:.2e})")
    save()
    print(f"GATE {'PASS' if not failures else 'FAIL: ' + '; '.join(failures)}",
          flush=True)
    return 0 if not failures else 1


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--ticks", type=int, default=20)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--tile", type=int, default=512)
    ap.add_argument("--check-only", action="store_true")
    ap.add_argument("--skip-check", action="store_true")
    ap.add_argument("--paths", default="xla,fused")
    ap.add_argument("--gate", action="store_true",
                    help="run the committed on-device regression gate "
                    "(fused-vs-XLA identity, grid params, sharded "
                    "composition) -> tpu_gate.json; nonzero exit on "
                    "violation")
    ap.add_argument("--gate-batch", type=int, default=512)
    args = ap.parse_args()

    if args.gate:
        return run_gate(args)

    from cartpole_tpu import (
        OptimizationParams, default_single_params, make_mpc,
    )
    from cartpole_tpu.mpc.controller import MPCState
    from cartpole_tpu.mpc.lanes import run_closed_loop_lanes, step_lanes

    dtype = jnp.float32
    dp = default_single_params(dtype)
    mpc = make_mpc(
        OptimizationParams(
            max_iterations=8, state_spacing=5, kkt_method="condensed"
        )
    )
    results = {"device": jax.devices()[0].device_kind}

    def save():
        with open(OUT, "w") as f:
            json.dump(results, f, indent=1)

    def x0_batch(n, seed=0):
        rng = np.random.RandomState(seed)
        x0s = np.tile(np.array([0.0, -math.pi / 2, 0.0, 0.0]), (n, 1))
        x0s[:, 0] += rng.uniform(-0.5, 0.5, n)
        x0s[:, 1] += rng.uniform(-0.5, 0.5, n)
        return jnp.asarray(x0s, dtype)

    # ---------------------------------------------------- 1. correctness
    if not args.skip_check:
        B = 512
        x0 = x0_batch(B)
        sp = jnp.zeros((B,), dtype)
        st = MPCState(
            previous_solution=jnp.zeros((B, mpc.spec.dim), dtype),
            warm=jnp.zeros((B,), bool),
        )
        print("compiling XLA single tick ...", flush=True)
        t0 = time.perf_counter()
        out_x, _ = jax.jit(
            lambda s, x: step_lanes(mpc, s, x, dp, sp)
        )(st, x0)
        ux = np.asarray(out_x.u)
        print(f"  {time.perf_counter() - t0:.1f}s", flush=True)
        print("compiling FUSED single tick ...", flush=True)
        t0 = time.perf_counter()
        out_f, _ = jax.jit(
            lambda s, x: step_lanes(
                mpc, s, x, dp, sp, fused=True,
                fused_opts={"batch_tile": min(args.tile, B),
                            "interpret": False},
            )
        )(st, x0)
        uf = np.asarray(out_f.u)
        print(f"  {time.perf_counter() - t0:.1f}s", flush=True)
        tx = np.asarray(out_x.solver.termination_state)
        tf = np.asarray(out_f.solver.termination_state)
        nx = np.asarray(out_x.solver.n_iterations)
        nf = np.asarray(out_f.solver.n_iterations)
        results["check"] = {
            "batch": B,
            "max_abs_du": float(np.max(np.abs(ux - uf))),
            "mean_abs_u": float(np.mean(np.abs(ux))),
            "term_agree": float(np.mean(tx == tf)),
            "niter_agree": float(np.mean(nx == nf)),
            "mean_niter_xla": float(nx.mean()),
            "mean_niter_fused": float(nf.mean()),
        }
        print(json.dumps(results["check"], indent=1), flush=True)
        save()
        if args.check_only:
            return 0

    # ---------------------------------------------------- 2. throughput
    n, ticks = args.batch, args.ticks
    x0s = x0_batch(n)
    sps = jnp.zeros((n,), dtype)
    runners = {}
    if "xla" in args.paths:
        runners["xla"] = jax.jit(
            lambda x, s: run_closed_loop_lanes(mpc, x, dp, ticks, s)
        )
    if "fused" in args.paths:
        runners["fused"] = jax.jit(
            lambda x, s: run_closed_loop_lanes(
                mpc, x, dp, ticks, s, fused=True,
                fused_opts={"batch_tile": args.tile, "interpret": False},
            )
        )
    for name, run in runners.items():
        print(f"compiling {name} closed loop ({ticks} ticks) ...", flush=True)
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
        results[name] = {
            "batch": n, "ticks": ticks, "compile_s": compile_s,
            "best_s": best, "solves_per_s": n * ticks / best,
            "ms_per_tick": best / ticks * 1e3, "n_failed": n_failed,
        }
        print(
            f"{name}: compile {compile_s:.1f}s  best {best*1e3:.1f} ms  "
            f"{n*ticks/best:,.0f} solves/s  n_failed={n_failed}",
            flush=True,
        )
        save()
    return 0


if __name__ == "__main__":
    sys.exit(main())
