"""Headline benchmark: batched closed-loop MPC solves/s on one chip.

Measures the BASELINE.json single-chip config — 4096 swing-up scenarios,
full receding-horizon regime (every tick: MPC solve -> apply u[0] to the
1 kHz plant -> carry the warm start), all compiled into one XLA program —
and prints ONE JSON line. This is the honest regime: each solve sees a new
plant state, exactly like the reference's browser loop
(``viz/src/application.ts:424-458``).

The timed program uses the batch-in-lanes condensed path (``mpc/lanes.py``,
``--layout lanes``); ``--layout vmap`` times the generic vmapped path.
After the timing runs, the SAME compiled program (warm-start state is an
explicit argument, so chaining never retraces) is continued in chunks
carrying ``(plant state, MPCState)`` across calls to demonstrate full
swing-up at the bench operating point (>= 250 ticks; long single programs
crash the tunneled runtime, CLAUDE.md) — reported as ``fraction_upright``.

Baseline anchor: the reference publishes no numbers (BASELINE.md); its
implied budget is one MPC solve per 10 ms control tick on a single
browser/WASM thread (``optimization.hpp:14``, ``application.ts:393-399``),
i.e. 100 solves/s. ``vs_baseline`` is solves/s relative to that. (Our own
native C++ oracle measures ~3.9 ms/solve single-threaded on this host.)

Usage: python bench.py [--batch 4096] [--ticks 20] [--reps 3] [--f64]
       python bench.py --sweep   # latency/throughput matrix -> bench_sweep.json
"""

import argparse
import json
import math
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

BASELINE_SOLVES_PER_S = 100.0  # 1 solve / 10 ms real-time budget, 1 thread.

#: The multi-link disturbance-rejection regime (shared with the probe
#: scripts so they always characterize the regime the bench actually
#: runs): 0.6 s window (the 0.4 s default leaves double-pole
#: perturbations on the edge of the region of attraction,
#: tests/test_double_mpc.py), ALL terminal objectives as soft costs (the
#: reference's positive-weight mode; the double pole's 5-row hard
#: terminal equality set is multiplier-ill-posed on the f32 deployment
#: dtype, docs/PARITY.md), and no swing-up sinusoid kick.
DOUBLE_SOFT_OPT_KWARGS = dict(
    window_length=60,
    th_final_cost_weight=150.0,
    th_dot_final_cost_weight=10.0,
    b_x_dot_final_cost_weight=10.0,
    u_guess_sinusoid_amplitude=0.0,
)

#: Transient shaping for the double pole's first ~50 cold-start ticks
#: (scripts/probe_transient_shaping.py, v5e batch 4096, 2026-08-20): an
#: 8x u-rate-limit during the transient prevents the high-energy
#: tumbling knockdowns at the SOURCE — 250-tick knockdowns 76 -> 18
#: (0.9814 -> 0.9956 upright), replicated on seeds 1/2 (72 -> 20,
#: 83 -> 14), zero failed solves. Dose-response is monotone (0.2/0.4/0.8x
#: weights -> 80/45/18) and the same weight applied FOREVER is worse
#: than baseline (133: the controller needs its agility back after the
#: transient) — this is a real prevention mechanism, not chaos. Applied
#: by _double_health via run_scheduled_closed_loop for exactly
#: DOUBLE_TRANSIENT_TICKS ticks: the dose is part of the measurement
#: (100-tick application measured 0.9817 vs 0.9956 at 50 — overdosing
#: re-enters the "applied forever is worse" regime).
DOUBLE_TRANSIENT_OPT_KWARGS = dict(u_derivative_cost_weight=0.8)
DOUBLE_TRANSIENT_TICKS = 50

# Persistent compilation cache: the tunneled-TPU AOT compile of the
# closed-loop program costs minutes; cached runs skip it entirely.
_CACHE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)


def make_x0s(model, n, dtype, seed=0):
    """Bench initial states (shared with the probe scripts): swing-up from
    hang for the single model, perturbed-upright disturbance rejection for
    the multi-link models."""
    rng = np.random.RandomState(seed)
    if model == "triple":
        up = math.pi / 2
        x0s = np.tile(np.array([0.0, up, up, up, 0.0, 0.0, 0.0, 0.0]),
                      (n, 1))
        x0s[:, 0] += rng.uniform(-0.2, 0.2, n)
        x0s[:, 1:4] += rng.uniform(-0.06, 0.06, (n, 3))
    elif model == "double":
        # Perturbed-upright stabilization: double-pole swing-up from hang
        # is covered in tests/test_double_mpc.py; the bench regime is the
        # (much more common in deployment) disturbance-rejection loop.
        up = math.pi / 2
        x0s = np.tile(np.array([0.0, up, up, 0.0, 0.0, 0.0]), (n, 1))
        x0s[:, 0] += rng.uniform(-0.3, 0.3, n)
        x0s[:, 1] += rng.uniform(-0.15, 0.15, n)
        x0s[:, 2] += rng.uniform(-0.1, 0.1, n)
    else:
        x0s = np.tile(np.array([0.0, -math.pi / 2, 0.0, 0.0]), (n, 1))
        x0s[:, 0] += rng.uniform(-0.5, 0.5, n)
        x0s[:, 1] += rng.uniform(-0.5, 0.5, n)
    return jnp.asarray(x0s, dtype)


def _build_runner(args, ticks, kkt, dtype, dp, extra_opt_kwargs=None):
    """Returns ``(mpc, jitted run(x0s, sps, mpc_state), effective_layout)``.

    The runner takes the warm-start state EXPLICITLY so the cold start, the
    timing reps, and the chunked swing-up demonstration all share one trace
    (one tunneled-TPU AOT compile) — chaining chunks never retraces.
    """
    from cartpole_tpu import OptimizationParams, get_model, make_mpc
    from cartpole_tpu.mpc.lanes import run_closed_loop_lanes
    from cartpole_tpu.mpc.closed_loop import run_closed_loop

    opt_kwargs = dict(
        max_iterations=8, state_spacing=args.spacing, kkt_method=kkt
    )
    if args.model in ("double", "triple"):
        # See DOUBLE_SOFT_OPT_KWARGS. Measured v5e f32 batch 4096:
        # fraction_upright 0.978@250 ticks -> 0.992@500, zero failed
        # solves (knockdowns.json has the full recovery curve).
        opt_kwargs.update(DOUBLE_SOFT_OPT_KWARGS)
    if extra_opt_kwargs:
        opt_kwargs.update(extra_opt_kwargs)
    mpc = make_mpc(OptimizationParams(**opt_kwargs), get_model(args.model))
    # ``dp`` is captured as a closure CONSTANT, not a traced argument:
    # XLA then constant-folds the parameter arithmetic inside the
    # generated dynamics kernels (~35% faster ticks on v5e). Same
    # deployment semantics as the reference, whose UI rebuilds the
    # optimizer whenever dynamics params change
    # (viz/src/application.ts:279-373); our interactive driver does too.
    layout = "lanes" if (args.layout == "lanes" and kkt == "condensed") \
        else "vmap"
    if layout == "lanes":
        fused = getattr(args, "fused", False)
        fused_opts = None
        if fused:
            # VMEM-fit tiles, measured on v5e: 512 is the single model's
            # throughput peak (1.19M solves/s); the double/triple
            # kernels' ~3x working set OOMs scoped vmem above 128.
            # Tiles below 128 would under-fill the TPU lane dimension
            # (and trip Mosaic layout faults) — small/odd batches fall
            # back to the XLA lanes path.
            tile = 512 if args.model == "single" else 128
            tile = min(tile, args.batch)
            if tile % 128 or args.batch % tile:
                fused = False
            else:
                fused_opts = {"batch_tile": tile, "interpret": False}

        def run(x0s, sps, st):
            return run_closed_loop_lanes(
                mpc, x0s, dp, ticks, sps, mpc_state=st,
                fused=fused, fused_opts=fused_opts,
            )
    else:
        if args.layout == "lanes":
            print(f"note: --layout lanes requires --kkt condensed; "
                  f"timing the vmapped path for kkt={kkt}", file=sys.stderr)

        def run(x0s, sps, st):
            return jax.vmap(
                lambda x, s, st_: run_closed_loop(
                    mpc, x, dp, ticks, s, mpc_state=st_
                )
            )(x0s, sps, st)
    if layout == "lanes" and getattr(args, "fused", False) and fused:
        layout = "lanes-fused"
    return mpc, jax.jit(run), layout


def _cold_state(mpc, n, dtype):
    from cartpole_tpu import MPCState

    return MPCState(
        previous_solution=jnp.zeros((n, mpc.spec.dim), dtype),
        warm=jnp.zeros((n,), bool),
    )


def _time_run(run, x0s, sps, st0, reps):
    def once():
        t0 = time.perf_counter()
        res = run(x0s, sps, st0)
        # Sync via host transfer of a small array: block_until_ready can
        # return early on tunneled-TPU platforms (CLAUDE.md).
        np.asarray(res.final_state[:4])
        return time.perf_counter() - t0, res

    try:
        _, res = once()  # compile / warm-up
    except Exception as e:  # noqa: BLE001 - transient tunnel faults
        print(f"warm-up failed ({type(e).__name__}); retrying once",
              file=sys.stderr)
        time.sleep(20)
        _, res = once()
    best = math.inf
    for _ in range(reps):
        dt, res = once()
        best = min(best, dt)
    return best, res


def _health(res):
    term = np.asarray(res.termination_states)
    return int(np.sum((term == 3) | (term == 4)))


#: Peak HBM bandwidth by TPU generation (GB/s). The workload is
#: memory-bound (arithmetic intensity ~0.7 FLOP/byte, docs/PARITY.md), so
#: bandwidth utilization — not FLOP-MFU — is the speed-of-light lens.
_PEAK_HBM_GBPS = {
    "TPU v5 lite": 819.0,   # v5e
    "TPU v5e": 819.0,
    "TPU v5": 1228.0,       # v5p
    "TPU v4": 1200.0,
    "TPU v6 lite": 1640.0,  # v6e / Trillium
}


def _peak_hbm_gbps(dev):
    kind = getattr(dev, "device_kind", "")
    for prefix, peak in _PEAK_HBM_GBPS.items():
        if kind.startswith(prefix):
            return peak
    return None


def _cost_metrics(run, example_args, ticks, best_s, dev, run_desc):
    """Machine-readable perf-floor fields from XLA's cost analysis.

    ``bytes accessed`` is the compiled program's post-fusion HBM traffic
    estimate; dividing by the measured wall time gives achieved bandwidth,
    and the ratio to the chip's peak is how close the program sits to the
    memory-bound speed-of-light. Returns {} when cost analysis is
    unavailable. ``run_desc`` identifies the operating point (batch /
    model / kkt / layout / dtype) so the phase-floor comparison is only
    emitted when the committed floor artifact was measured at the SAME
    point — a v5e single-model batch-4096 floor says nothing about a CPU
    smoke run or a double-pole sweep.

    For the fused layout, XLA cost analysis CANNOT see inside the
    ``pallas_call`` custom call, so its totals describe only the thin
    XLA shell — reporting them as program cost would be misleading
    (round-4 verdict). The fused path instead emits the measured floor
    model from ``fused_floor.json`` when that artifact was taken at this
    operating point: per-tick = per-call dispatch/ticks + n_iter x
    in-kernel iteration + non-solver glue, with the kernel measured
    VPU-compute-bound (HBM floor ~1% of the tick)."""
    if "fused" in str(run_desc.get("layout", "")):
        out = {
            "cost_analysis": (
                "wrapper-only: XLA cost analysis cannot see inside "
                "pallas_call; see floor_model"
            ),
        }
        floor_path = os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "fused_floor.json")
        try:
            with open(floor_path) as f:
                floor = json.load(f)
            acc = floor.get("accounting", {})
            if (floor.get("device") == getattr(dev, "device_kind", "")
                    and floor.get("batch") == run_desc.get("batch")
                    and run_desc.get("model") == "single"
                    and run_desc.get("dtype") == "float32"
                    and run_desc.get("kkt_method") == "condensed"
                    and acc):
                tick_ms = best_s / ticks * 1e3
                model_ms = (28.0 / ticks
                            + 8 * acc["t_iter_marginal_ms"]
                            + (acc["t_rest_ms"] - 28.0 / floor["ticks"]))
                out["floor_model"] = {
                    "t_iter_in_kernel_ms": acc["t_iter_marginal_ms"],
                    "dispatch_ms_per_call": 28.0,
                    "model_ms_per_tick": round(model_ms, 3),
                    "measured_ms_per_tick": round(tick_ms, 3),
                    "model_residual": round(
                        abs(model_ms - tick_ms) / tick_ms, 4),
                    "bound": "vpu-compute (hbm floor ~1% of tick; "
                             "launch/carry ~0.1%, fused_floor.json)",
                }
        except (OSError, KeyError, ValueError, TypeError) as e:
            # Diagnostic fields only — a missing or malformed floor
            # artifact must never fail the bench.
            print(f"floor model unavailable: {type(e).__name__}: {e}",
                  file=sys.stderr)
        return out
    try:
        comp = run.lower(*example_args).compile()
        ca = comp.cost_analysis()
        ca = ca[0] if isinstance(ca, list) else ca
        bytes_total = float(ca["bytes accessed"])
        flops_total = float(ca.get("flops", 0.0))
    except Exception as e:  # noqa: BLE001 - diagnostic only, never fatal
        print(f"cost_analysis unavailable: {type(e).__name__}: {e}",
              file=sys.stderr)
        return {}
    out = {
        "hbm_bytes_per_tick": round(bytes_total / ticks),
        "flops_per_tick": round(flops_total / ticks),
        "achieved_hbm_gbps": round(bytes_total / best_s / 1e9, 1),
    }
    peak = _peak_hbm_gbps(dev)
    if peak:
        out["hbm_util"] = round(bytes_total / best_s / 1e9 / peak, 4)
    # Device-phase floor measured by scripts/phase_timing.py --json (the
    # phase-sum of the tick's constituent programs, CLAUDE.md's 6.26 ms):
    # ratio of that floor to the measured tick = how much is left. Only
    # comparable when the floor was measured at THIS operating point.
    floor_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                              "phase_floor.json")
    if os.path.exists(floor_path):
        with open(floor_path) as f:
            floor = json.load(f)
        tick_ms = best_s / ticks * 1e3
        matches = floor.get("phase_sum_ms") and all(
            floor.get(k) == run_desc[k] for k in run_desc
        ) and getattr(dev, "device_kind", "") == floor.get(
            "device_kind", object())
        if matches:
            out["phase_floor_ratio"] = round(
                floor["phase_sum_ms"] / tick_ms, 4)
            out["phase_floor_ms"] = floor["phase_sum_ms"]
    return out


def _upright_fraction(xf, angle_indices=(1,)):
    th = np.asarray(xf)[:, list(angle_indices)]
    return float(np.mean(np.all(
        np.abs(np.mod(th - math.pi / 2 + math.pi, 2 * math.pi) - math.pi)
        < 0.1,
        axis=1,
    )))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--ticks", type=int, default=100,
                    help="receding-horizon steps per compiled program. "
                    "Longer programs amortize the ~28 ms per-call "
                    "tunneled dispatch (measured 2026-08-20: the fused "
                    "path gains +7.5% going 50->100 ticks and +9.6% at "
                    "120; a trivial 50-trip scan and a 400-trip one "
                    "both cost ~28 ms total, so the overhead is "
                    "per-call, not per-trip) but very long scans (~200) "
                    "crash some tunneled TPU runtimes")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--f64", action="store_true",
                    help="parity precision instead of the f32 fast path")
    ap.add_argument("--spacing", type=int, default=5,
                    help="state_spacing (reference test uses 5)")
    ap.add_argument("--kkt", default="condensed",
                    choices=("condensed", "schur", "lu"))
    ap.add_argument("--model", default="single",
                    choices=("single", "double", "triple"),
                    help="model family (double = 6-state double pole, a "
                    "capability the reference left WIP; triple = 8-state "
                    "three-link chain, beyond the reference's roadmap)")
    ap.add_argument("--layout", default="lanes", choices=("lanes", "vmap"),
                    help="batching layout (lanes = batch-in-lanes fast "
                    "path; requires condensed)")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (CI smoke; this "
                    "environment ignores JAX_PLATFORMS, CLAUDE.md)")
    ap.add_argument("--no-upright", action="store_true",
                    help="skip the chunked swing-up demonstration")
    ap.add_argument("--no-double", action="store_true",
                    help="skip the double-pole health measurement that "
                    "rides along with the default single-model run")
    ap.add_argument("--upright-ticks", type=int, default=250,
                    help="minimum total closed-loop ticks for the "
                    "demonstration (rounded up to a whole chunk)")
    ap.add_argument("--sweep", action="store_true",
                    help="latency/throughput matrix over batch sizes -> "
                    "bench_sweep.json (single JSON line still printed)")
    ap.add_argument("--no-fused", action="store_true",
                    help="disable the fused GN-iteration Pallas "
                    "megakernel (ops/fused.py) and time the plain XLA "
                    "lanes path instead. On TPU the fused kernel is the "
                    "default for the lanes layout: measured 1.19M vs "
                    "563k solves/s at batch 4096 x 50 ticks on v5e "
                    "(2026-08-20). Always off on --cpu (the unrolled "
                    "body takes XLA:CPU minutes to compile).")
    args = ap.parse_args(argv)
    # Fused kernel: TPU-only, f32-only (Mosaic has no f64 path), lanes +
    # condensed only.
    args.fused = (not args.no_fused and not args.cpu and not args.f64
                  and args.layout == "lanes" and args.kkt == "condensed")

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    if args.f64:
        jax.config.update("jax_enable_x64", True)
    dtype = jnp.float64 if args.f64 else jnp.float32

    from cartpole_tpu import get_model

    dev = jax.devices()[0]
    dp = jax.tree.map(
        lambda v: jnp.asarray(v, dtype),
        get_model(args.model).default_params(),
    )

    if args.sweep:
        return _sweep(args, dp, dtype, dev)

    n, ticks = args.batch, args.ticks
    mpc, run, layout = _build_runner(args, ticks, args.kkt, dtype, dp)
    x0s = make_x0s(args.model, n, dtype)
    sps = jnp.zeros((n,), dtype)
    st0 = _cold_state(mpc, n, dtype)

    best, res = _time_run(run, x0s, sps, st0, args.reps)
    n_failed = _health(res)

    solves = n * ticks
    solves_per_s = solves / best
    tick_latency_ms = best / ticks * 1e3  # full-batch closed-loop tick

    # Outcome proof at the perf operating point: continue the SAME compiled
    # program from the timed run in chunks carrying (x, MPCState) until at
    # least --upright-ticks total ticks have been simulated.
    upright = None
    upright_failed = None
    upright_ticks_run = None
    if not args.no_upright and not args.f64:
        x, st = res.final_state, res.final_mpc_state
        ticks_run = ticks
        total_failed = _health(res)
        while ticks_run < args.upright_ticks:
            res_c = run(x, sps, st)
            x = res_c.final_state
            st = res_c.final_mpc_state
            ticks_run += ticks
            total_failed += _health(res_c)
        np.asarray(x[:4])
        upright = _upright_fraction(x, mpc.model.angle_indices)
        upright_failed = total_failed
        upright_ticks_run = ticks_run

    cost = _cost_metrics(
        run, (x0s, sps, st0), ticks, best, dev,
        run_desc={"batch": n, "model": args.model, "kkt_method": args.kkt,
                  "layout": layout, "dtype": str(np.dtype(dtype).name)},
    )

    # Double-pole health rides along with the default single-model run so
    # the driver's one-line artifact captures BOTH regimes (VERDICT r2
    # item 2a): throughput + upright fraction of the perturbed-upright
    # disturbance-rejection loop at the same batch/tick operating point.
    double = {}
    if args.model == "single" and not args.no_double and not args.f64:
        double = _double_health(args, dtype, dp_model="double")

    print(json.dumps({
        "metric": "batched_mpc_solves_per_s_per_chip",
        "value": round(solves_per_s, 1),
        "unit": "solves/s",
        "vs_baseline": round(solves_per_s / BASELINE_SOLVES_PER_S, 2),
        "batch": n,
        "ticks": ticks,
        # All solves in the batch complete together, so the full-batch tick
        # latency IS the (p50 = p99) per-solve latency.
        "p99_solve_latency_ms": round(tick_latency_ms, 3),
        "kkt_method": args.kkt,
        "layout": layout,
        "model": args.model,
        "dtype": dtype.__name__ if hasattr(dtype, "__name__") else str(dtype),
        "device": str(dev.platform),
        "n_failed": n_failed,
        **({"fraction_upright": round(upright, 4),
            "upright_ticks": upright_ticks_run,
            "upright_n_failed": upright_failed}
           if upright is not None else {}),
        **cost,
        **double,
    }))
    return 0


def _double_health(args, dtype, dp_model="double"):
    """Measure the double-pole disturbance-rejection regime and return
    ``double_*`` fields for the driver artifact.

    Same operating point as the headline run (batch/ticks/reps), the
    all-soft terminal configuration ``_build_runner`` selects for the
    double model, and the chunked continuation for the upright fraction.
    """
    import copy

    from cartpole_tpu import get_model

    dargs = copy.copy(args)
    dargs.model = dp_model
    dp = jax.tree.map(
        lambda v: jnp.asarray(v, dtype),
        get_model(dargs.model).default_params(),
    )
    n, ticks = dargs.batch, dargs.ticks
    # Timed chunk: the steady-state configuration (same program the
    # scheduled outcome's base phase runs, so its compile is shared via
    # the persistent cache and the timed trajectory is not wasted work
    # for a differently-dosed transient).
    mpc, run, _layout = _build_runner(dargs, ticks, dargs.kkt, dtype, dp)
    x0s = make_x0s(dargs.model, n, dtype)
    sps = jnp.zeros((n,), dtype)
    st0 = _cold_state(mpc, n, dtype)
    best, res = _time_run(run, x0s, sps, st0, dargs.reps)
    total_failed = _health(res)
    out = {"double_solves_per_s": round(n * ticks / best, 1)}
    if dargs.no_upright:
        # Timing-only run: honor --no-upright for the ride-along too.
        return {**out, "double_n_failed": total_failed}

    # Outcome through the PUBLIC time-varying-schedule API
    # (run_scheduled_closed_loop, mpc/schedule.py): transient override for
    # the first DOUBLE_TRANSIENT_TICKS, base controller for the rest —
    # what a deployment would call, not bench-side hand-chunking. The
    # schedule's lanes layout needs the condensed KKT (step_lanes); for
    # --kkt lu/schur comparison runs the outcome chains the timed vmap
    # runner instead (no transient shaping — those paths are for solver
    # comparison, not the headline regime).
    if dargs.kkt != "condensed":
        x, st = res.final_state, res.final_mpc_state
        ticks_run = ticks
        while ticks_run < dargs.upright_ticks:
            res_c = run(x, sps, st)
            x = res_c.final_state
            st = res_c.final_mpc_state
            ticks_run += ticks
            total_failed += _health(res_c)
        np.asarray(x[:4])
        return {
            **out,
            "double_fraction_upright": round(
                _upright_fraction(x, mpc.model.angle_indices), 4),
            "double_upright_ticks": ticks_run,
            "double_n_failed": total_failed,
            "double_transient": "none (non-condensed comparison path)",
        }

    from cartpole_tpu import run_scheduled_closed_loop

    fused = getattr(dargs, "fused", False)
    fused_opts = None
    if fused:
        tile = min(128, n)
        if tile % 128 or n % tile:
            fused = False
        else:
            fused_opts = {"batch_tile": tile, "interpret": False}
    t_tr = min(DOUBLE_TRANSIENT_TICKS, dargs.upright_ticks)
    res_s = run_scheduled_closed_loop(
        mpc, x0s, dp,
        [(t_tr, DOUBLE_TRANSIENT_OPT_KWARGS),
         (max(dargs.upright_ticks - t_tr, 1), None)],
        sps, layout="lanes", fused=fused, fused_opts=fused_opts,
        max_ticks_per_program=ticks,
    )
    x = res_s.final_state
    np.asarray(x[:4])
    term = np.asarray(res_s.termination_states)
    return {
        **out,
        "double_fraction_upright": round(
            _upright_fraction(x, mpc.model.angle_indices), 4),
        "double_upright_ticks": int(term.shape[1]),
        "double_n_failed": int(np.sum((term == 3) | (term == 4))),
        "double_transient": (
            f"run_scheduled_closed_loop: u_derivative_cost_weight="
            f"{DOUBLE_TRANSIENT_OPT_KWARGS['u_derivative_cost_weight']} "
            f"for the first {t_tr} ticks (knockdown prevention, "
            "transient_shaping.json)"
        ),
    }


def _sweep(args, dp, dtype, dev):
    """Latency/throughput matrix (VERDICT r1 item 4): batch sweep at the
    default path + small cross-path comparison, written machine-readable."""
    import copy

    rows = []
    batches = (64, 256, 1024, 4096, 8192, 16384)
    for n in batches:
        # Per-batch args copy: the fused kernel's batch_tile must divide
        # the ACTUAL batch of this row, not the global --batch.
        nargs = copy.copy(args)
        nargs.batch = n
        mpc, run, layout = _build_runner(nargs, args.ticks, args.kkt,
                                         dtype, dp)
        x0s = make_x0s(args.model, n, dtype)
        sps = jnp.zeros((n,), dtype)
        st0 = _cold_state(mpc, n, dtype)
        best, res = _time_run(run, x0s, sps, st0, args.reps)
        rows.append({
            "batch": n,
            "ticks": args.ticks,
            "kkt_method": args.kkt,
            "layout": layout,
            "solves_per_s": round(n * args.ticks / best, 1),
            "tick_latency_ms": round(best / args.ticks * 1e3, 3),
            "meets_10ms_budget": bool(best / args.ticks < 0.010),
            "n_failed": _health(res),
            "device": str(dev.platform),
            "dtype": str(np.dtype(dtype).name),
        })
        print(json.dumps(rows[-1]), file=sys.stderr)
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "bench_sweep.json")
    with open(out, "w") as f:
        json.dump(rows, f, indent=1)
    best_row = max(rows, key=lambda r: r["solves_per_s"])
    rt = [r for r in rows if r["meets_10ms_budget"]]
    print(json.dumps({
        "metric": "batched_mpc_solves_per_s_per_chip",
        "value": best_row["solves_per_s"],
        "unit": "solves/s",
        "vs_baseline": round(best_row["solves_per_s"] / BASELINE_SOLVES_PER_S,
                             2),
        "sweep": out,
        "largest_batch_meeting_10ms": (max(r["batch"] for r in rt)
                                       if rt else 0),
        "device": str(dev.platform),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
