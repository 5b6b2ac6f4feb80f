"""Device-phase timing harness: where a lanes MPC tick spends its time.

`jax.profiler` produces no trace over the tunneled-TPU runtime (CLAUDE.md),
so solver phases are timed as standalone jitted programs over the same
shapes the real tick uses, serialized by a `lax.scan` data dependency and
synced by a small host transfer. This is the per-phase timing the
reference exposes through mini_opt's trace_collector
(`/root/reference/optimization/wasm.cc:122-138`), reconstructed for the
actual TPU solve.

With ``--trace out.json`` the measured phases are also recorded into
``cartpole_tpu.utils.tracing.TraceCollector`` and saved as Chrome-trace
JSON — the device-side counterpart of the reference's ``getTraces``
export (one 'X' event per phase, durations from the device timings).

Usage: python scripts/phase_timing.py [--batch 4096] [--reps 20]
       [--trace traces.json]
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


def _timed(fn, args, inner: int, label: str):
    """Per-call device time of ``fn``, dispatch-overhead-free.

    The tunneled runtime adds ~30-60 ms of host dispatch + sync latency to
    EVERY jit call (CLAUDE.md), which would swamp millisecond phases if
    simply divided out. Two-point method: time the phase scanned ``inner``
    and ``3*inner`` times inside one program each; the slope
    ``(t_3n - t_n) / (2*inner)`` cancels the per-call constant exactly.
    """

    def scanned(n):
        def body(carry, _):
            return fn(*carry), None

        def run(*a):
            out, _ = jax.lax.scan(body, a, None, length=n)
            return out

        return jax.jit(run)

    # fn must be carry-stable: returns the same pytree structure as args.
    times = {}
    for n in (inner, 3 * inner):
        f = scanned(n)
        out = f(*args)
        np.asarray(jax.tree.leaves(out)[0]).ravel()[:4]  # sync
        best = math.inf
        for _ in range(3):
            t0 = time.perf_counter()
            out = f(*args)
            np.asarray(jax.tree.leaves(out)[0]).ravel()[:4]
            best = min(best, time.perf_counter() - t0)
        times[n] = best
    per = (times[3 * inner] - times[inner]) / (2 * inner)
    print(f"{label:28s} {per*1e3:9.3f} ms/call  "
          f"(slope over {inner}->{3*inner} serialized calls)",
          flush=True)
    return per


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--reps", type=int, default=20)
    ap.add_argument("--trace", default=None, metavar="OUT_JSON",
                    help="also record phases into the TraceCollector and "
                    "save Chrome-trace JSON (the getTraces analog)")
    ap.add_argument("--json", default=None, metavar="OUT_JSON",
                    help="write the machine-readable phase-floor artifact "
                    "(bench.py reads ./phase_floor.json for its "
                    "phase_floor_ratio field)")
    args = ap.parse_args()

    from cartpole_tpu import (
        OptimizationParams, default_single_params, make_mpc,
    )
    from cartpole_tpu.mpc.controller import MPCState
    from cartpole_tpu.mpc.lanes import _LanesProblem, _Z, step_lanes
    from cartpole_tpu.ops.lanes import rollout_lanes

    dtype = jnp.float32
    B = args.batch
    reps = args.reps
    mpc = make_mpc(
        OptimizationParams(
            max_iterations=8, state_spacing=5, kkt_method="condensed"
        )
    )
    spec = mpc.spec
    dp = default_single_params(dtype)
    rng = np.random.RandomState(0)
    x0 = np.tile(np.array([0.0, -math.pi / 2, 0.0, 0.0]), (B, 1))
    x0[:, 0] += rng.uniform(-0.5, 0.5, B)
    x0[:, 1] += rng.uniform(-0.5, 0.5, B)
    xc = jnp.asarray(x0, dtype).T  # (sd, B)
    sp_ = jnp.zeros((B,), dtype)
    u_prev = jnp.zeros((B,), dtype)
    problem = _LanesProblem(spec, xc, sp_, u_prev, dp)

    K, sd, N = spec.window_length, spec.state_dim, spec.num_states
    k = jnp.arange(K, dtype=dtype)
    u0 = 10.0 * jnp.sin(k / K * (2.0 * math.pi))[:, None] * jnp.ones((1, B), dtype)
    f = lambda x_, u_: mpc.model.dynamics(dp, x_, u_)
    _, xs_roll = rollout_lanes(f, xc, u0, 0.01, mpc.model.angle_indices,
                               stack_states=True)
    shoot = jnp.concatenate(
        [xc[:, None, :], xs_roll[:, spec.spacing - 1::spec.spacing, :]], axis=1
    )
    Z0 = _Z(xs=shoot, u=u0)
    lam0 = jnp.zeros((B,), dtype)

    with jax.default_matmul_precision("float32"):
        # Full condensed step (linearize + condense + KKT + expand).
        # Every phase fn maps its carry tuple to a same-structure tuple
        # with a data dependency on the phase outputs, so _timed's scan
        # serializes real work.
        def full_step(Z, lam):
            dZ, nu_inf, fo, jr, ok, r, c = problem.condensed_step(Z, lam)
            Z2 = _Z(xs=Z.xs + 0.0 * dZ.xs, u=Z.u + 0.0 * dZ.u)
            return (Z2, lam + 0.0 * nu_inf)

        t_cstep = _timed(full_step, (Z0, lam0), reps, "condensed_step")

        # Line-search evaluate (one alpha): retract + cost/constraints.
        def ls_one(Z):
            Za = problem.retract(Z, _Z(xs=Z.xs, u=Z.u), 1e-6)
            r, c = problem.evaluate(Za)
            return (_Z(xs=Z.xs + 0.0 * jnp.sum(c), u=Z.u),)

        t_ls1 = _timed(ls_one, (Z0,), reps, "evaluate (1 alpha)")

        # Folded line search: all 5 alphas in ONE rollout over an
        # (alphas x instances) lane axis — how the real solver runs it.
        n_ls = mpc.params.max_line_search_iterations
        trials = problem.tiled(n_ls)
        alphas = jnp.broadcast_to(
            jnp.asarray([0.5 ** i for i in range(n_ls)], dtype)[:, None],
            (n_ls, B),
        ).reshape(n_ls * B)

        def rep_t(arr):
            return jnp.broadcast_to(
                arr[..., None, :], arr.shape[:-1] + (n_ls, B)
            ).reshape(arr.shape[:-1] + (n_ls * B,))

        def ls_folded(Z):
            Zf = _Z(xs=rep_t(Z.xs), u=rep_t(Z.u))
            Za = trials.retract(Zf, Zf, 1e-6 * alphas)
            r, c = trials.evaluate(Za)
            return (_Z(xs=Z.xs + 0.0 * jnp.sum(c), u=Z.u),)

        t_lsf = _timed(ls_folded, (Z0,), reps, "line search (5 folded)")

        # Guess-fill / predicted rollout (K steps, batch-lanes).
        def roll(x, u):
            xe, xs = rollout_lanes(f, x, u, 0.01, mpc.model.angle_indices,
                                   stack_states=True)
            return (xe, u)

        t_roll = _timed(roll, (xc, u0), reps, "window rollout (K steps)")

        # Spectral KKT block alone on fixed condensation outputs: the
        # augmented eigenbasis + QR-Schur solve (what replaced the
        # batched Cholesky; mirrors mpc/lanes.py::condensed_step).
        n_all = problem.n_tc + problem.n_t
        A_rows = jnp.ones((n_all, K, B), dtype) * 0.02
        b_rows = jnp.ones((n_all, B), dtype) * 0.1
        g = jnp.ones((K, B), dtype)
        lam_k = jnp.full((B,), 0.1, dtype)

        from cartpole_tpu.mpc.problem import _qr_gram_factor
        Q = jnp.asarray(problem._Hu_Q, dtype)
        eigs = jnp.asarray(problem._Hu_eigs, dtype)
        Dhalf = jnp.asarray(
            np.diag(np.sqrt(problem._D_diag)), dtype
        )

        def spectral(A_, b_, g_, lam_):
            d_inv = 1.0 / (eigs[:, None] + lam_[None, :])
            dh_inv = jnp.sqrt(d_inv)

            def basis_solve(X, scale):
                R = X.shape[0]
                X2 = jnp.transpose(X, (1, 0, 2)).reshape(K, R * B)
                Y = (Q.T @ X2).reshape(K, R, B) * scale[:, None, :]
                Zr = (Q @ Y.reshape(K, R * B)).reshape(K, R, B)
                return jnp.transpose(Zr, (1, 0, 2))

            sol = basis_solve(
                jnp.concatenate([A_, g_[None]], axis=0), d_inv
            )
            CiA, Cig = sol[:n_all], sol[n_all]
            G = basis_solve(A_, dh_inv)
            T = jnp.concatenate([
                jnp.transpose(G, (1, 0, 2)),
                jnp.broadcast_to(Dhalf[:, :, None], (n_all, n_all, B)),
            ], axis=0)
            mu = _qr_gram_factor(T)(
                b_ - jnp.sum(A_ * Cig[None], axis=1)
            )
            du = -(Cig + jnp.sum(CiA * mu[:, None, :], axis=0))
            return (A_ + 0.0 * du[None], b_, g_, lam_)

        t_kkt = _timed(spectral, (A_rows, b_rows, g, lam_k), reps,
                       "KKT (spectral)")

        # One full MPC tick for reference.
        st = MPCState(
            previous_solution=jnp.zeros((B, spec.dim), dtype),
            warm=jnp.zeros((B,), bool),
        )

        def tick(st_, x_):
            out, st2 = step_lanes(mpc, st_, x_, dp, sp_)
            return (st2, x_ + 0.0 * jnp.sum(out.u))

        t_tick = _timed(tick, (st, jnp.asarray(x0, dtype)), 2,
                        "full MPC tick")

    it = mpc.params.max_iterations
    ls = mpc.params.max_line_search_iterations
    print()
    print(f"tick model: {it} x condensed_step  = {it*t_cstep*1e3:8.2f} ms")
    print(f"            {it} x folded-{ls} LS    = {it*t_lsf*1e3:8.2f} ms")
    print(f"            2 x window rollout       = {2*t_roll*1e3:8.2f} ms")
    print(f"            (KKT inside step:        {it*t_kkt*1e3:8.2f} ms)")
    model = it * t_cstep + it * t_lsf + 2 * t_roll
    print(f"            model total {model*1e3:8.2f} ms vs measured tick "
          f"{t_tick*1e3:8.2f} ms")

    if args.json:
        import json
        with open(args.json, "w") as f:
            json.dump({
                # Operating-point fields: bench.py only emits
                # phase_floor_ratio when these match its own run.
                "batch": B,
                "model": "single",
                "kkt_method": "condensed",
                "layout": "lanes",
                "dtype": "float32",
                "phase_sum_ms": round(model * 1e3, 3),
                "measured_tick_ms": round(t_tick * 1e3, 3),
                "phases_ms": {
                    "condensed_step_x_iters": round(it * t_cstep * 1e3, 3),
                    "line_search_x_iters": round(it * t_lsf * 1e3, 3),
                    "window_rollout_x2": round(2 * t_roll * 1e3, 3),
                    # Sub-phase of condensed_step (informational, not in
                    # phase_sum); the two-point slope can go slightly
                    # negative at sub-0.1ms scales — that is measurement
                    # noise, not negative time.
                    "kkt_spectral_x_iters": round(it * t_kkt * 1e3, 3),
                },
                "device": str(jax.devices()[0].platform),
                "device_kind": getattr(jax.devices()[0], "device_kind", ""),
                "note": "phase_sum = condensed_step + line_search + "
                        "rollout. kkt_spectral is a sub-phase of "
                        "condensed_step (informational); two-point slopes "
                        "can dip negative at sub-0.1ms scales — "
                        "measurement noise, not negative time.",
            }, f, indent=1)
        print(f"phase-floor artifact -> {args.json}")

    if args.trace:
        # Device-phase Chrome trace through the TraceCollector (the
        # reference's mini_opt getTraces surface, wasm.cc:122-138):
        # phases laid out sequentially as one modeled solver iteration,
        # durations from the measured device timings.
        from cartpole_tpu.utils.tracing import (
            TraceCollector, set_tracing_enabled,
        )
        set_tracing_enabled(True)
        col = TraceCollector.get_instance()
        col.clear()
        t0 = 0
        phases = [
            ("linearize+condense", max(t_cstep - t_kkt, 0.0) * 1e6),
            ("kkt_spectral_solve", t_kkt * 1e6),
            ("line_search_folded", t_lsf * 1e6),
        ]
        for _ in range(it):
            for name, dur in phases:
                col.record_at(name, int(t0), int(dur),
                              batch=B, device=str(jax.devices()[0].platform))
                t0 += dur
        col.record_at("predicted_rollout", int(t0), int(t_roll * 1e6), batch=B)
        col.save(args.trace)
        print(f"\nChrome trace ({it} modeled iterations) -> {args.trace}")


if __name__ == "__main__":
    sys.exit(main())
