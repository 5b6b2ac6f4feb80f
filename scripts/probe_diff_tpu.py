"""TPU f32 sanity check for the differentiable MPC (VERDICT r4 #6).

All FD validation of ``make_differentiable_solve`` runs on CPU/f64
(``tests/test_diff*.py``). The ``"unrolled"`` method exists BECAUSE of a
backend-specific miscompile (XLA:CPU reverse-mode through the condensed
solver), so its one unvalidated backend was the deployment one. This
probe computes, ON THE CHIP in f32, the gradient of a scalar loss
``L = sum(u*^2)`` through one MPC solve wrt ``x_current`` and a dynamics
parameter (``m_1``), for BOTH backward methods, against central finite
differences at loose f32 tolerance. Writes ``diff_tpu_f32.json``.

Pass = cosine similarity > 0.999 and max relative component error < 5%
on the x gradient, relative error < 5% on dL/dm_1 (f32 FD of a solver
with 1e-5 relative exit tolerance is itself ~1e-2-noisy; the check is a
sanity gate, not a precision claim — the precision claims live in the
f64 tests).
"""

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
    "diff_tpu_f32.json",
)


def main():
    import dataclasses

    from cartpole_tpu import (
        OptimizationParams, default_single_params, make_mpc,
    )
    from cartpole_tpu.diff import make_differentiable_solve

    dtype = jnp.float32
    mpc = make_mpc(OptimizationParams(
        max_iterations=12, state_spacing=5, kkt_method="condensed",
    ))
    dp = default_single_params(dtype)
    x0 = jnp.asarray([0.15, -math.pi / 2 + 0.2, 0.1, -0.05], dtype)
    state = mpc.init_state(dtype)
    u_start = mpc.spec.u_start

    results = {
        "device": jax.devices()[0].device_kind,
        "date": time.strftime("%Y-%m-%d %H:%M:%S"),
        "dtype": "float32",
    }

    def save():
        with open(OUT, "w") as f:
            json.dump(results, f, indent=1)

    def loss_of(z):
        return jnp.sum(z[u_start:] ** 2)

    def loss_fd(x, m1):
        dpx = dataclasses.replace(dp, m_1=jnp.asarray(m1, dtype))
        out, _ = mpc.step(state, x, dpx, 0.0)
        return loss_of(out.solution)

    fd_fn = jax.jit(loss_fd)

    # Central FD baselines (f32: eps tuned to the solver's noise floor).
    eps_x, eps_m = 3e-3, 3e-4
    g_fd_x = np.zeros(4)
    m1_0 = float(np.asarray(dp.m_1))
    print("computing FD baseline ...", flush=True)
    for i in range(4):
        e = np.zeros(4)
        e[i] = eps_x
        lp = float(fd_fn(x0 + jnp.asarray(e, dtype), m1_0))
        lm = float(fd_fn(x0 - jnp.asarray(e, dtype), m1_0))
        g_fd_x[i] = (lp - lm) / (2 * eps_x)
    g_fd_m = (float(fd_fn(x0, m1_0 + eps_m))
              - float(fd_fn(x0, m1_0 - eps_m))) / (2 * eps_m)
    results["fd"] = {"g_x": [float(v) for v in g_fd_x],
                     "g_m1": float(g_fd_m)}
    print("fd:", json.dumps(results["fd"]), flush=True)
    save()

    failures = []
    for method in ("ift", "unrolled"):
        solve = make_differentiable_solve(mpc, method=method)

        def loss(x, dpx):
            return loss_of(solve(x, dpx, jnp.zeros((), dtype), state))

        print(f"[{method}] compiling grad ...", flush=True)
        t0 = time.perf_counter()
        gx, gdp = jax.jit(jax.grad(loss, argnums=(0, 1)))(x0, dp)
        gx = np.asarray(gx, np.float64)
        gm = float(np.asarray(gdp.m_1))
        wall = time.perf_counter() - t0
        cos = float(np.dot(gx, g_fd_x)
                    / (np.linalg.norm(gx) * np.linalg.norm(g_fd_x)))
        rel_x = float(np.max(np.abs(gx - g_fd_x)
                             / np.maximum(np.abs(g_fd_x), 1e-3)))
        rel_m = float(abs(gm - g_fd_m) / max(abs(g_fd_m), 1e-3))
        row = {
            "compile_plus_run_s": round(wall, 1),
            "g_x": [float(v) for v in gx],
            "g_m1": gm,
            "cos_vs_fd": round(cos, 6),
            "max_rel_err_x": round(rel_x, 4),
            "rel_err_m1": round(rel_m, 4),
        }
        results[method] = row
        print(f"[{method}]", json.dumps(row), flush=True)
        if cos < 0.999:
            failures.append(f"{method}: cos {cos:.4f} < 0.999")
        if rel_x > 0.05:
            failures.append(f"{method}: max_rel_err_x {rel_x:.3f} > 0.05")
        if rel_m > 0.05:
            failures.append(f"{method}: rel_err_m1 {rel_m:.3f} > 0.05")
        save()
    results["failures"] = failures
    results["pass"] = not failures
    save()
    print("PASS" if not failures else f"FAIL: {failures}", flush=True)
    return 0 if not failures else 1


if __name__ == "__main__":
    sys.exit(main())
